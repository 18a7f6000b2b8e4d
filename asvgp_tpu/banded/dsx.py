"""XLA-level double-single dense linear algebra (f64-equivalent on TPU).

The block-banded ops for the Kronecker/additive models need dense B×B
matrix algebra at float64 precision inside recursions.  This platform's
XLA f64 emulation is unreliable in recursions and pathologically slow for
matmuls (MXU has no f64 — see CLAUDE.md), and Pallas kernels with dense
per-step blocks would be issue-bound on the VPU.  Instead this module keeps
values as double-single (hi, lo) float32 pairs at the XLA level:

* elementwise ops reuse banded/ds.py (error-free transformations are pure
  f32 add/mul — safe under XLA on TPU: TwoSum is contraction-free and fma
  contraction only *improves* Dekker's product error term);

* matmul uses Ozaki-style slicing: each operand is row/column scaled and
  split into six 8-bit-mantissa slices, so every slice product is EXACT in
  bf16×bf16→f32 on the MXU and every 128-term dot accumulates exactly in
  f32 (2·8 product bits + 7 carry bits < 24); the ~21 partial products are
  then combined with DS additions.  Result: f64-equivalent matmuls at MXU
  speed (the TPU-native answer to the reference's Eigen/dense-TF fallbacks,
  SURVEY.md §2.2 N4);

* Cholesky / triangular solves are lax.scan recursions of rank-1 DS
  updates with algebraic custom VJPs (no per-step residual blowup).

Public API works on float64 arrays at the boundary (split/merge inside),
mirroring the banded DS kernels' convention (banded/pallas_ds.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from asvgp_tpu.banded import ds

NSLICE = 6  # 8-bit slices; covers the 48-bit DS mantissa
_SLICE_BITS = 8


def _exp2_scale(m):
    """Smallest power of two ≥ m, EXACTLY (zeros mapped to 1).

    jnp.exp2/log2 are polynomial approximations (exp2(27.0) ≠ 2²⁷ in f32!),
    which would make the scale a non-power-of-two and the Ozaki scaling
    inexact; frexp/ldexp manipulate the exponent field directly."""
    safe = jnp.where(m > 0, m, 1.0)
    _, e = jnp.frexp(safe)  # safe = mant·2^e, mant ∈ [0.5, 1)
    return jnp.ldexp(jnp.ones_like(safe), e)


def _slice_ds(h, l, axis):
    """Scale along ``axis`` and split into NSLICE 8-bit-mantissa slices.

    Returns (slices, scale): value == scale * Σ slices + O(2⁻⁴⁸ · scale).
    Each slice has ≤ 8 significant mantissa bits (bf16-exact).
    """
    scale = _exp2_scale(jnp.max(jnp.abs(h), axis=axis, keepdims=True))
    inv = 1.0 / scale  # exact (power of two)
    rem_h = h * inv
    rem_l = l * inv
    slices = []
    for i in range(NSLICE):
        p = float(2.0 ** (7 + _SLICE_BITS * i))
        s = jnp.round(rem_h * p) / p
        slices.append(s)
        rem_h, rem_l = ds.add(rem_h, rem_l, -s, jnp.zeros_like(s))
    return slices, scale


def _matmul_ds_raw(ah, al, bh, bl):
    """C = A·B for DS operands; returns DS pair.  Exact-slice MXU path."""
    a_slices, sa = _slice_ds(ah, al, axis=-1)   # row scale (…, M, 1)
    b_slices, sb = _slice_ds(bh, bl, axis=-2)   # col scale (…, 1, N)
    out_shape = jnp.broadcast_shapes(
        ah.shape[:-1] + bh.shape[-1:],
    )
    ch = jnp.zeros(out_shape, jnp.float32)
    cl = jnp.zeros(out_shape, jnp.float32)
    # level-ordered accumulation (largest first) into a DS sum; keep levels
    # up to i+j = NSLICE so the truncation error ~K·2⁻⁵⁶ sits below DS eps
    for lev in range(NSLICE + 1):
        for i in range(lev + 1):
            j = lev - i
            if i >= NSLICE or j >= NSLICE:
                continue
            d = jnp.matmul(
                a_slices[i].astype(jnp.bfloat16),
                b_slices[j].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            ch, cl = ds.add(ch, cl, d, jnp.zeros_like(d))
    s = sa * sb
    return ch * s, cl * s


# The exact-accumulation argument (2·8 product bits + 7 carry bits < 24)
# only holds while every f32 dot accumulates ≤ 2⁷ = 128 terms per carry
# level; empirically the slice products stay exact for inner dimensions up
# to ~1024.  Beyond that a silent precision cliff would violate the
# f64-equivalence contract, so we chunk the contraction and combine the
# partial products with DS adds (still exact).
_MAX_INNER = 1024


@jax.custom_vjp
def matmul_ds(a, b):
    """float64 matmul executed as exact-sliced bf16 MXU products."""
    k_inner = a.shape[-1]
    if k_inner > _MAX_INNER:
        ch = cl = None
        for s in range(0, k_inner, _MAX_INNER):
            e = min(s + _MAX_INNER, k_inner)
            ah, al = ds.split_f64(a[..., s:e])
            bh, bl = ds.split_f64(b[..., s:e, :])
            ph, pl = _matmul_ds_raw(ah, al, bh, bl)
            if ch is None:
                ch, cl = ph, pl
            else:
                ch, cl = ds.add(ch, cl, ph, pl)
        return ds.merge_f64(ch, cl)
    ah, al = ds.split_f64(a)
    bh, bl = ds.split_f64(b)
    ch, cl = _matmul_ds_raw(ah, al, bh, bl)
    return ds.merge_f64(ch, cl)


def _mm_f(a, b):
    return matmul_ds(a, b), (a, b)


def _unbroadcast(grad, shape):
    """Sum a cotangent over dims broadcast in the primal (batched matmul)."""
    if grad.shape == tuple(shape):
        return grad
    extra = grad.ndim - len(shape)
    if extra > 0:
        grad = jnp.sum(grad, axis=tuple(range(extra)))
    axes = tuple(
        i
        for i, (g, s) in enumerate(zip(grad.shape, shape))
        if s == 1 and g != 1
    )
    if axes:
        grad = jnp.sum(grad, axis=axes, keepdims=True)
    return grad


def _mm_b(res, cot):
    a, b = res
    da = matmul_ds(cot, jnp.swapaxes(b, -1, -2))
    db = matmul_ds(jnp.swapaxes(a, -1, -2), cot)
    return _unbroadcast(da, a.shape), _unbroadcast(db, b.shape)


matmul_ds.defvjp(_mm_f, _mm_b)


def _rank1_update_ds(mh, ml, vh, vl):
    """M -= v vᵀ in DS ((B,B) matrix, (B,) vector)."""
    ph, pl = ds.mul(vh[:, None], vl[:, None], vh[None, :], vl[None, :])
    return ds.sub(mh, ml, ph, pl)


def _cholesky_ds_fwd(ah, al):
    """Dense DS Cholesky by rank-1 right-looking scan (B steps)."""
    B = ah.shape[-1]
    rows = jnp.arange(B)

    def step(carry, j):
        mh, ml = carry
        colh = lax.dynamic_slice_in_dim(mh, j, 1, axis=1)[:, 0]
        coll = lax.dynamic_slice_in_dim(ml, j, 1, axis=1)[:, 0]
        dh = lax.dynamic_slice_in_dim(colh, j, 1)[0]
        dl = lax.dynamic_slice_in_dim(coll, j, 1)[0]
        # guard: padded/identity blocks keep d=1; nonpositive pivots NaN as usual
        rh, rl = ds.rsqrt(dh, dl)
        mask = (rows >= j).astype(jnp.float32)
        lh = colh * mask
        ll = coll * mask
        lh, ll = ds.mul(lh, ll, rh, rl)
        mh, ml = _rank1_update_ds(mh, ml, lh, ll)
        return (mh, ml), (lh, ll)

    _, (lth, ltl) = lax.scan(step, (ah, al), jnp.arange(B))
    # scan stacks columns as rows: (B_steps, B) -> transpose to (B, B) lower
    return lth.T, ltl.T


def _phi(x):
    """Lower triangle with halved diagonal (Cholesky-adjoint projector)."""
    return jnp.tril(x) - 0.5 * jnp.diag(jnp.diagonal(x))


@jax.custom_vjp
def cholesky_ds(a):
    """float64 dense Cholesky (lower), DS execution."""
    ah, al = ds.split_f64(a)
    lh, ll = _cholesky_ds_fwd(ah, al)
    return ds.merge_f64(lh, ll)


def _chol_f(a):
    l = cholesky_ds(a)
    return l, l


def _chol_b(l, lbar):
    # standard dense adjoint: Ā = ½ L⁻ᵀ (Φ(Lᵀ L̄) + Φ(Lᵀ L̄)ᵀ) L⁻¹
    p = _phi(matmul_ds(jnp.swapaxes(l, -1, -2), lbar))
    p = p + jnp.swapaxes(p, -1, -2)
    s = solve_triangular_ds(l, p, True, True)        # L⁻ᵀ P
    abar = solve_triangular_ds(
        l, jnp.swapaxes(s, -1, -2), True, True
    )  # L⁻ᵀ (L⁻ᵀ P)ᵀ → (L⁻ᵀ P L⁻¹)ᵀ
    return (0.5 * jnp.swapaxes(abar, -1, -2),)


cholesky_ds.defvjp(_chol_f, _chol_b)


def _solve_tri_ds_fwd(lh, ll, bh, bl, lower, trans):
    """Solve T x = b rows-sequentially in DS.  T = L or Lᵀ (L lower)."""
    B = lh.shape[-1]
    rows = jnp.arange(B)
    # reciprocal diagonal, vectorized once
    dgh = jnp.diagonal(lh)
    dgl = jnp.diagonal(ll)
    safe = jnp.abs(dgh) > 0
    ivh, ivl = ds.recip(jnp.where(safe, dgh, 1.0), jnp.where(safe, dgl, 0.0))

    forward = lower != trans  # L: forward; Lᵀ: backward

    def step(carry, idx):
        xh, xl = carry  # accumulated solution (B, r), zeros where unsolved
        j = idx
        # row j of T: T[j, :] = L[j, :] (trans=False) or L[:, j] (trans=True)
        if not trans:
            rowh = lax.dynamic_slice_in_dim(lh, j, 1, axis=0)[0]
            rowl = lax.dynamic_slice_in_dim(ll, j, 1, axis=0)[0]
        else:
            rowh = lax.dynamic_slice_in_dim(lh, j, 1, axis=1)[:, 0]
            rowl = lax.dynamic_slice_in_dim(ll, j, 1, axis=1)[:, 0]
        mask = (rows != j).astype(jnp.float32)
        rowh = rowh * mask
        rowl = rowl * mask
        # s = T[j, :] · x  (only solved entries are nonzero in x)
        ph, pl = ds.mul(rowh[:, None], rowl[:, None], xh, xl)
        # exact pairwise-tree DS reduction over the row
        sh, sl = _ds_tree_sum(ph, pl, axis=0)
        bjh = lax.dynamic_slice_in_dim(bh, j, 1, axis=0)[0]
        bjl = lax.dynamic_slice_in_dim(bl, j, 1, axis=0)[0]
        rh_, rl_ = ds.sub(bjh, bjl, sh, sl)
        djh = lax.dynamic_slice_in_dim(ivh, j, 1)[0]
        djl = lax.dynamic_slice_in_dim(ivl, j, 1)[0]
        xjh, xjl = ds.mul(rh_, rl_, djh, djl)
        xh = lax.dynamic_update_slice_in_dim(xh, xjh[None, :], j, axis=0)
        xl = lax.dynamic_update_slice_in_dim(xl, xjl[None, :], j, axis=0)
        return (xh, xl), None

    order = jnp.arange(B) if forward else jnp.arange(B - 1, -1, -1)
    (xh, xl), _ = lax.scan(
        step, (jnp.zeros_like(bh), jnp.zeros_like(bl)), order
    )
    return xh, xl


def _ds_tree_sum(h, l, axis):
    """DS reduction by pairwise halving (log-depth, no reassociation risk)."""
    n = h.shape[axis]
    while n > 1:
        half = n // 2
        lo_h = lax.slice_in_dim(h, 0, half, axis=axis)
        lo_l = lax.slice_in_dim(l, 0, half, axis=axis)
        hi_h = lax.slice_in_dim(h, half, 2 * half, axis=axis)
        hi_l = lax.slice_in_dim(l, half, 2 * half, axis=axis)
        sh, sl = ds.add(lo_h, lo_l, hi_h, hi_l)
        if n % 2:
            tail_h = lax.slice_in_dim(h, 2 * half, n, axis=axis)
            tail_l = lax.slice_in_dim(l, 2 * half, n, axis=axis)
            sh = jnp.concatenate([sh, tail_h], axis=axis)
            sl = jnp.concatenate([sl, tail_l], axis=axis)
            n = half + 1
        else:
            h, l = sh, sl
            n = half
            continue
        h, l = sh, sl
    return jnp.take(h, 0, axis=axis), jnp.take(l, 0, axis=axis)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _solve_tri(lower, trans, l, b):
    lh, ll = ds.split_f64(l)
    vec = b.ndim == 1
    b2 = b[:, None] if vec else b
    bh, bl = ds.split_f64(b2)
    xh, xl = _solve_tri_ds_fwd(lh, ll, bh, bl, lower, trans)
    x = ds.merge_f64(xh, xl)
    return x[:, 0] if vec else x


def _st_f(lower, trans, l, b):
    x = _solve_tri(lower, trans, l, b)
    return x, (l, x)


def _st_b(lower, trans, res, cot):
    l, x = res
    # T x = b ⇒ b̄ = T⁻ᵀ x̄ ; L̄ = -(b̄ xᵀ) (resp. transposed), triangle-masked
    bbar = _solve_tri(lower, not trans, l, cot)
    vec = x.ndim == 1
    x2 = x[:, None] if vec else x
    bb2 = bbar[:, None] if vec else bbar
    if not trans:
        lbar = -matmul_ds(bb2, jnp.swapaxes(x2, -1, -2))
    else:
        lbar = -matmul_ds(x2, jnp.swapaxes(bb2, -1, -2))
    lbar = jnp.tril(lbar) if lower else jnp.triu(lbar)
    return lbar, bbar


_solve_tri.defvjp(_st_f, _st_b)


def solve_triangular_ds(l, b, lower=True, trans=False):
    """float64 triangular solve (L or Lᵀ) against dense RHS, DS execution."""
    return _solve_tri(bool(lower), bool(trans), l, b)


# ---------------------------------------------------------------------------
# auto-dispatch helpers: f64 dense algebra that is DS on accelerators and
# plain XLA elsewhere (used by the additive model's dense coupling matrix,
# reference asvgp/gpr.py:186-195)
# ---------------------------------------------------------------------------


def _use_ds_here(x) -> bool:
    from asvgp_tpu.banded import ops as _bops

    return _bops._use_pallas_ds(x)


def cholesky_auto(a):
    if _use_ds_here(a):
        return cholesky_ds(a)
    return jnp.linalg.cholesky(a)


def solve_triangular_auto(l, b, lower=True, trans=False):
    if _use_ds_here(l):
        return solve_triangular_ds(l, b, lower, trans)
    import jax.scipy.linalg as jsl

    return jsl.solve_triangular(l, b, lower=lower, trans=1 if trans else 0)


def cho_solve_auto(l, b):
    """Solve A x = b given lower Cholesky factor of A."""
    return solve_triangular_auto(
        l, solve_triangular_auto(l, b, True, False), True, True
    )
