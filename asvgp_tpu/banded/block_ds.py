"""Fast double-single block-banded ops (the Kronecker model's hot path).

Replaces the first-cut DS block ops (block.py round 1), whose per-step
dense algebra ran through dsx.py lax.scan recursions: on this platform a
lax.scan iteration costs ~134µs of loop overhead (CLAUDE.md), so nesting a
B-iteration scan (dsx Cholesky / triangular solve) inside the nb-iteration
block scan made the eNATL-shaped Kronecker ELBO ~1.3 s/step.  Here every
per-step body is *scan-free*:

* `panel factorization` — the (W+1, B, B) block column is factored by a
  statically unrolled rank-1 double-single sweep over its B columns.  The
  sweep is garbage-tolerant: updates are applied to ALL columns (already
  factored columns receive garbage that is never read again and is masked
  once at the end with `where`), so each column costs ~13 fused VPU ops
  and no dynamic slicing or masking.
* `triangular inverses` of ALL nb diagonal blocks are computed in ONE
  vmapped unrolled substitution sweep (embarrassingly parallel across
  blocks — this is the piece the sequential scans cannot batch).  Solves
  and the block Takahashi recursion then need only MXU matmuls per step.
* matmuls run on DS (hi, lo) pairs through dsx's Ozaki-sliced exact-bf16
  path (`_matmul_ds_raw`) — f64-equivalent products at MXU speed.

Everything keeps (hi, lo) float32 pairs across the whole scan; float64
appears only at the public boundary.  Sequential structure is a single
lax.scan over the nb block columns per op (the intrinsic critical path of
a block-banded factorization).

Reference semantics: block generalization of the C++ banded_matrices ops
(cholesky_band, solve_triang_mat, inverse_from_cholesky_band — reference
asvgp/gpr.py:56-75) at the block bandwidth of the Kronecker coupling
matrix P (reference densifies P instead, asvgp/gpr.py:292-293).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import lax

from asvgp_tpu.banded import ds
from asvgp_tpu.banded.dsx import _matmul_ds_raw


def scan_unroll() -> int:
    """lax.scan unroll factor for the nb-length block scans.

    On this platform a scan iteration carries ~134µs of loop-boundary
    overhead (CLAUDE.md): at eNATL shape (nb=100) the four nb-scans of
    the Kron ELBO value+grad (chol fwd, lower-solve fwd, upper-solve bwd,
    chol-adjoint bwd) are boundary-bound, not compute-bound.  Unrolling
    packs U block columns per loop trip — identical math in identical
    order (lax.scan's unroll replicates the body; it does not
    reassociate) — so the boundary count drops U-fold.  TPU-only: on
    XLA:CPU a larger fused body risks the kLoop codegen blowup documented
    in the module docstring, and the CPU tests are not boundary-bound.
    ASVGP_BLOCK_UNROLL overrides (probing).  Default stays 1 until the
    on-hardware A/B (tools/block_regress_probe.py) picks the winner.
    """
    v = os.environ.get("ASVGP_BLOCK_UNROLL")
    if v is not None:
        return max(1, int(v))
    return 1


def _split(x):
    return ds.split_f64(x)


def _merge(h, l):
    return ds.merge_f64(h, l)


# ---------------------------------------------------------------------------
# scan-free panel primitives
# ---------------------------------------------------------------------------


def _diag_sweep_ds(mh, ml):
    """Garbage-tolerant rank-1 DS Cholesky sweep of one (B, B) block.

    Returns the UNMASKED factor (junk above the diagonal).  ~13 fused VPU
    ops per column, no dynamic slicing.
    """
    B = mh.shape[0]
    cols_h, cols_l = [], []
    for c in range(B):
        rh, rl = ds.rsqrt(mh[c, c], ml[c, c])
        lh_, ll_ = ds.mul(mh[:, c], ml[:, c], rh, rl)  # (B,)
        cols_h.append(lh_)
        cols_l.append(ll_)
        if c < B - 1:
            ph, pl = ds.mul(
                lh_[:, None], ll_[:, None], lh_[None, :], ll_[None, :]
            )
            mh, ml = ds.sub(mh, ml, ph, pl)
    return jnp.stack(cols_h, axis=-1), jnp.stack(cols_l, axis=-1)


def _fused_sweep_ds(mh, ml):
    """Cholesky ⊗ triangular-inverse sweep sharing ONE B-step chain.

    Inverse row c needs only the just-computed factor column c, so the two
    recursions interleave instead of running back to back — half the
    sequential depth of sweep-then-substitute.  TPU-only dispatch: XLA:CPU's
    fusion pass folds the interleaved chains plus any consumer concatenate
    (jnp.stack, the block scan's carry shift) into one kLoop fusion with
    ~1000 ops whose MLIR/LLVM codegen is superlinear (>10 min at B=6).
    No fence survives to stop it: optimization_barrier is deleted by the
    cse_barrier_expander HLO pass, and a length-1 lax.scan wrapper is
    inlined by the while-loop simplifier.  On TPU the fusion splits fine.
    Returns (l0h, l0l, ivh, ivl), all UNMASKED.
    """
    B = mh.shape[0]
    th = jnp.eye(B, dtype=jnp.float32)
    tl = jnp.zeros((B, B), jnp.float32)
    below = jnp.arange(B)
    cols_h, cols_l, rows_h, rows_l = [], [], [], []
    for c in range(B):
        rh, rl = ds.rsqrt(mh[c, c], ml[c, c])
        lh_, ll_ = ds.mul(mh[:, c], ml[:, c], rh, rl)  # (B,)
        cols_h.append(lh_)
        cols_l.append(ll_)
        # inverse row: 1/L[c,c] = rsqrt(d) exactly (L[c,c] = sqrt(d))
        xh, xl = ds.mul(th[c, :], tl[c, :], rh, rl)
        rows_h.append(xh)
        rows_l.append(xl)
        if c < B - 1:
            ph, pl = ds.mul(
                lh_[:, None], ll_[:, None], lh_[None, :], ll_[None, :]
            )
            mh, ml = ds.sub(mh, ml, ph, pl)
            # the garbage-tolerant factor column has junk ABOVE the
            # diagonal; the inverse update must see exact zeros there or
            # it would corrupt already-emitted rows
            keep = (below >= c)
            lzh = jnp.where(keep, lh_, 0.0)
            lzl = jnp.where(keep, ll_, 0.0)
            qh, ql = ds.mul(lzh[:, None], lzl[:, None], xh[None, :], xl[None, :])
            th, tl = ds.sub(th, tl, qh, ql)
    return (
        jnp.stack(cols_h, axis=-1),
        jnp.stack(cols_l, axis=-1),
        jnp.stack(rows_h, axis=0),
        jnp.stack(rows_l, axis=0),
    )


def _panel_chol_full_ds(sh, sl):
    """Round-2 panel variant: one rank-1 sweep over the FULL (W+1, B, B)
    panel (off blocks updated in the same chain as the diagonal block).
    More VPU work per column than the diag-sweep + MXU off-block variant,
    but ONE dependent update per column instead of two.  Kept selectable
    (ASVGP_PANEL=full) for on-hardware A/B: the variants' critical paths
    differ, and the sweep is latency-bound, not FLOP-bound."""
    Wp1, B, _ = sh.shape
    mh, ml = sh, sl
    cols_h, cols_l = [], []
    for c in range(B):
        rh, rl = ds.rsqrt(mh[0, c, c], ml[0, c, c])
        lh_, ll_ = ds.mul(mh[:, :, c], ml[:, :, c], rh, rl)  # (W+1, B)
        cols_h.append(lh_)
        cols_l.append(ll_)
        if c < B - 1:
            ph, pl = ds.mul(
                lh_[:, :, None], ll_[:, :, None],
                lh_[0][None, None, :], ll_[0][None, None, :],
            )
            mh, ml = ds.sub(mh, ml, ph, pl)
    lh = jnp.stack(cols_h, axis=-1)
    ll = jnp.stack(cols_l, axis=-1)
    tril = jnp.tril(jnp.ones((B, B), jnp.bool_))
    keep = jnp.concatenate(
        [tril[None], jnp.ones((Wp1 - 1, B, B), jnp.bool_)], axis=0
    )
    zero = jnp.zeros((), jnp.float32)
    return jnp.where(keep, lh, zero), jnp.where(keep, ll, zero)


def panel_chol_ds(sh, sl, variant=None):
    """Factor one block column: col[0] = chol(s[0]), col[p] = s[p] L00^{-T}.

    s: (W+1, B, B) DS pair (block 0 = full symmetric diagonal block).
    The rank-1 double-single sweep runs over the DIAGONAL block only
    (garbage-tolerant, see module docstring); the W off blocks are then
    one exact-bf16 MXU matmul against the triangular inverse of L00
    (round 3: the old sweep updated the full (W+1)·B×B panel per column —
    5× the VPU work at eNATL W=4, and the block Cholesky dominated the
    Kron step at ~70 of 90 ms).  On TPU the inverse recursion is fused
    into the factor sweep (one B-step chain); elsewhere it runs as a
    separate substitution sweep — same math, split to keep XLA:CPU fusion
    sizes sane (see _fused_sweep_ds).  Returns the (W+1, B, B) DS pair of
    the factor column, block 0 masked lower-triangular.

    ASVGP_PANEL (or the ``variant`` arg) selects the diagonal-sweep
    variant for on-hardware A/B: ``kernel`` (the dense-block Mosaic
    kernel, pallas_ds_block.py), ``fused`` (XLA-level fused
    factor⊗inverse chain — the TPU default), ``nofuse`` (split sweep +
    substitution — the only variant safe on XLA:CPU, see module
    docstring), ``full`` (round-2 full-panel sweep).
    """
    if variant is None:
        variant = os.environ.get("ASVGP_PANEL")
    if variant == "full":
        return _panel_chol_full_ds(sh, sl)
    Wp1, B, _ = sh.shape
    tril = jnp.tril(jnp.ones((B, B), jnp.bool_))
    zero = jnp.zeros((), jnp.float32)
    on_tpu = jax.default_backend() == "tpu"
    if variant is None:
        # TPU default = the dense-block Mosaic kernel, flipped on hardware
        # evidence (PANELCHECK.json, tools/panel_kernel_probe.py at eNATL
        # shape W=4 nb=100 B=100: chol fwd 20.3 ms vs 59.0 fused,
        # chol+solve+grad 39.4 vs 81.9; L vs f64 oracle 9.3e-11 at κ=1e10,
        # ELBO-path scalar identical)
        variant = "kernel" if on_tpu else "nofuse"
    if variant == "kernel" and B > 128:
        variant = "fused" if on_tpu else "nofuse"
    if variant == "kernel":
        from asvgp_tpu.banded.pallas_ds_block import chol_inv_dense_ds

        l0h, l0l, ivh, ivl = chol_inv_dense_ds(sh[0], sl[0])
    elif variant == "fused":
        l0h, l0l, ivh, ivl = _fused_sweep_ds(sh[0], sl[0])
    else:
        l0h, l0l = _diag_sweep_ds(sh[0], sl[0])
        ivh = ivl = None
    # mask the factor garbage.  Use where (NOT multiply): it may be inf/NaN.
    l0h = jnp.where(tril, l0h, zero)
    l0l = jnp.where(tril, l0l, zero)
    if Wp1 == 1:
        return l0h[None], l0l[None]
    if ivh is not None:
        ivh = jnp.where(tril, ivh, zero)
        ivl = jnp.where(tril, ivl, zero)
    else:
        ivh, ivl = _tri_inv_one_ds(l0h, l0l)
    offh, offl = _matmul_ds_raw(
        sh[1:].reshape((Wp1 - 1) * B, B), sl[1:].reshape((Wp1 - 1) * B, B),
        jnp.swapaxes(ivh, -1, -2), jnp.swapaxes(ivl, -1, -2),
    )
    lh = jnp.concatenate([l0h[None], offh.reshape(Wp1 - 1, B, B)], axis=0)
    ll = jnp.concatenate([l0l[None], offl.reshape(Wp1 - 1, B, B)], axis=0)
    return lh, ll


def _tri_inv_one_ds(lh, ll):
    """(B, B) DS lower-triangular inverse by unrolled forward substitution.

    Requires the strict upper triangle of (lh, ll) to be exactly zero (as
    produced by panel_chol_ds), which keeps already-computed rows
    untouched by the rank-1 updates — no garbage at all.
    """
    B = lh.shape[0]
    th = jnp.eye(B, dtype=jnp.float32)
    tl = jnp.zeros((B, B), jnp.float32)
    rows_h, rows_l = [], []
    for c in range(B):
        ivh, ivl = ds.recip(lh[c, c], ll[c, c])
        xh, xl = ds.mul(th[c, :], tl[c, :], ivh, ivl)  # (B,)
        rows_h.append(xh)
        rows_l.append(xl)
        if c < B - 1:
            ph, pl = ds.mul(
                lh[:, c, None], ll[:, c, None], xh[None, :], xl[None, :]
            )
            th, tl = ds.sub(th, tl, ph, pl)
    xh = jnp.stack(rows_h, axis=0)
    xl = jnp.stack(rows_l, axis=0)
    keep = jnp.tril(jnp.ones((B, B), jnp.bool_))
    zero = jnp.zeros((), jnp.float32)
    return jnp.where(keep, xh, zero), jnp.where(keep, xl, zero)


def tri_inv_diag_blocks_ds(l0h, l0l):
    """Triangular inverses of all nb diagonal blocks, one vmapped sweep.

    l0: (nb, B, B) DS pair of lower-triangular blocks. Zero (padding)
    blocks are guarded to the identity.
    """
    eye = jnp.eye(l0h.shape[-1], dtype=jnp.float32)
    good = (jnp.abs(l0h).sum(axis=(-1, -2), keepdims=True) > 0)
    l0h = jnp.where(good, l0h, eye)
    l0l = jnp.where(good, l0l, 0.0)
    return jax.vmap(_tri_inv_one_ds)(l0h, l0l)


# ---------------------------------------------------------------------------
# block-banded Cholesky
# ---------------------------------------------------------------------------


def cholesky_block_banded_ds(blocks):
    """DS block-banded Cholesky, float64 boundary. See block.py for storage."""
    Wp1, nb, B, _ = blocks.shape
    W = Wp1 - 1
    bh, bl = _split(blocks)

    if W == 0:
        # vmapped panels must avoid the Pallas variant: vmap of a
        # pallas_call adds a grid dimension, and this platform rejects any
        # grid (pallas_kernels.py docstring)
        v = "fused" if jax.default_backend() == "tpu" else "nofuse"
        colh, coll = jax.vmap(
            lambda h, l: panel_chol_ds(h[None], l[None], variant=v)
        )(bh[0], bl[0])
        return _merge(colh, coll).transpose(1, 0, 2, 3)

    zero_blk = jnp.zeros((B, B), jnp.float32)

    def step(carry, inp):
        ch, cl = carry  # (W, W+1, B, B): c[p-1] = factor column J-p
        ah, al, j = inp
        # Schur update in ONE sliced matmul:
        #   s[q] = a[q] - sum_p C[p-1, q+p] @ C[p-1, p]^T
        # rows R[q] = [C[0, q+1] | C[1, q+2] | ... ]  (B, W*B)
        # cols G    = [C[0, 1]   ; C[1, 2]   ; ... ]^T stacked (W*B, B)
        rh = jnp.stack(
            [
                jnp.concatenate(
                    [
                        ch[p - 1, q + p] if q + p <= W else zero_blk
                        for p in range(1, W + 1)
                    ],
                    axis=-1,
                )
                for q in range(W + 1)
            ],
            axis=0,
        )
        rl = jnp.stack(
            [
                jnp.concatenate(
                    [
                        cl[p - 1, q + p] if q + p <= W else zero_blk
                        for p in range(1, W + 1)
                    ],
                    axis=-1,
                )
                for q in range(W + 1)
            ],
            axis=0,
        )
        gh = jnp.concatenate(
            [jnp.swapaxes(ch[p - 1, p], -1, -2) for p in range(1, W + 1)],
            axis=0,
        )
        gl = jnp.concatenate(
            [jnp.swapaxes(cl[p - 1, p], -1, -2) for p in range(1, W + 1)],
            axis=0,
        )
        uh, ul = _matmul_ds_raw(rh, rl, gh, gl)  # (W+1, B, B)
        sh, sl = ds.sub(ah, al, uh, ul)
        colh, coll = panel_chol_ds(sh, sl)
        keep = (j + jnp.arange(W + 1) < nb)[:, None, None]
        zero = jnp.zeros((), jnp.float32)
        colh = jnp.where(keep, colh, zero)
        coll = jnp.where(keep, coll, zero)
        ch = jnp.concatenate([colh[None], ch[:-1]], axis=0)
        cl = jnp.concatenate([coll[None], cl[:-1]], axis=0)
        return (ch, cl), (colh, coll)

    init = (
        jnp.zeros((W, W + 1, B, B), jnp.float32),
        jnp.zeros((W, W + 1, B, B), jnp.float32),
    )
    _, (colsh, colsl) = lax.scan(
        step,
        init,
        (jnp.moveaxis(bh, 1, 0), jnp.moveaxis(bl, 1, 0), jnp.arange(nb)),
        unroll=scan_unroll(),
    )
    return _merge(colsh, colsl).transpose(1, 0, 2, 3)


# ---------------------------------------------------------------------------
# solves (via precomputed diagonal-block inverses — one matmul per step)
# ---------------------------------------------------------------------------


def _linv_from_l(l_blocks):
    lh, ll = _split(l_blocks[0])  # (nb, B, B)
    return tri_inv_diag_blocks_ds(lh, ll)


def solve_lower_block_banded_ds(l_blocks, b, linv=None):
    """Solve L x = b (block forward substitution), float64 boundary."""
    Wp1, nb, B, _ = l_blocks.shape
    W = Wp1 - 1
    vec = b.ndim == 1
    b2 = b[:, None] if vec else b
    r = b2.shape[1]
    ivh, ivl = _linv_from_l(l_blocks) if linv is None else linv
    bh, bl = _split(b2.reshape(nb, B, r))

    if W == 0:
        xh, xl = _matmul_ds_raw(ivh, ivl, bh, bl)
        x = _merge(xh, xl).reshape(nb * B, r)
        return x[:, 0] if vec else x

    lh, ll = _split(l_blocks)
    # G[p-1, J] = L[J, J-p] = l_blocks[p, J-p]
    gh = jnp.stack(
        [jnp.roll(lh[p], p, axis=0).at[:p].set(0.0) for p in range(1, W + 1)],
        axis=0,
    )
    gl = jnp.stack(
        [jnp.roll(ll[p], p, axis=0).at[:p].set(0.0) for p in range(1, W + 1)],
        axis=0,
    )

    def step(carry, inp):
        xh, xl = carry  # (W, B, r): x[p-1] = block J-p
        gch, gcl, ih, il, bbh, bbl = inp
        # s = b_J - [G_1 | ... | G_W] @ [x_{J-1}; ...; x_{J-W}]
        rowh = jnp.concatenate([gch[p] for p in range(W)], axis=-1)
        rowl = jnp.concatenate([gcl[p] for p in range(W)], axis=-1)
        sth = jnp.concatenate([xh[p] for p in range(W)], axis=0)
        stl = jnp.concatenate([xl[p] for p in range(W)], axis=0)
        uh, ul = _matmul_ds_raw(rowh, rowl, sth, stl)
        sh, sl = ds.sub(bbh, bbl, uh, ul)
        xjh, xjl = _matmul_ds_raw(ih, il, sh, sl)
        xh = jnp.concatenate([xjh[None], xh[:-1]], axis=0)
        xl = jnp.concatenate([xjl[None], xl[:-1]], axis=0)
        return (xh, xl), (xjh, xjl)

    init = (jnp.zeros((W, B, r), jnp.float32), jnp.zeros((W, B, r), jnp.float32))
    _, (xsh, xsl) = lax.scan(
        step,
        init,
        (
            jnp.moveaxis(gh, 1, 0),
            jnp.moveaxis(gl, 1, 0),
            ivh,
            ivl,
            bh,
            bl,
        ),
        unroll=scan_unroll(),
    )
    x = _merge(xsh, xsl).reshape(nb * B, r)
    return x[:, 0] if vec else x


def solve_upper_block_banded_transpose_ds(l_blocks, b, linv=None):
    """Solve L^T x = b (block backward substitution), float64 boundary."""
    Wp1, nb, B, _ = l_blocks.shape
    W = Wp1 - 1
    vec = b.ndim == 1
    b2 = b[:, None] if vec else b
    r = b2.shape[1]
    ivh, ivl = _linv_from_l(l_blocks) if linv is None else linv
    bh, bl = _split(b2.reshape(nb, B, r))

    if W == 0:
        xh, xl = _matmul_ds_raw(
            jnp.swapaxes(ivh, -1, -2), jnp.swapaxes(ivl, -1, -2), bh, bl
        )
        x = _merge(xh, xl).reshape(nb * B, r)
        return x[:, 0] if vec else x

    lh, ll = _split(l_blocks)

    def step(carry, inp):
        xh, xl = carry  # (W, B, r): x[p-1] = block J+p
        lch, lcl, ih, il, bbh, bbl = inp
        # s = b_J - sum_p L[J+p, J]^T x_{J+p}
        rowh = jnp.concatenate(
            [jnp.swapaxes(lch[p], -1, -2) for p in range(1, W + 1)], axis=-1
        )
        rowl = jnp.concatenate(
            [jnp.swapaxes(lcl[p], -1, -2) for p in range(1, W + 1)], axis=-1
        )
        sth = jnp.concatenate([xh[p] for p in range(W)], axis=0)
        stl = jnp.concatenate([xl[p] for p in range(W)], axis=0)
        uh, ul = _matmul_ds_raw(rowh, rowl, sth, stl)
        sh, sl = ds.sub(bbh, bbl, uh, ul)
        xjh, xjl = _matmul_ds_raw(
            jnp.swapaxes(ih, -1, -2), jnp.swapaxes(il, -1, -2), sh, sl
        )
        xh = jnp.concatenate([xjh[None], xh[:-1]], axis=0)
        xl = jnp.concatenate([xjl[None], xl[:-1]], axis=0)
        return (xh, xl), (xjh, xjl)

    init = (jnp.zeros((W, B, r), jnp.float32), jnp.zeros((W, B, r), jnp.float32))
    _, (xsh, xsl) = lax.scan(
        step,
        init,
        (jnp.moveaxis(lh, 1, 0), jnp.moveaxis(ll, 1, 0), ivh, ivl, bh, bl),
        reverse=True,
        unroll=scan_unroll(),
    )
    x = _merge(xsh, xsl).reshape(nb * B, r)
    return x[:, 0] if vec else x


# ---------------------------------------------------------------------------
# block Takahashi (selected inverse on the block band)
# ---------------------------------------------------------------------------


def takahashi_inverse_block_banded_ds(l_blocks, linv=None):
    """Block band of (L L^T)^{-1}, float64 boundary. See block.py."""
    Wp1, nb, B, _ = l_blocks.shape
    W = Wp1 - 1
    ivh, ivl = _linv_from_l(l_blocks) if linv is None else linv

    if W == 0:
        sh, sl = _matmul_ds_raw(
            jnp.swapaxes(ivh, -1, -2), jnp.swapaxes(ivl, -1, -2), ivh, ivl
        )
        return _merge(sh, sl)[None]

    lh, ll = _split(l_blocks)
    zero_blk = jnp.zeros((B, B), jnp.float32)

    def step(carry, inp):
        csh, csl = carry  # (W, W+1, B, B): cs[p-1] = S column J+p
        lch, lcl, ih, il, j = inp
        wh = lch[1:]  # (W, B, B): w[p-1] = L[J+p, J]
        wl = lcl[1:]
        # M[q-1, p-1] = S_sym[J+q, J+p] flattened as (W, B, W*B)
        def m_rows(cs):
            rows = []
            for q in range(1, W + 1):
                cols = []
                for p in range(1, W + 1):
                    if p <= q:
                        cols.append(cs[p - 1, q - p])
                    else:
                        cols.append(jnp.swapaxes(cs[q - 1, p - q], -1, -2))
                rows.append(jnp.concatenate(cols, axis=-1))
            return jnp.stack(rows, axis=0)  # (W, B, W*B)

        mh = m_rows(csh)
        ml = m_rows(csl)
        wsh = wh.reshape(W * B, B)
        wsl = wl.reshape(W * B, B)
        th, tl = _matmul_ds_raw(mh, ml, wsh, wsl)  # (W, B, B)
        # s_off = -t @ linv
        soh, sol = _matmul_ds_raw(th, tl, ih, il)
        soh, sol = -soh, -sol
        # acc = sum_p s_off[p]^T w[p]  = (reshape s_off)ᵀ @ (reshape w)
        ath, atl = _matmul_ds_raw(
            jnp.swapaxes(soh.reshape(W * B, B), 0, 1),
            jnp.swapaxes(sol.reshape(W * B, B), 0, 1),
            wsh,
            wsl,
        )
        dh, dl = ds.sub(
            jnp.swapaxes(ih, -1, -2), jnp.swapaxes(il, -1, -2), ath, atl
        )
        sjh, sjl = _matmul_ds_raw(dh, dl, ih, il)
        # symmetrize by SELECTING the lower triangle and mirroring: a DS add
        # of a value with its own transpose sends the XLA CPU compiler into
        # a pathological (>5 min) simplification loop, and averaging plain
        # (hi, lo) parts would drop the lo-level precision.  The triangles
        # differ only by DS rounding, so either is a valid representative.
        pick = jnp.tril(jnp.ones(sjh.shape[-2:], jnp.bool_))
        sjh = jnp.where(pick, sjh, jnp.swapaxes(sjh, -1, -2))
        sjl = jnp.where(pick, sjl, jnp.swapaxes(sjl, -1, -2))
        colh = jnp.concatenate([sjh[None], soh], axis=0)
        coll = jnp.concatenate([sjl[None], sol], axis=0)
        keep = (j + jnp.arange(W + 1) < nb)[:, None, None]
        zero = jnp.zeros((), jnp.float32)
        colh = jnp.where(keep, colh, zero)
        coll = jnp.where(keep, coll, zero)
        csh = jnp.concatenate([colh[None], csh[:-1]], axis=0)
        csl = jnp.concatenate([coll[None], csl[:-1]], axis=0)
        return (csh, csl), (colh, coll)

    init = (
        jnp.zeros((W, W + 1, B, B), jnp.float32),
        jnp.zeros((W, W + 1, B, B), jnp.float32),
    )
    _, (colsh, colsl) = lax.scan(
        step,
        init,
        (jnp.moveaxis(lh, 1, 0), jnp.moveaxis(ll, 1, 0), ivh, ivl, jnp.arange(nb)),
        reverse=True,
        unroll=scan_unroll(),
    )
    return _merge(colsh, colsl).transpose(1, 0, 2, 3)
