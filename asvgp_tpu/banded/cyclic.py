"""Block-cyclic-reduction banded algebra: log-depth, vectorized over m.

The Pallas DS kernels (pallas_ds*.py) walk the m columns sequentially —
latency-bound at ~0.5-0.9µs/column, so m=10⁴ costs milliseconds per sweep
regardless of vector width.  This module removes the O(m) depth: a
bandwidth-k matrix IS block-tridiagonal with k×k blocks, and block cyclic
reduction (odd-even elimination) factors it in ⌈log₂(m/k)⌉ ≈ 12 levels,
each a BATCHED k×k elimination vectorized over all remaining blocks.

Layout: blocks are stored structure-of-arrays as (k, k, nb) — the batch
dimension rides the TPU lane dimension.  A (nb, k, k) layout puts the tiny
k×k trailer into the (8, 128) vector tiles at ~3% utilization and measured
~3x SLOWER than the sequential Pallas kernels; SoA fixes that.  All k×k
algebra is unrolled over the static block dimension (k ≤ 6) as elementwise
ops on (nb,) lanes — never dot_general (tiny f64 matmuls hit the
pathologically slow MXU-emulation path).

Primitives (differentiable by plain JAX autodiff — no hand adjoints):

  cr_logdet(band)           log|A|
  cr_solve(band, b)         A⁻¹ b
  cr_logdet_solve(band, b)  both, sharing one reduction sweep
  cr_trace(band, B)         tr(A⁻¹B) = ⟨∇cr_logdet, B⟩, with a custom VJP
                            that takes the second derivative as a
                            forward-over-reverse HVP (plain reverse² makes
                            the remote XLA compiler OOM at m=10⁴)
  cr_inverse_band(band)     band(A⁻¹) — the Takahashi selected inverse,
                            via ∂log|A|/∂band = (2−δ_{row0}) ∘ band(A⁻¹)

The reduction runs as ONE lax.scan over levels with shape-constant
carries: the active prefix halves each level and the tail is
identity-diagonal/zero-coupling padding, which is CLOSED under the
reduction (identity blocks eliminate to nothing: logdet contribution 0,
no Schur updates) — so no masking is needed and the traced body is tiny
(the fully unrolled version OOM-killed the remote compiler).

Numerics: plain float64 XLA.  On this TPU f64 is emulated and LONG
recursions silently degrade (CLAUDE.md), but CR is depth ~12: per-op error
cannot compound.  At high condition number CR is slightly MORE accurate
than the sequential recursions (50-digit referee: tools/referee_mp.py).

Reference parity: replaces the same C++ banded ops (cholesky_band /
inverse_from_cholesky_band / solve_triang_mat, SURVEY.md §2.2 N1) via a
TPU-shaped elimination order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# batched k×k helpers in SoA layout: a "block array" is (k, k, nb); a
# "block vector" is (k, nb).  All loops over k are static Python unrolls.
# ---------------------------------------------------------------------------


def _soa(rows):
    """list-of-list-of-(nb,) → (k, k, nb)."""
    return jnp.stack([jnp.stack(r, axis=0) for r in rows], axis=0)


def _bmm(a, b, ta=False):
    """C = op(A) @ B, unrolled; A, B (k, k, nb); op = transpose if ta."""
    k = a.shape[0]
    rows = []
    for i in range(k):
        row = []
        for j in range(k):
            s = None
            for l in range(k):
                ai = a[l, i] if ta else a[i, l]
                t = ai * b[l, j]
                s = t if s is None else s + t
            row.append(s)
        rows.append(row)
    return _soa(rows)


def _bmv(a, v, ta=False):
    """op(A) @ v, unrolled; v (k, nb)."""
    k = a.shape[0]
    out = []
    for i in range(k):
        s = None
        for l in range(k):
            ai = a[l, i] if ta else a[i, l]
            t = ai * v[l]
            s = t if s is None else s + t
        out.append(s)
    return jnp.stack(out, axis=0)


def _bT(a):
    """Blockwise transpose of (k, k, nb)."""
    return jnp.swapaxes(a, 0, 1)


def _bchol(d):
    """Batched Cholesky of (k, k, nb) SPD blocks, unrolled (k ≤ 6)."""
    k = d.shape[0]
    cols = [[None] * k for _ in range(k)]
    for j in range(k):
        s = d[j, j]
        for p in range(j):
            s = s - cols[j][p] * cols[j][p]
        ljj = jnp.sqrt(s)
        inv = 1.0 / ljj
        cols[j][j] = ljj
        for i in range(j + 1, k):
            s = d[i, j]
            for p in range(j):
                s = s - cols[i][p] * cols[j][p]
            cols[i][j] = s * inv
    zero = jnp.zeros_like(d[0, 0])
    return _soa([[cols[i][j] if j <= i else zero for j in range(k)]
                 for i in range(k)])


def _blogdet_from_chol(l):
    k = l.shape[0]
    return 2.0 * sum(jnp.log(l[j, j]) for j in range(k))


def _btrisolve_lower(l, b):
    """Solve L x = b; b (k, nb) (vector) or (k, k, nb) (matrix columns)."""
    k = l.shape[0]
    xs = []
    for i in range(k):
        s = b[i]
        for p in range(i):
            lip = l[i, p]
            s = s - (lip if s.ndim == 1 else lip[None]) * xs[p]
        lii = l[i, i]
        xs.append(s / (lii if s.ndim == 1 else lii[None]))
    return jnp.stack(xs, axis=0)


def _btrisolve_upper_t(l, b):
    """Solve Lᵀ x = b."""
    k = l.shape[0]
    xs = [None] * k
    for i in range(k - 1, -1, -1):
        s = b[i]
        for p in range(i + 1, k):
            lpi = l[p, i]
            s = s - (lpi if s.ndim == 1 else lpi[None]) * xs[p]
        lii = l[i, i]
        xs[i] = s / (lii if s.ndim == 1 else lii[None])
    return jnp.stack(xs, axis=0)


def _bsolve_spd(l, b):
    return _btrisolve_upper_t(l, _btrisolve_lower(l, b))


def _shift_blocks(x):
    """x[..., t] → slot t+1 (prepend zeros along the block axis)."""
    return jnp.concatenate(
        [jnp.zeros_like(x[..., :1]), x[..., :-1]], axis=-1)


# ---------------------------------------------------------------------------
# band ↔ block-tridiagonal conversion (SoA)
# ---------------------------------------------------------------------------


def _band_to_blocktri(band):
    """(k+1, m) lower band → (D, E) (k, k, nb) block-tridiagonal, nb a power
    of two (identity padding).  E[:, :, t] = A[block t, block t−1]
    (E[..., 0] = 0).  A[tk+a, tk+b] = band[|a−b|, tk+min(a,b)]."""
    k1, m = band.shape
    k = max(k1 - 1, 1)
    nb_raw = -(-m // k)
    nb = 1 << (nb_raw - 1).bit_length()
    n = nb * k
    dtype = band.dtype

    pad = jnp.zeros((k1, n - m), dtype)
    if n > m:
        pad = pad.at[0].set(1.0)  # identity padding: logdet += 0
    bandp = jnp.concatenate([band, pad], axis=1)
    band_r = bandp.reshape(k1, nb, k)  # band_r[d, t, j] = band[d, tk+j]

    zero = jnp.zeros((nb,), dtype)

    def dij(a, b):
        d = abs(a - b)
        return band_r[d, :, min(a, b)] if d <= k1 - 1 else zero

    D = _soa([[dij(a, b) for b in range(k)] for a in range(k)])

    # E[a, b, t] = A[tk+a, (t−1)k+b] = band[k+a−b, (t−1)k+b] (valid a ≤ b)
    def eij(a, b):
        d = k + a - b
        if d <= k1 - 1:
            return jnp.concatenate([zero[:1], band_r[d, :-1, b]])
        return zero

    E = _soa([[eij(a, b) for b in range(k)] for a in range(k)])
    return D, E, nb, k, n


def _identity_soa(k, nb, dtype):
    eye = jnp.eye(k, dtype=dtype)
    return jnp.broadcast_to(eye[:, :, None], (k, k, nb))


# ---------------------------------------------------------------------------
# cyclic reduction (scan over levels, shape-constant carries)
# ---------------------------------------------------------------------------


def _pair_split(x):
    """(..., nb) → (kept (..., nb/2), odd (..., nb/2)) by position parity."""
    nbh = x.shape[-1] // 2
    xp = x.reshape(x.shape[:-1] + (nbh, 2))
    return xp[..., 0], xp[..., 1]


def _cr_level(D, E, r):
    """One odd-even elimination level (odd-position blocks eliminated)."""
    k = D.shape[0]
    nbh = D.shape[-1] // 2
    De, Do = _pair_split(D)
    Ee, Eo = _pair_split(E)          # Eo[..., t] = A[2t+1, 2t]
    re, ro = _pair_split(r)
    # Er[..., t] = A[2t+2, 2t+1] = E at kept position t+1
    Er = jnp.concatenate([Ee[..., 1:], jnp.zeros_like(Ee[..., :1])], axis=-1)

    Lo = _bchol(Do)
    ld = jnp.sum(_blogdet_from_chol(Lo))
    X = _bsolve_spd(Lo, Eo)                    # D_o⁻¹ A[2t+1, 2t]
    Y = _bsolve_spd(Lo, _bT(Er))               # D_o⁻¹ A[2t+1, 2t+2]
    De2 = De - _bmm(Eo, X, ta=True)            # − A[2t,2t+1] D⁻¹ A[2t+1,2t]
    De2 = De2 - _shift_blocks(_bmm(Er, Y))     # odd 2t−1 → kept 2t
    Enew = _shift_blocks(-_bmm(Er, X))         # A'[2t+2, 2t]
    z = _bsolve_spd(Lo, ro)
    re2 = re - _bmv(Eo, z, ta=True) - _shift_blocks(_bmv(Er, z))
    # re-pad carries to full size: identity blocks / zero couplings / rhs
    D_next = jnp.concatenate([De2, _identity_soa(k, nbh, D.dtype)], axis=-1)
    E_next = jnp.concatenate([Enew, jnp.zeros_like(Enew)], axis=-1)
    r_next = jnp.concatenate([re2, jnp.zeros_like(re2)], axis=-1)
    return (D_next, E_next, r_next), (ld, Lo, Eo, Er, ro)


# Level handling.  Two forms, equivalent math:
#  * UNROLL_LEVELS=True: Python loop, shapes halve per level.  On THIS TPU
#    the f64 emulation MISCOMPILES the large unrolled graph (core value off
#    by 2.3e-3 vs 7e-13 for the scan form; same graph is exact on CPU) —
#    do not enable on the axon platform.
#  * False (default): lax.scan with shape-constant identity-padded carries.
#    Numerically exact everywhere, but this platform charges ~134µs of
#    loop overhead PER ITERATION, which caps a log-depth algorithm at
#    ~10ms/sweep-set — why the Pallas DS kernels remain the "auto" path
#    for training and CR is opt-in (set_impl("cr")).
UNROLL_LEVELS = False


def _cr_level_shrink(D, E, r):
    """As _cr_level but WITHOUT re-padding — shapes halve per level
    (unrolled mode only)."""
    nbh = D.shape[-1] // 2
    De, Do = _pair_split(D)
    Ee, Eo = _pair_split(E)
    re, ro = _pair_split(r)
    Er = jnp.concatenate([Ee[..., 1:], jnp.zeros_like(Ee[..., :1])], axis=-1)
    Lo = _bchol(Do)
    ld = jnp.sum(_blogdet_from_chol(Lo))
    X = _bsolve_spd(Lo, Eo)
    Y = _bsolve_spd(Lo, _bT(Er))
    De2 = De - _bmm(Eo, X, ta=True)
    De2 = De2 - _shift_blocks(_bmm(Er, Y))
    Enew = _shift_blocks(-_bmm(Er, X))
    z = _bsolve_spd(Lo, ro)
    re2 = re - _bmv(Eo, z, ta=True) - _shift_blocks(_bmv(Er, z))
    return (De2, Enew, re2), (ld, Lo, Eo, Er, ro)


def _cr_sweep_unrolled(D, E, r, nb, k, dtype, want_solve, m_out):
    total = jnp.zeros((), dtype)
    stack = []
    while D.shape[-1] > 1:
        (D, E, r), ys = _cr_level_shrink(D, E, r)
        total = total + ys[0]
        stack.append(ys)
    L_root = _bchol(D)
    total = total + _blogdet_from_chol(L_root)[0]
    if not want_solve:
        return total, None
    x = _bsolve_spd(L_root, r)
    for _ld, Lo, Eo, Er, ro in reversed(stack):
        xr = jnp.concatenate([x[:, 1:], jnp.zeros_like(x[:, :1])], axis=-1)
        rhs = ro - _bmv(Eo, x) - _bmv(Er, xr, ta=True)
        xo = _bsolve_spd(Lo, rhs)
        x = jnp.stack([x, xo], axis=-1).reshape(k, -1)
    return total, x.T.reshape(-1)[:m_out]


def _cr_sweep(band, b=None):
    """Full reduction → (log|A|, A⁻¹b or None)."""
    D, E, nb, k, n = _band_to_blocktri(band)
    dtype = band.dtype
    if b is None:
        r = jnp.zeros((k, nb), dtype)
    else:
        r = jnp.concatenate(
            [b, jnp.zeros((n - b.shape[0],), dtype)]).reshape(nb, k).T

    if UNROLL_LEVELS:
        return _cr_sweep_unrolled(
            D, E, r, nb, k, dtype, b is not None,
            None if b is None else b.shape[0])

    levels = nb.bit_length() - 1

    def body(carry, _):
        new_carry, ys = _cr_level(*carry)
        return new_carry, ys

    (Df, Ef, rf), (lds, Lo_s, Eo_s, Er_s, ro_s) = jax.lax.scan(
        body, (D, E, r), None, length=levels)
    L_root = _bchol(Df[:, :, :1])
    total = jnp.sum(lds) + _blogdet_from_chol(L_root)[0]
    if b is None:
        return total, None

    x0 = _bsolve_spd(L_root, rf[:, :1])
    x = jnp.concatenate([x0, jnp.zeros((k, nb - 1), dtype)], axis=-1)

    def back(x_, ys):
        _ld, Lo, Eo, Er, ro = ys
        nbh = Lo.shape[-1]
        x_kept = x_[:, :nbh]
        xr = jnp.concatenate(
            [x_kept[:, 1:], jnp.zeros_like(x_kept[:, :1])], axis=-1)
        # x_o = D_o⁻¹ (r_o − A[2t+1,2t] x_{2t} − A[2t+1,2t+2] x_{2t+2})
        rhs = ro - _bmv(Eo, x_kept) - _bmv(Er, xr, ta=True)
        xo = _bsolve_spd(Lo, rhs)
        merged = jnp.stack([x_kept, xo], axis=-1).reshape(x_.shape)
        return merged, None

    x, _ = jax.lax.scan(back, x, (lds, Lo_s, Eo_s, Er_s, ro_s), reverse=True)
    return total, x.T.reshape(-1)[: b.shape[0]]


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def cr_logdet(band):
    """log|A| for a symmetric positive-definite lower band (k+1, m)."""
    total, _ = _cr_sweep(band, None)
    return total


def cr_solve(band, b):
    """A⁻¹ b for a symmetric positive-definite lower band; b is (m,)."""
    _, x = _cr_sweep(band, b)
    return x


def cr_logdet_solve(band, b):
    """(log|A|, A⁻¹ b) sharing one reduction sweep."""
    return _cr_sweep(band, b)


def band_weights(k, m, dtype):
    """(2 − δ_{row 0}) lower-band weights (∂logdet/∂band = w ∘ band(A⁻¹))."""
    return jnp.concatenate(
        [jnp.ones((1, m), dtype), jnp.full((k, m), 2.0, dtype)], axis=0
    )


def cr_inverse_band(band):
    """band(A⁻¹) via ∇ cr_logdet (the Takahashi selected inverse)."""
    k = band.shape[0] - 1
    m = band.shape[1]
    g = jax.grad(cr_logdet)(band)
    return g / band_weights(k, m, band.dtype)


@jax.custom_vjp
def cr_trace(band, big):
    """tr(A⁻¹ B) = ⟨∇cr_logdet(A), B⟩ for banded symmetric SPD A, banded B.

    The custom VJP computes the A-gradient as a FORWARD-over-reverse
    Hessian-vector product (jvp of grad): plain reverse-over-reverse
    through the CR graph OOM-kills the remote XLA compiler at m=10⁴.
    """
    return jnp.vdot(jax.grad(cr_logdet)(band), big)


def _crtr_f(band, big):
    g = jax.grad(cr_logdet)(band)
    return jnp.vdot(g, big), (band, big, g)


def _crtr_b(res, cot):
    band, big, g = res
    # ∂/∂band ⟨∇ld(band), B⟩ = H(band)·B  (band-coordinate HVP)
    _, hvp = jax.jvp(jax.grad(cr_logdet), (band,), (big,))
    return cot * hvp, cot * g


cr_trace.defvjp(_crtr_f, _crtr_b)
