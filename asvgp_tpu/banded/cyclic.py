"""Block-cyclic-reduction banded algebra: log-depth, vectorized over m.

The Pallas DS kernels (pallas_ds*.py) walk the m columns sequentially —
latency-bound at ~0.5-0.9µs/column, so m=10⁴ costs milliseconds per sweep
regardless of vector width.  This module removes the O(m) depth: a
bandwidth-k matrix IS block-tridiagonal with k×k blocks, and block cyclic
reduction (odd-even elimination) factors it in ⌈log₂(m/k)⌉ ≈ 12 levels,
each a BATCHED k×k elimination vectorized over all remaining blocks — the
shape of computation the VPU likes.

Primitives (all differentiable by plain JAX autodiff — no hand adjoints):

  cr_logdet(band)      log|A|
  cr_solve(band, b)    A⁻¹ b   (elimination + back-substitution up the tree)

and the identity  ∂ log|A| / ∂band = (2−δ_{row 0}) ∘ band(A⁻¹)  means the
Takahashi selected inverse is just ``jax.grad(cr_logdet)`` — the trace term
tr(Kuu⁻¹B) is ⟨∇cr_logdet(kuu), B⟩ and prediction's posterior bands come
from the same gradient.  Second derivatives (needed when the ELBO is
differentiated) flow through the same graph.

Numerics: everything is plain float64 XLA.  On this TPU f64 is emulated
and *long* recursions silently degrade (CLAUDE.md), but CR is depth ~12:
per-op error cannot compound meaningfully.  Block products are written as
broadcast-multiply-reduce (VPU elementwise), never dot_general — tiny f64
matmuls hit the pathologically slow MXU-emulation path.  The k×k block
Cholesky/solves are fully unrolled over the (static, ≤6) block dimension.

Reference parity: replaces the same C++ banded ops (cholesky_band /
inverse_from_cholesky_band / solve, SURVEY.md §2.2 N1) — via a different,
TPU-shaped elimination order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# batched k×k helpers, unrolled over the static block dimension
# ---------------------------------------------------------------------------


def _bmm(a, b):
    """Batched (…, k, k) @ (…, k, k) as broadcast-mul-reduce (VPU path)."""
    return jnp.sum(a[..., :, :, None] * b[..., None, :, :], axis=-2)


def _bmv(a, v):
    """Batched (…, k, k) @ (…, k)."""
    return jnp.sum(a * v[..., None, :], axis=-1)


def _bT(a):
    return jnp.swapaxes(a, -1, -2)


def _bchol(d):
    """Batched Cholesky of (…, k, k) SPD blocks, unrolled (k ≤ 6)."""
    k = d.shape[-1]
    cols = [[None] * k for _ in range(k)]
    for j in range(k):
        s = d[..., j, j]
        for p in range(j):
            s = s - cols[j][p] * cols[j][p]
        ljj = jnp.sqrt(s)
        inv = 1.0 / ljj
        cols[j][j] = ljj
        for i in range(j + 1, k):
            s = d[..., i, j]
            for p in range(j):
                s = s - cols[i][p] * cols[j][p]
            cols[i][j] = s * inv
    rows = []
    for i in range(k):
        rows.append(jnp.stack(
            [cols[i][j] if j <= i else jnp.zeros_like(d[..., 0, 0])
             for j in range(k)], axis=-1))
    return jnp.stack(rows, axis=-2)


def _blogdet_from_chol(l):
    k = l.shape[-1]
    return 2.0 * sum(jnp.log(l[..., j, j]) for j in range(k))


def _btrisolve_lower(l, b):
    """Batched solve L x = b; b (…, k) or (…, k, r); unrolled."""
    k = l.shape[-1]
    vec = b.ndim == l.ndim - 1
    xs = []
    for i in range(k):
        s = b[..., i] if vec else b[..., i, :]
        for p in range(i):
            lip = l[..., i, p] if vec else l[..., i, p, None]
            s = s - lip * xs[p]
        lii = l[..., i, i] if vec else l[..., i, i, None]
        xs.append(s / lii)
    return jnp.stack(xs, axis=-1 if vec else -2)


def _btrisolve_upper_t(l, b):
    """Batched solve Lᵀ x = b; unrolled."""
    k = l.shape[-1]
    vec = b.ndim == l.ndim - 1
    xs = [None] * k
    for i in range(k - 1, -1, -1):
        s = b[..., i] if vec else b[..., i, :]
        for p in range(i + 1, k):
            lpi = l[..., p, i] if vec else l[..., p, i, None]
            s = s - lpi * xs[p]
        lii = l[..., i, i] if vec else l[..., i, i, None]
        xs[i] = s / lii
    return jnp.stack(xs, axis=-1 if vec else -2)


def _bsolve_spd(l, b):
    """A⁻¹ b given the batched Cholesky factor of A."""
    return _btrisolve_upper_t(l, _btrisolve_lower(l, b))


# ---------------------------------------------------------------------------
# band ↔ block-tridiagonal conversion
# ---------------------------------------------------------------------------


def _band_to_blocktri(band):
    """(k+1, m) lower band → (D (nb, k, k), E (nb, k, k)) block-tridiagonal,
    nb a power of two (identity padding).  E[i] = A[block i, block i−1]
    (E[0] = 0).  For k == 0 the band is its own 1×1 block diagonal."""
    k1, m = band.shape
    k = max(k1 - 1, 1)
    nb_raw = -(-m // k)
    nb = 1 << (nb_raw - 1).bit_length()
    n = nb * k
    dtype = band.dtype

    # dense row index map: A[i, j] = band[i-j, j] for 0 <= i-j <= k1-1
    pad = jnp.zeros((k1, n - m), dtype)
    if n > m:
        pad = pad.at[0].set(1.0)  # identity padding: logdet += 0
    bandp = jnp.concatenate([band, pad], axis=1)

    # D[t][a, b] = A[tk+a, tk+b] ; E[t][a, b] = A[tk+a, (t-1)k+b]
    idx_t = jnp.arange(nb)
    a_idx = jnp.arange(k)
    # offsets within the band: row (i-j), col j
    def gather(i_off, j_off):
        # A[tk + i_off, tk + j_off] over t; i_off, j_off scalars
        d = i_off - j_off
        col = idx_t * k + j_off
        if 0 <= d <= k1 - 1:
            return bandp[d, col]
        if -(k1 - 1) <= d < 0:
            # upper triangle: A[i,j] = A[j,i] = band[j-i, i]
            return bandp[-d, idx_t * k + i_off]
        return jnp.zeros((nb,), dtype)

    D = jnp.stack(
        [jnp.stack([gather(a, b) for b in range(k)], axis=-1)
         for a in range(k)], axis=-2)
    # E[t] = A[tk+a, (t-1)k+b] → offset d = k + a - b relative to col (t-1)k+b
    def gather_e(a, b):
        d = k + a - b
        if 0 <= d <= k1 - 1:
            col = (idx_t - 1) * k + b
            v = bandp[d, jnp.clip(col, 0, n - 1)]
            return jnp.where(idx_t >= 1, v, 0.0)
        return jnp.zeros((nb,), dtype)

    E = jnp.stack(
        [jnp.stack([gather_e(a, b) for b in range(k)], axis=-1)
         for a in range(k)], axis=-2)
    return D, E, nb, k, n


# ---------------------------------------------------------------------------
# cyclic reduction
# ---------------------------------------------------------------------------


def _cr_reduce(D, E):
    """One odd-even elimination level.

    Blocks at odd positions are eliminated; returns (D', E', logdet_inc,
    factors) where factors are the per-level quantities needed for solves.
    """
    Do = D[1::2]      # eliminated
    De = D[0::2]      # kept
    Eo = E[1::2]      # coupling odd→even-left: A[2t+1, 2t]
    Ee = E[0::2]      # A[2t, 2t-1] (kept level couplings input)
    # neighbors of odd block i=2t+1: left 2t (always exists), right 2t+2
    Lo = _bchol(Do)
    ld = jnp.sum(_blogdet_from_chol(Lo))
    # X = D_o⁻¹ E_o ; Y = D_o⁻¹ E_{2t+2}ᵀ (right coupling)
    # right coupling of odd block: E[2t+2] = A[2t+2, 2t+1]; shift Ee by one
    Er = jnp.concatenate([E[2::2], jnp.zeros_like(E[:1])], axis=0)  # A[2t+2, 2t+1]
    X = _bsolve_spd(Lo, Eo)          # D_o⁻¹ A[2t+1, 2t]
    Y = _bsolve_spd(Lo, _bT(Er))     # D_o⁻¹ A[2t+1, 2t+2]
    # Schur updates:
    # D'[t]   = D[2t]  − A[2t, 2t+1] X_{t... careful indexing: odd block
    # between kept blocks 2t and 2t+2 is 2t+1 with left coupling Eo[t].
    De2 = De - _bmm(_bT(Eo), X)
    # contribution of odd block 2t-1 to kept block 2t: uses Y_{t-1}
    right_upd = _bmm(Er, Y)          # A[2t+2, 2t+1] D⁻¹ A[2t+1, 2t+2]
    De2 = De2 - jnp.concatenate([jnp.zeros_like(right_upd[:1]),
                                 right_upd[:-1]], axis=0)
    # new coupling between kept 2t and 2t+2: −A[2t+2, 2t+1] D⁻¹ A[2t+1, 2t]
    Enew_full = -_bmm(Er, X)         # value for new E'[t+1] = A'[2t+2, 2t]
    Enew = jnp.concatenate([jnp.zeros_like(Enew_full[:1]),
                            Enew_full[:-1]], axis=0)
    return De2, Enew, ld, (Lo, Eo, Er)


def cr_logdet(band):
    """log|A| for a symmetric positive-definite lower band (k+1, m)."""
    D, E, nb, k, _ = _band_to_blocktri(band)
    total = jnp.zeros((), band.dtype)
    while nb > 1:
        D, E, ld, _ = _cr_reduce(D, E)
        total = total + ld
        nb //= 2
    total = total + _blogdet_from_chol(_bchol(D))[0]
    return total


def cr_solve(band, b):
    """A⁻¹ b for a symmetric positive-definite lower band; b is (m,)."""
    D, E, nb, k, n = _band_to_blocktri(band)
    r = jnp.concatenate([b, jnp.zeros((n - b.shape[0],), b.dtype)]).reshape(-1, k)
    stack = []
    while nb > 1:
        ro = r[1::2]
        re = r[0::2]
        D2, E2, _, (Lo, Eo, Er) = _cr_reduce(D, E)
        z = _bsolve_spd(Lo, ro)           # D_o⁻¹ r_o
        re2 = re - _bmv(_bT(Eo), z)
        right = _bmv(Er, z)               # goes to kept block 2t+2
        re2 = re2 - jnp.concatenate([jnp.zeros_like(right[:1]), right[:-1]],
                                    axis=0)
        stack.append((Lo, Eo, Er, ro))
        D, E, r = D2, E2, re2
        nb //= 2
    x = _bsolve_spd(_bchol(D), r)
    for Lo, Eo, Er, ro in reversed(stack):
        # x currently solves the kept blocks; recover odd blocks:
        # x_o = D_o⁻¹ (r_o − A[2t+1, 2t] x_{2t} − A[2t+1, 2t+2] x_{2t+2})
        xl = x                                   # kept block 2t (t-th)
        xr = jnp.concatenate([x[1:], jnp.zeros_like(x[:1])], axis=0)
        rhs = ro - _bmv(Eo, xl) - _bmv(_bT(Er), xr)
        xo = _bsolve_spd(Lo, rhs)
        # interleave kept/odd back to the finer level
        nb2 = x.shape[0] * 2
        merged = jnp.zeros((nb2,) + x.shape[1:], x.dtype)
        merged = merged.at[0::2].set(x).at[1::2].set(xo)
        x = merged
    xf = x.reshape(-1)
    return xf[: b.shape[0]]


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
