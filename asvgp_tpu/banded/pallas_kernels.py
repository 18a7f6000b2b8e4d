"""Pallas TPU kernels for the banded linear-algebra core.

The XLA scan implementations in banded/ops.py are dispatch-overhead-bound on
TPU (~10µs per scan step → >100ms per factorization at m=10⁴).  These
kernels run each whole recursion as ONE Pallas program with the band
resident in VMEM ((k+1)·m f32 ≈ 0.3 MB at m=10⁴) and a `fori_loop` over
columns carrying the k-column window in registers — the TPU equivalent of
the reference's single C++ call per banded op (banded_matrices, SURVEY.md
§2.2 N1), minus the Python↔C++ boundary.

Pallas has no float64 on TPU, so kernels are float32; the float64 scan path
remains the precision reference (used on CPU and for parity tests).
Backward passes are hand-derived adjoints of the forward recursions
(reverse column sweeps) — the same way the reference's C++ ops register
custom gradients — and are exposed through jax.custom_vjp wrappers.

All kernels use the (k+1, m) lower-band layout of banded/__init__.py.
Columns are handled as (k+1, 1) tiles; the window carries are small arrays
that live in vector registers across loop iterations.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False  # flipped by tests on CPU


def set_interpret(value: bool) -> None:
    global _INTERPRET
    _INTERPRET = value


def _call(kernel, out_shapes, *args):
    single = not isinstance(out_shapes, (tuple, list))
    shapes = (out_shapes,) if single else tuple(out_shapes)
    res = pl.pallas_call(
        kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct(s.shape, s.dtype) for s in shapes
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM) for _ in shapes),
        interpret=_INTERPRET,
    )(*args)
    return res[0] if single else res


def _col_mask(i, k, m, dtype):
    rows = lax.broadcasted_iota(jnp.int32, (k + 1, 1), 0)
    return (rows + i < m).astype(dtype)


# ===========================================================================
# banded Cholesky — forward
# ===========================================================================


def _chol_fwd_kernel(a_ref, o_ref):
    k = a_ref.shape[0] - 1
    m = a_ref.shape[1]
    dtype = a_ref.dtype

    def body(i, W):
        # W: (k, k+1) — W[p-1, :] = L column (i-p), zeros for i-p < 0
        a_col = a_ref[:, pl.ds(i, 1)]  # (k+1, 1)
        s = jnp.zeros((k + 1, 1), dtype)
        Wpad = jnp.pad(W, ((0, 0), (0, k)))
        for p in range(1, k + 1):
            g_p = W[p - 1, p]
            s = s + g_p * lax.dynamic_slice(Wpad[p - 1], (p,), (k + 1,)).reshape(k + 1, 1)
        d = a_col[0, 0] - s[0, 0]
        l0 = jnp.sqrt(d)
        col = jnp.concatenate(
            [l0.reshape(1, 1), (a_col[1:] - s[1:]) / l0], axis=0
        )
        col = col * _col_mask(i, k, m, dtype)
        o_ref[:, pl.ds(i, 1)] = col
        return jnp.concatenate([col.reshape(1, k + 1), W[:-1]], axis=0)

    if k == 0:
        o_ref[:, :] = jnp.sqrt(a_ref[:, :])
    else:
        lax.fori_loop(0, m, body, jnp.zeros((k, k + 1), dtype))


def cholesky_band_fwd_pallas(a_band: jnp.ndarray) -> jnp.ndarray:
    return _call(_chol_fwd_kernel, jax.ShapeDtypeStruct(a_band.shape, a_band.dtype), a_band)


# ===========================================================================
# banded Cholesky — backward (adjoint of the column recursion)
# ===========================================================================


def _chol_bwd_kernel(l_ref, cot_ref, o_ref):
    """Given L (residual) and l̄ (output cotangent), produce ā (band cotangent).

    Reverse sweep i = m-1..0.  Pending buffer P (k, k+1): P[r] = cotangent
    accumulated for column (i - 1 - r) by steps > i.
    """
    k = l_ref.shape[0] - 1
    m = l_ref.shape[1]
    dtype = l_ref.dtype

    if k == 0:
        # L = sqrt(A): Ā = l̄ / (2 L)
        o_ref[:, :] = cot_ref[:, :] / (2.0 * l_ref[:, :])
        return

    def read_window(i):
        # W[p-1, :] = L column (i-p); zeros when i-p < 0
        rows = []
        for p in range(1, k + 1):
            ip = i - p
            col = lax.cond(
                ip >= 0,
                lambda: l_ref[:, pl.ds(jnp.maximum(ip, 0), 1)].reshape(1, k + 1),
                lambda: jnp.zeros((1, k + 1), dtype),
            )
            rows.append(col)
        return jnp.concatenate(rows, axis=0)  # (k, k+1)

    def body(t, P):
        i = m - 1 - t
        W = read_window(i)
        lcol = l_ref[:, pl.ds(i, 1)].reshape(k + 1)
        l0 = lcol[0]
        lbar = cot_ref[:, pl.ds(i, 1)].reshape(k + 1) + P[0]
        # mask padding rows (their forward values were zeroed)
        mask = (lax.broadcasted_iota(jnp.int32, (k + 1, 1), 0).reshape(k + 1) + i < m)
        lbar = jnp.where(mask, lbar, 0.0)

        # forward: g_p = W[p-1, p]; s_j = Σ_p g_p W[p-1, j+p]
        #          d = a_0 - s_0; l_0 = sqrt(d); l_j = (a_j - s_j)/l_0
        inv_l0 = 1.0 / l0
        # d̄ = (l̄_0 - Σ_{j≥1} l̄_j l_j / l_0) / (2 l_0)
        dbar = (lbar[0] - jnp.sum(lbar[1:] * lcol[1:]) * inv_l0) * (0.5 * inv_l0)
        abar = jnp.concatenate([dbar[None], lbar[1:] * inv_l0])
        sbar = -abar  # s̄_j = -ā_j for all j

        # s_j = Σ_p g_p W[p-1, j+p]  (g_p = W[p-1, p])
        Wbar = jnp.zeros((k, k + 1), dtype)
        Wpad = jnp.pad(W, ((0, 0), (0, k)))
        sbar_pad = jnp.pad(sbar, (0, k))
        for p in range(1, k + 1):
            g_p = W[p - 1, p]
            # W̄[p-1, j+p] += s̄_j g_p  → shift s̄ right by p
            shifted = lax.dynamic_slice(
                jnp.pad(sbar, (k, 0)), (k - p,), (k + 1,)
            )  # shifted[q] = s̄_{q-p}
            Wbar = Wbar.at[p - 1].add(shifted * g_p)
            # ḡ_p = Σ_j s̄_j W[p-1, j+p]
            gbar_p = jnp.sum(sbar * lax.dynamic_slice(Wpad[p - 1], (p,), (k + 1,)))
            Wbar = Wbar.at[p - 1, p].add(gbar_p)

        o_ref[:, pl.ds(i, 1)] = abar.reshape(k + 1, 1)
        # shift pending buffer and add this step's window contributions
        P_new = jnp.concatenate([P[1:], jnp.zeros((1, k + 1), dtype)], axis=0) + Wbar
        return P_new

    lax.fori_loop(0, m, body, jnp.zeros((k, k + 1), dtype))


def cholesky_band_bwd_pallas(l_band, cot):
    return _call(
        _chol_bwd_kernel, jax.ShapeDtypeStruct(l_band.shape, l_band.dtype),
        l_band, cot,
    )


# ===========================================================================
# Takahashi banded sparse inverse — forward
# ===========================================================================


def _takahashi_fwd_kernel(l_ref, o_ref):
    k = l_ref.shape[0] - 1
    m = l_ref.shape[1]
    dtype = l_ref.dtype

    if k == 0:
        o_ref[:, :] = 1.0 / (l_ref[:, :] * l_ref[:, :])
        return

    def body(t, CS):
        # CS: (k, k+1) — CS[p-1, :] = S column (j+p)
        j = m - 1 - t
        lcol = l_ref[:, pl.ds(j, 1)].reshape(k + 1)
        d = 1.0 / lcol[0]
        w = lcol[1:]
        rows = []
        for q in range(1, k + 1):
            cols = []
            for p in range(1, k + 1):
                cols.append(CS[min(p, q) - 1, abs(q - p)])
            rows.append(jnp.stack(cols))
        M = jnp.stack(rows)  # (k, k)
        s = -d * jnp.sum(M * w[None, :], axis=1)
        sjj = d * d - d * jnp.sum(w * s)
        col = jnp.concatenate([sjj[None], s]).reshape(k + 1, 1)
        col = col * _col_mask(j, k, m, dtype)
        o_ref[:, pl.ds(j, 1)] = col
        return jnp.concatenate([col.reshape(1, k + 1), CS[:-1]], axis=0)

    lax.fori_loop(0, m, body, jnp.zeros((k, k + 1), dtype))


def takahashi_fwd_pallas(l_band: jnp.ndarray) -> jnp.ndarray:
    return _call(
        _takahashi_fwd_kernel, jax.ShapeDtypeStruct(l_band.shape, l_band.dtype), l_band
    )


# ===========================================================================
# Takahashi — backward
# ===========================================================================


def _takahashi_bwd_kernel(l_ref, s_ref, cot_ref, o_ref):
    """Adjoint of the Takahashi recursion: (L, S, S̄) → L̄.

    The forward ran j = m-1..0, so the adjoint sweeps j = 0..m-1 with a
    pending buffer Q (k, k+1): Q[r] = cotangent for S column (j + 1 + r)
    accumulated by steps < j.
    """
    k = l_ref.shape[0] - 1
    m = l_ref.shape[1]
    dtype = l_ref.dtype

    if k == 0:
        # S = L^{-2}: L̄ = -2 S̄ / L³
        o_ref[:, :] = -2.0 * cot_ref[:, :] / (l_ref[:, :] ** 3)
        return

    def read_cs(j):
        rows = []
        for p in range(1, k + 1):
            jp = j + p
            col = lax.cond(
                jp < m,
                lambda: s_ref[:, pl.ds(jnp.minimum(jp, m - 1), 1)].reshape(1, k + 1),
                lambda: jnp.zeros((1, k + 1), dtype),
            )
            rows.append(col)
        return jnp.concatenate(rows, axis=0)

    def body(j, Q):
        lcol = l_ref[:, pl.ds(j, 1)].reshape(k + 1)
        scol = s_ref[:, pl.ds(j, 1)].reshape(k + 1)
        l0 = lcol[0]
        d = 1.0 / l0
        w = lcol[1:]
        s = scol[1:]
        t_vec = -s * l0  # t_q = -s_q / d

        CS = read_cs(j)
        rows = []
        for q in range(1, k + 1):
            cols = []
            for p in range(1, k + 1):
                cols.append(CS[min(p, q) - 1, abs(q - p)])
            rows.append(jnp.stack(cols))
        M = jnp.stack(rows)  # (k, k)

        cbar = cot_ref[:, pl.ds(j, 1)].reshape(k + 1) + Q[0]
        mask = (lax.broadcasted_iota(jnp.int32, (k + 1, 1), 0).reshape(k + 1) + j < m)
        cbar = jnp.where(mask, cbar, 0.0)
        sjj_bar = cbar[0]
        sbar = cbar[1:]

        # sjj = d² - d Σ w_q s_q
        dbar = 2.0 * d * sjj_bar - sjj_bar * jnp.sum(w * s)
        wbar = -d * sjj_bar * s
        sbar = sbar - d * sjj_bar * w
        # s_q = -d t_q
        dbar = dbar - jnp.sum(sbar * t_vec)
        tbar = -d * sbar
        # t_q = Σ_p M[q,p] w_p
        Mbar = tbar[:, None] * w[None, :]
        wbar = wbar + jnp.sum(tbar[:, None] * M, axis=0)
        # M[q,p] = CS[min(p,q)-1, |q-p|]
        CSbar = jnp.zeros((k, k + 1), dtype)
        for q in range(1, k + 1):
            for p in range(1, k + 1):
                CSbar = CSbar.at[min(p, q) - 1, abs(q - p)].add(Mbar[q - 1, p - 1])
        # d = 1/l0
        l0bar = -dbar * d * d
        lbar = jnp.concatenate([l0bar[None], wbar])
        o_ref[:, pl.ds(j, 1)] = lbar.reshape(k + 1, 1)
        return jnp.concatenate([Q[1:], jnp.zeros((1, k + 1), dtype)], axis=0) + CSbar

    lax.fori_loop(0, m, body, jnp.zeros((k, k + 1), dtype))


def takahashi_bwd_pallas(l_band, s_band, cot):
    return _call(
        _takahashi_bwd_kernel, jax.ShapeDtypeStruct(l_band.shape, l_band.dtype),
        l_band, s_band, cot,
    )


# ===========================================================================
# triangular solves (vector RHS as (1, m))
# ===========================================================================


def _solve_lower_kernel(l_ref, b_ref, o_ref):
    """Solve L x = b; b and x stored as (1, m)."""
    k = l_ref.shape[0] - 1
    m = l_ref.shape[1]
    dtype = l_ref.dtype

    if k == 0:
        o_ref[:, :] = b_ref[:, :] / l_ref[:, :]
        return

    def body(i, X):
        # X: (k,) — X[p-1] = x_{i-p}
        # L[i, i-p] = l_band[p, i-p]: gather the off-diagonal entries
        acc = jnp.zeros((), dtype)
        for p in range(1, k + 1):
            ip = i - p
            lip = lax.cond(
                ip >= 0,
                lambda: l_ref[p, jnp.maximum(ip, 0)],
                lambda: jnp.zeros((), dtype),
            )
            acc = acc + lip * X[p - 1]
        xi = (b_ref[0, i] - acc) / l_ref[0, i]
        o_ref[0, i] = xi
        return jnp.concatenate([xi[None], X[:-1]])

    lax.fori_loop(0, m, body, jnp.zeros((k,), dtype))


def solve_lower_pallas(l_band, b_row):
    return _call(
        _solve_lower_kernel, jax.ShapeDtypeStruct(b_row.shape, b_row.dtype),
        l_band, b_row,
    )


def _solve_upper_t_kernel(l_ref, b_ref, o_ref):
    """Solve L^T x = b; b and x stored as (1, m)."""
    k = l_ref.shape[0] - 1
    m = l_ref.shape[1]
    dtype = l_ref.dtype

    if k == 0:
        o_ref[:, :] = b_ref[:, :] / l_ref[:, :]
        return

    def body(t, X):
        i = m - 1 - t
        lcol = l_ref[:, pl.ds(i, 1)].reshape(k + 1)
        acc = jnp.sum(lcol[1:] * X)
        xi = (b_ref[0, i] - acc) / lcol[0]
        o_ref[0, i] = xi
        return jnp.concatenate([xi[None], X[:-1]])

    lax.fori_loop(0, m, body, jnp.zeros((k,), dtype))


def solve_upper_t_pallas(l_band, b_row):
    return _call(
        _solve_upper_t_kernel, jax.ShapeDtypeStruct(b_row.shape, b_row.dtype),
        l_band, b_row,
    )


# ===========================================================================
# custom-vjp public ops (f32, TPU)
# ===========================================================================


@jax.custom_vjp
def cholesky_band_p(a_band):
    """Banded Cholesky (Pallas, float32) with a hand-derived VJP."""
    return cholesky_band_fwd_pallas(a_band)


def _chol_p_fwd(a_band):
    l = cholesky_band_fwd_pallas(a_band)
    return l, l


def _chol_p_bwd(l, cot):
    return (cholesky_band_bwd_pallas(l, cot),)


cholesky_band_p.defvjp(_chol_p_fwd, _chol_p_bwd)


@jax.custom_vjp
def takahashi_inverse_band_p(l_band):
    """Takahashi banded sparse-inverse (Pallas, float32) with VJP."""
    return takahashi_fwd_pallas(l_band)


def _tak_p_fwd(l_band):
    s = takahashi_fwd_pallas(l_band)
    return s, (l_band, s)


def _tak_p_bwd(res, cot):
    l_band, s = res
    return (takahashi_bwd_pallas(l_band, s, cot),)


takahashi_inverse_band_p.defvjp(_tak_p_fwd, _tak_p_bwd)


@jax.custom_vjp
def solve_lower_band_p(l_band, b):
    """Solve L x = b (vector), Pallas, with VJP."""
    return solve_lower_pallas(l_band, b.reshape(1, -1)).reshape(-1)


def _solve_p_fwd(l_band, b):
    x = solve_lower_pallas(l_band, b.reshape(1, -1)).reshape(-1)
    return x, (l_band, x)


def _solve_p_bwd(res, cot):
    l_band, x = res
    # x = L⁻¹ b  ⇒  b̄ = L⁻ᵀ x̄  and  L̄ = -b̄ xᵀ restricted to the band:
    # L̄_band[p, c] = L̄[c+p, c] = -b̄_{c+p} x_c
    bbar = solve_upper_t_pallas(l_band, cot.reshape(1, -1)).reshape(-1)
    k = l_band.shape[0] - 1
    rows = [-(jnp.pad(bbar[p:], (0, p)) * x) for p in range(k + 1)]
    return jnp.stack(rows, axis=0), bbar


solve_lower_band_p.defvjp(_solve_p_fwd, _solve_p_bwd)


@jax.custom_vjp
def solve_upper_band_transpose_p(l_band, b):
    """Solve Lᵀ x = b (vector), Pallas, with VJP."""
    return solve_upper_t_pallas(l_band, b.reshape(1, -1)).reshape(-1)


def _solve_ut_p_fwd(l_band, b):
    x = solve_upper_t_pallas(l_band, b.reshape(1, -1)).reshape(-1)
    return x, (l_band, x)


def _solve_ut_p_bwd(res, cot):
    l_band, x = res
    # x = L⁻ᵀ b  ⇒  b̄ = L⁻¹ x̄  and  (Lᵀ)̄ = -b̄ xᵀ ⇒ L̄ = -x b̄ᵀ on the band:
    # L̄_band[p, c] = L̄[c+p, c] = -x_{c+p} b̄_c
    bbar = solve_lower_pallas(l_band, cot.reshape(1, -1)).reshape(-1)
    k = l_band.shape[0] - 1
    rows = [-(jnp.pad(x[p:], (0, p)) * bbar) for p in range(k + 1)]
    return jnp.stack(rows, axis=0), bbar


solve_upper_band_transpose_p.defvjp(_solve_ut_p_fwd, _solve_ut_p_bwd)
