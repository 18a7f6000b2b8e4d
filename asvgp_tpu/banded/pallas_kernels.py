"""Pallas TPU kernels for the banded linear-algebra core.

The XLA scan implementations in banded/ops.py are dispatch-overhead-bound on
TPU (~10µs per scan step → >100ms per factorization at m=10⁴).  These
kernels run each whole recursion as ONE Pallas program — the TPU equivalent
of the reference's single C++ call per banded op (banded_matrices,
SURVEY.md §2.2 N1), minus the Python↔C++ boundary.

Kernel architecture, shaped by what this platform's Mosaic lowers
(empirically: no grid kernels, no dynamic lane indexing, no sub-block VMEM
stores, no concatenation of offset-carrying slices along the sublane dim):

  * single program (no grid); the band (k+1, m) is reshaped on the XLA side
    to (nt, k+1, 128) so a `fori_loop` over the leading dim walks 128-column
    tiles with plain dynamic dim-0 ref reads/writes;
  * the k-column recursion window is the fori carry (a (k+1, k) register
    value) — it never touches memory;
  * inside a tile the 128 column steps are statically unrolled with
    lane-static register slices; output tiles are assembled with a single
    lane-dim concatenate;
  * the Cholesky column update uses the identity (a - s)/sqrt(a0 - s0)
    (row 0 equals sqrt(a0 - s0) automatically), avoiding sublane concats;
  * reverse sweeps read neighbor tiles from one-tile-shifted copies of the
    inputs built on the XLA side, so no index arithmetic is needed beyond
    the reversed loop counter;
  * validity masks are precomputed on the XLA side and streamed as tiles.

Pallas has no float64 on TPU, so kernels are float32; the float64 scan path
remains the precision reference (used on CPU and for parity tests).
Backward passes are hand-derived adjoints of the forward recursions — the
same way the reference's C++ ops register custom gradients — and are
exposed through jax.custom_vjp wrappers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128

# the statically-unrolled kernel bodies trace deep Python call chains
import sys as _sys

if _sys.getrecursionlimit() < 20000:
    _sys.setrecursionlimit(20000)

_INTERPRET = False  # flipped by tests on CPU


def set_interpret(value: bool) -> None:
    global _INTERPRET
    _INTERPRET = value


def trace_cached(f):
    """Route every call of ``f`` through one module-level ``jax.jit`` so its
    trace is cached across call sites and re-traces.

    Tracing a statically-unrolled DS kernel body costs ~15-20 s of host
    Python on this 1-core image, and a value-and-grad of the collapsed ELBO
    mentions the kernels ~6x (primal + custom-vjp fwd/bwd, then again inside
    the L-BFGS line search): without caching, *tracing* dominated warm
    end-to-end runs (226 s of the north-star t_opt vs 19.6 s of actual TPU
    execution).  ``jax.jit``'s trace cache is keyed on (function identity,
    avals), so one shared jitted instance makes all but the first trace
    free.  Interpret mode (tests on CPU) bypasses the wrapper because
    ``_INTERPRET`` is read at trace time and must not be baked into a
    cached trace.
    """
    import functools

    jf = jax.jit(f)

    @functools.wraps(f)
    def wrapper(*args, **kwargs):
        if _INTERPRET:
            return f(*args, **kwargs)
        return jf(*args, **kwargs)

    return wrapper


def _call(kernel, out_shape, *args):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(out_shape.shape, out_shape.dtype),
        interpret=_INTERPRET,
    )(*args)


def _call2(kernel, out_shapes, *args):
    """pallas_call with multiple outputs (used by the double-single kernels)."""
    return pl.pallas_call(
        kernel,
        out_shape=tuple(out_shapes),
        interpret=_INTERPRET,
    )(*args)


def _to_tiles(x, m, diag_value=0.0):
    """(r, m) -> (nt, r, TILE) with right padding (row 0 pad = diag_value)."""
    r = x.shape[0]
    nt = -(-m // TILE)
    P = nt * TILE
    if P != m:
        pad = jnp.zeros((r, P - m), x.dtype)
        if diag_value != 0.0:
            pad = pad.at[0].set(diag_value)
        x = jnp.concatenate([x, pad], axis=1)
    return jnp.moveaxis(x.reshape(r, nt, TILE), 1, 0)


def _from_tiles(x3, m):
    """(nt, r, TILE) -> (r, m)."""
    nt, r, _ = x3.shape
    return jnp.moveaxis(x3, 0, 1).reshape(r, nt * TILE)[:, :m]


def _mask_tiles(k, m, dtype):
    nt = -(-m // TILE)
    rows = np.arange(k + 1)[:, None]
    cols = np.arange(nt * TILE)[None, :]
    msk = (rows + cols < m).astype(np.float32)
    return jnp.asarray(
        msk.reshape(k + 1, nt, TILE).transpose(1, 0, 2), dtype
    )


def _prev_tiles(x3):
    """Tile t of result = tile (t-1) of input (zeros for t=0)."""
    zero = jnp.zeros_like(x3[:1])
    return jnp.concatenate([zero, x3[:-1]], axis=0)


def _next_tiles(x3):
    """Tile t of result = tile (t+1) of input (zeros for the last)."""
    zero = jnp.zeros_like(x3[:1])
    return jnp.concatenate([x3[1:], zero], axis=0)


def _pad_rows_f32(x, k):
    """In-kernel ``jnp.pad(x, ((0, k), (0, 0)))``: jnp.pad's Python-int fill
    constant becomes an int64 scalar under x64, and jax.export's Mosaic
    lowering recurses forever converting it (see ds.pad_rows)."""
    if k == 0:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((k,) + x.shape[1:], x.dtype)], axis=0
    )


# ===========================================================================
# banded Cholesky — forward
# ===========================================================================


def _chol_fwd_kernel(a_ref, mask_ref, o_ref):
    nt, kp1, _ = a_ref.shape
    k = kp1 - 1
    dtype = a_ref.dtype

    def tile_body(t, W):
        # W: (k+1, k) — W[:, p-1] = L column (i-p)
        X = a_ref[t]
        M = mask_ref[t]
        cols = []
        for j in range(TILE):
            a_col = X[:, j:j + 1]
            Wpad = _pad_rows_f32(W, k)
            s = jnp.zeros((k + 1, 1), dtype)
            for p in range(1, k + 1):
                g_p = W[p, p - 1]
                s = s + g_p * Wpad[p:p + k + 1, p - 1:p]
            # exact sqrt + divide: TPU rsqrt is an approximation whose error
            # compounds through the recursion
            inv = 1.0 / jnp.sqrt(a_col[0, 0] - s[0, 0])
            col = (a_col - s) * inv * M[:, j:j + 1]
            cols.append(col)
            W = jnp.concatenate([col, W[:, :-1]], axis=1)
        o_ref[t] = jnp.concatenate(cols, axis=1)
        return W

    lax.fori_loop(0, nt, tile_body, jnp.zeros((k + 1, k), dtype))


def cholesky_band_fwd_pallas(a_band: jnp.ndarray) -> jnp.ndarray:
    k = a_band.shape[0] - 1
    m = a_band.shape[1]
    if k == 0:
        return jnp.sqrt(a_band)
    a3 = _to_tiles(a_band, m, diag_value=1.0)
    mask = _mask_tiles(k, m, a_band.dtype)
    out = _call(_chol_fwd_kernel, jax.ShapeDtypeStruct(a3.shape, a3.dtype), a3, mask)
    return _from_tiles(out, m)


# ===========================================================================
# banded Cholesky — backward (adjoint of the column recursion)
# ===========================================================================


def _chol_bwd_kernel(l_ref, lprev_ref, cot_ref, mask_ref, o_ref):
    """(L, l̄) → ā by the reverse column sweep.

    Pending buffer P (k+1, k): column r = cotangent accumulated for L
    column (i - 1 - r) by steps > i.
    """
    nt, kp1, _ = l_ref.shape
    k = kp1 - 1
    dtype = l_ref.dtype

    def tile_body(t, P):
        # P: tuple of k (k+1, 1) pending-cotangent columns
        # inputs are tile-reversed on the XLA side: ascending t = reverse sweep
        lt = l_ref[t]
        lp = lprev_ref[t]
        ct = cot_ref[t]
        msk = mask_ref[t]
        cols = []
        for j in range(TILE - 1, -1, -1):
            # window W[:, p-1] = L column (j-p): in-tile or previous tile
            wcols = []
            for p in range(1, k + 1):
                if j - p >= 0:
                    wcols.append(lt[:, j - p:j - p + 1])
                else:
                    wcols.append(lp[:, TILE + j - p:TILE + j - p + 1])
            W = jnp.concatenate(wcols, axis=1)

            lcol = lt[:, j:j + 1]
            l0 = lcol[0, 0]
            lbar = (ct[:, j:j + 1] + P[0]) * msk[:, j:j + 1]

            inv_l0 = 1.0 / l0
            dbar = (lbar[0, 0] - jnp.sum(lbar[1:] * lcol[1:]) * inv_l0) * (
                0.5 * inv_l0
            )
            # ā = [d̄; l̄_j / l0]: build via masked blend, no sublane concat
            abar = lbar * inv_l0
            e0 = _row0_mask(k, dtype)
            abar = abar * (1.0 - e0) + e0 * dbar
            sbar = -abar

            Wbar_cols = []
            Wpad = _pad_rows_f32(W, k)
            for p in range(1, k + 1):
                g_p = W[p, p - 1]
                # wb[q] = s̄_{q-p} g_p for q >= p (roll keeps offset-0 layout)
                wb = pltpu.roll(sbar, np.int32(p), 0) * _rowge_mask(p, k, dtype) * g_p
                gbar_p = jnp.sum(sbar * Wpad[p:p + k + 1, p - 1:p])
                ep = _rowp_mask(p, k, dtype)
                wb = wb + ep * gbar_p
                Wbar_cols.append(wb)

            cols.append(abar)
            zcol = jnp.zeros((k + 1, 1), dtype)
            P = tuple(
                (P[r + 1] if r + 1 < k else zcol) + Wbar_cols[r] for r in range(k)
            )
        cols.reverse()
        o_ref[t] = jnp.concatenate(cols, axis=1)
        return P

    lax.fori_loop(
        0, nt, tile_body, tuple(jnp.zeros((k + 1, 1), dtype) for _ in range(k))
    )


def _laneshift_mask(k, dtype):
    cols = lax.broadcasted_iota(jnp.int32, (k + 1, k), 1)
    return lax.convert_element_type(
        lax.lt(cols, jnp.full_like(cols, np.int32(k - 1))), dtype
    )


def _row0_mask(k, dtype):
    rows = lax.broadcasted_iota(jnp.int32, (k + 1, 1), 0)
    return lax.convert_element_type(lax.eq(rows, jnp.zeros_like(rows)), dtype)


def _rowge_mask(p, k, dtype):
    rows = lax.broadcasted_iota(jnp.int32, (k + 1, 1), 0)
    return lax.convert_element_type(
        lax.ge(rows, jnp.full_like(rows, np.int32(p))), dtype
    )


def _rowp_mask(p, k, dtype):
    rows = lax.broadcasted_iota(jnp.int32, (k + 1, 1), 0)
    return lax.convert_element_type(
        lax.eq(rows, jnp.full_like(rows, np.int32(p))), dtype
    )


def cholesky_band_bwd_pallas(l_band, cot):
    k = l_band.shape[0] - 1
    m = l_band.shape[1]
    if k == 0:
        return cot / (2.0 * l_band)
    l3 = _to_tiles(l_band, m, diag_value=1.0)
    out = _call(
        _chol_bwd_kernel,
        jax.ShapeDtypeStruct(l3.shape, l3.dtype),
        l3[::-1],
        _prev_tiles(l3)[::-1],
        _to_tiles(cot, m)[::-1],
        _mask_tiles(k, m, l_band.dtype)[::-1],
    )
    return _from_tiles(out[::-1], m)


# ===========================================================================
# Takahashi banded sparse inverse — forward
# ===========================================================================


def _takahashi_fwd_kernel(l_ref, mask_ref, o_ref):
    nt, kp1, _ = l_ref.shape
    k = kp1 - 1
    dtype = l_ref.dtype

    def tile_body(t, CS):
        # CS: (k+1, k) — CS[:, p-1] = S column (j+p)
        # inputs are tile-reversed on the XLA side: ascending t = reverse sweep
        lt = l_ref[t]
        msk = mask_ref[t]
        cols = []
        for j in range(TILE - 1, -1, -1):
            lcol = lt[:, j:j + 1]
            d = 1.0 / lcol[0, 0]
            w = lcol[1:]  # (k, 1)
            s_rows = []
            for q in range(1, k + 1):
                acc = jnp.zeros((1, 1), dtype)
                for p in range(1, k + 1):
                    acc = acc + CS[abs(q - p), min(p, q) - 1] * w[p - 1, 0]
                s_rows.append(-d * acc)
            s = jnp.concatenate(s_rows, axis=0)
            sjj = d * d - d * jnp.sum(w * s)
            col = jnp.concatenate([sjj.reshape(1, 1), s], axis=0)
            col = col * msk[:, j:j + 1]
            cols.append(col)
            CS = jnp.concatenate([col, CS[:, :-1]], axis=1)
        cols.reverse()
        o_ref[t] = jnp.concatenate(cols, axis=1)
        return CS

    lax.fori_loop(0, nt, tile_body, jnp.zeros((k + 1, k), dtype))


def takahashi_fwd_pallas(l_band: jnp.ndarray) -> jnp.ndarray:
    k = l_band.shape[0] - 1
    m = l_band.shape[1]
    if k == 0:
        return 1.0 / (l_band * l_band)
    l3 = _to_tiles(l_band, m, diag_value=1.0)
    mask = _mask_tiles(k, m, l_band.dtype)
    out = _call(
        _takahashi_fwd_kernel, jax.ShapeDtypeStruct(l3.shape, l3.dtype),
        l3[::-1], mask[::-1],
    )
    return _from_tiles(out[::-1], m)


# ===========================================================================
# Takahashi — backward
# ===========================================================================


def _takahashi_bwd_kernel(l_ref, s_ref, snext_ref, cot_ref, mask_ref, o_ref):
    """Adjoint of the Takahashi recursion: (L, S, S̄) → L̄ (ascending sweep).

    Pending buffer Q (k+1, k): column r = cotangent for S column
    (j + 1 + r) accumulated by steps < j.
    """
    nt, kp1, _ = l_ref.shape
    k = kp1 - 1
    dtype = l_ref.dtype

    def tile_body(t, Q):
        lt = l_ref[t]
        st = s_ref[t]
        sn = snext_ref[t]
        ct = cot_ref[t]
        msk = mask_ref[t]
        cols = []
        for j in range(TILE):
            lcol = lt[:, j:j + 1]
            scol = st[:, j:j + 1]
            l0 = lcol[0, 0]
            d = 1.0 / l0
            # rebuild column vectors from scalar extracts: fresh offset-0
            # layouts (sublane-offset slices cannot feed concatenates here)
            w = jnp.concatenate(
                [lcol[r, 0].reshape(1, 1) for r in range(1, k + 1)], axis=0
            )
            s_off = jnp.concatenate(
                [scol[r, 0].reshape(1, 1) for r in range(1, k + 1)], axis=0
            )
            t_vec = -s_off * l0

            cs_cols = []
            for p in range(1, k + 1):
                if j + p < TILE:
                    cs_cols.append(st[:, j + p:j + p + 1])
                else:
                    cs_cols.append(sn[:, j + p - TILE:j + p - TILE + 1])
            CS = jnp.concatenate(cs_cols, axis=1)

            cbar = (ct[:, j:j + 1] + Q[0]) * msk[:, j:j + 1]
            sjj_bar = cbar[0, 0]
            sbar = jnp.concatenate(
                [cbar[r, 0].reshape(1, 1) for r in range(1, k + 1)], axis=0
            )

            dbar = 2.0 * d * sjj_bar - sjj_bar * jnp.sum(w * s_off)
            wbar = -d * sjj_bar * s_off
            sbar = sbar - d * sjj_bar * w
            dbar = dbar - jnp.sum(sbar * t_vec)
            tbar = -d * sbar  # (k, 1)

            wbar_add = [jnp.zeros((1, 1), dtype) for _ in range(k)]
            csbar_grid = [
                [jnp.zeros((1, 1), dtype) for _ in range(k)] for _ in range(k + 1)
            ]
            for q in range(1, k + 1):
                for p in range(1, k + 1):
                    m_qp = CS[abs(q - p), min(p, q) - 1]
                    tq = tbar[q - 1, 0]
                    wbar_add[p - 1] = wbar_add[p - 1] + (tq * m_qp).reshape(1, 1)
                    csbar_grid[abs(q - p)][min(p, q) - 1] = (
                        csbar_grid[abs(q - p)][min(p, q) - 1]
                        + (tq * w[p - 1, 0]).reshape(1, 1)
                    )
            wbar_acc = wbar + jnp.concatenate(wbar_add, axis=0)
            # L̄ column: row 0 = -d̄ d², rows 1..k = w̄
            l0bar = (-dbar * d * d).reshape(1, 1)
            lbar = jnp.concatenate([l0bar, wbar_acc], axis=0)
            cols.append(lbar)

            csbar_cols = [
                jnp.concatenate([csbar_grid[r][c] for r in range(k + 1)], axis=0)
                for c in range(k)
            ]
            zcol = jnp.zeros((k + 1, 1), dtype)
            Q = tuple(
                (Q[r + 1] if r + 1 < k else zcol) + csbar_cols[r] for r in range(k)
            )
        o_ref[t] = jnp.concatenate(cols, axis=1)
        return Q

    lax.fori_loop(
        0, nt, tile_body, tuple(jnp.zeros((k + 1, 1), dtype) for _ in range(k))
    )


def takahashi_bwd_pallas(l_band, s_band, cot):
    k = l_band.shape[0] - 1
    m = l_band.shape[1]
    if k == 0:
        return -2.0 * cot / (l_band ** 3)
    l3 = _to_tiles(l_band, m, diag_value=1.0)
    s3 = _to_tiles(s_band, m, diag_value=1.0)
    out = _call(
        _takahashi_bwd_kernel,
        jax.ShapeDtypeStruct(l3.shape, l3.dtype),
        l3,
        s3,
        _next_tiles(s3),
        _to_tiles(cot, m),
        _mask_tiles(k, m, l_band.dtype),
    )
    return _from_tiles(out, m)


# ===========================================================================
# triangular solves (vector RHS carried as (1, m) tiles)
# ===========================================================================


def _solve_lower_kernel(g_ref, d_ref, b_ref, o_ref):
    """Solve L x = b; g[t][p-1, j] = L[i, i-p] at i = t*TILE+j; d = diag."""
    nt, k, _ = g_ref.shape
    dtype = g_ref.dtype

    def tile_body(t, X):
        # X: (k, 1) — X[p-1] = x_{i-p}
        g = g_ref[t]
        dg = d_ref[t]
        b = b_ref[t]
        outs = []
        for j in range(TILE):
            acc = jnp.sum(g[:, j:j + 1] * X)
            xi = ((b[0, j] - acc) / dg[0, j]).reshape(1, 1)
            outs.append(xi)
            X = jnp.concatenate([xi, X[:-1]], axis=0)
        o_ref[t] = jnp.concatenate(outs, axis=1)
        return X

    lax.fori_loop(0, nt, tile_body, jnp.zeros((k, 1), dtype))


def solve_lower_pallas(l_band, b_row):
    k = l_band.shape[0] - 1
    m = l_band.shape[1]
    if k == 0:
        return b_row / l_band[0][None, :]
    from asvgp_tpu.banded.layout import shift_cols

    g = jnp.stack([shift_cols(l_band[p], -p) for p in range(1, k + 1)], axis=0)
    d = l_band[0][None, :]
    out = _call(
        _solve_lower_kernel,
        jax.ShapeDtypeStruct((-(-m // TILE), 1, TILE), b_row.dtype),
        _to_tiles(g, m),
        _to_tiles(d, m, diag_value=1.0),
        _to_tiles(b_row, m),
    )
    return _from_tiles(out, m)


def _solve_upper_t_kernel(l_ref, b_ref, o_ref):
    """Solve Lᵀ x = b (descending)."""
    nt, kp1, _ = l_ref.shape
    k = kp1 - 1
    dtype = l_ref.dtype

    def tile_body(t, X):
        # X: (k, 1) — X[p-1] = x_{i+p}
        # inputs are tile-reversed on the XLA side: ascending t = reverse sweep
        lt = l_ref[t]
        b = b_ref[t]
        outs = []
        for j in range(TILE - 1, -1, -1):
            lcol = lt[:, j:j + 1]
            acc = jnp.sum(lcol[1:] * X)
            xi = ((b[0, j] - acc) / lcol[0, 0]).reshape(1, 1)
            outs.append(xi)
            X = jnp.concatenate([xi, X[:-1]], axis=0)
        outs.reverse()
        o_ref[t] = jnp.concatenate(outs, axis=1)
        return X

    lax.fori_loop(0, nt, tile_body, jnp.zeros((k, 1), dtype))


def solve_upper_t_pallas(l_band, b_row):
    k = l_band.shape[0] - 1
    m = l_band.shape[1]
    if k == 0:
        return b_row / l_band[0][None, :]
    l3 = _to_tiles(l_band, m, diag_value=1.0)
    out = _call(
        _solve_upper_t_kernel,
        jax.ShapeDtypeStruct((l3.shape[0], 1, TILE), b_row.dtype),
        l3[::-1],
        _to_tiles(b_row, m)[::-1],
    )
    return _from_tiles(out[::-1], m)


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
    # x = L⁻ᵀ b  ⇒  b̄ = L⁻¹ x̄  and  L̄ = -x b̄ᵀ on the band:
    # L̄_band[p, c] = L̄[c+p, c] = -x_{c+p} b̄_c
    bbar = solve_lower_pallas(l_band, cot.reshape(1, -1)).reshape(-1)
    k = l_band.shape[0] - 1
    rows = [-(jnp.pad(x[p:], (0, p)) * bbar) for p in range(k + 1)]
    return jnp.stack(rows, axis=0), bbar


solve_upper_band_transpose_p.defvjp(_solve_ut_p_fwd, _solve_ut_p_bwd)
