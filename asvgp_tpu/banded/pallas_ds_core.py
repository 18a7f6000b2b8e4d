"""The collapsed-ELBO banded core as two fused double-single Pallas sweeps.

The reference evaluates its ELBO with ~6 separate C++ banded ops per step
(asvgp/gpr.py:49-89) and differentiates through each.  On this TPU every
banded recursion is a latency-bound double-single chain (~0.5-1.2µs per
column regardless of arithmetic count — see tools/phase_bench.py), so the
win is *structural*: fewer sweeps, with independent work interleaved into
the stalls of each sweep's dependency chain.

Forward = exactly TWO kernels:

  kernel A (forward sweep):  pair Cholesky of (Kuu, P) — lane-interleaved —
     with the lower solve L_P c₀ = Kuf·y folded into the same column loop.
     The solve reuses the factorization's just-computed reciprocal pivot
     (one ds.rsqrt yields BOTH L[i,i] and 1/L[i,i]), so it adds no divide
     to the chain; the reciprocal diagonals are emitted as an extra output.

  kernel B (reverse sweep):  pair Takahashi band of (Kuu⁻¹, P⁻¹) with the
     upper solve L_Pᵀ u = c₀ folded in; consumes kernel A's reciprocal
     diagonals, so it contains no divides at all.

Everything the ELBO needs is then elementwise in the outputs:
  log|Kuu|, log|P|  from the factor diagonals,
  bᵀP⁻¹b            = ‖c₀‖²,
  tr(Kuu⁻¹ B)       = band-Frobenius(S_Kuu, B),
and — because S_P and u = P⁻¹b come out of the SAME sweeps — so is most of
the gradient:

  ∂log|P|/∂P = band(P⁻¹) = S_P          (exact; Takahashi)
  ∂(bᵀP⁻¹b)/∂P = −band(u uᵀ), ∂/∂b = 2u
  ∂log|Kuu|/∂Kuu = S_Kuu

The ONLY gradient without a closed band form is the trace term
(−band(Kuu⁻¹ B Kuu⁻¹)), which runs the existing Takahashi-adjoint and
single Cholesky-adjoint kernels (pallas_ds.py).  Net: a value-and-grad
step is 4 sequential kernels (A, B, tak-adjoint, chol-adjoint) instead of
the previous 6, and the backward never touches P's factor again.

These same A+B sweeps ARE the posterior computation for prediction
(w = P⁻¹Kuf·y/σ², variance band S_P − S_Kuu): see ``banded_posterior``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from asvgp_tpu.banded import ds
from asvgp_tpu.banded.pallas_ds import (
    _merge_tiles,
    _split_tiles,
)
from asvgp_tpu.banded.pallas_ds_pair import (
    _from_pair_tiles,
    _pair_mask_tiles,
    _pair_tiles,
)
from asvgp_tpu.banded.pallas_kernels import (
    TILE,
    _call2,
    _row0_mask as _row0,
    _rowp_mask as _rowp,
)


# ===========================================================================
# kernel A: pair Cholesky (Kuu, P) ⊗ lower solve on P
# ===========================================================================


def _chol_pair_solve_kernel(ah_ref, al_ref, mask_ref, bh_ref, bl_ref,
                            oh_ref, ol_ref, ivh_ref, ivl_ref, ch_ref, cl_ref):
    nt, kp1, _ = ah_ref.shape
    k = kp1 - 1
    f32 = jnp.float32

    def tile_body(t, carry):
        Wh, Wl, Xh, Xl = carry  # W: (k+1, 2k) pair cols; X: (k, 1) solve lag
        Ah, Al = ah_ref[t], al_ref[t]
        M = mask_ref[t]
        bh, bl = bh_ref[t], bl_ref[t]
        colsh, colsl = [], []
        ivsh, ivsl = [], []
        xsh, xsl = [], []
        for j in range(TILE):
            ach = Ah[:, 2 * j:2 * j + 2]
            acl = Al[:, 2 * j:2 * j + 2]
            # ---- in-stream solve accumulation (uses W BEFORE update) -----
            sah, sal = jnp.float32(0.0), jnp.float32(0.0)
            for p in range(1, k + 1):
                th, tl = ds.mul(
                    Wh[p, 2 * p - 1], Wl[p, 2 * p - 1],  # L_P[i, i-p]
                    Xh[p - 1, 0], Xl[p - 1, 0],
                )
                sah, sal = ds.add(sah, sal, th, tl)
            rbh, rbl = ds.sub(bh[0, j], bl[0, j], sah, sal)
            # ---- pair Cholesky column -----------------------------------
            Wph = jnp.pad(Wh, ((0, k), (0, 0)))
            Wpl = jnp.pad(Wl, ((0, k), (0, 0)))
            sh = jnp.zeros((k + 1, 2), f32)
            sl = jnp.zeros((k + 1, 2), f32)
            for p in range(1, k + 1):
                gph = Wh[p:p + 1, 2 * (p - 1):2 * p]
                gpl = Wl[p:p + 1, 2 * (p - 1):2 * p]
                th, tl = ds.mul(
                    Wph[p:p + k + 1, 2 * (p - 1):2 * p],
                    Wpl[p:p + k + 1, 2 * (p - 1):2 * p],
                    gph, gpl,
                )
                sh, sl = ds.add(sh, sl, th, tl)
            rh, rl = ds.sub(ach, acl, sh, sl)
            rvh, rvl = ds.rsqrt(rh[0:1, :], rl[0:1, :])  # (1, 2)
            ch, cl = ds.mul(rh, rl, rvh, rvl)  # row 0 = sqrt(d) exactly
            mj = M[:, 2 * j:2 * j + 2]
            ch = ch * mj
            cl = cl * mj
            colsh.append(ch)
            colsl.append(cl)
            ivsh.append(rvh)
            ivsl.append(rvl)
            # ---- finish solve with the P-lane reciprocal pivot ----------
            xh, xl = ds.mul(rbh, rbl, rvh[0, 1], rvl[0, 1])
            xh = xh * mj[0, 1]
            xl = xl * mj[0, 1]
            xsh.append(xh.reshape(1, 1))
            xsl.append(xl.reshape(1, 1))
            Xh = jnp.concatenate([xh.reshape(1, 1), Xh[:-1]], axis=0)
            Xl = jnp.concatenate([xl.reshape(1, 1), Xl[:-1]], axis=0)
            Wh = jnp.concatenate([ch, Wh[:, :-2]], axis=1)
            Wl = jnp.concatenate([cl, Wl[:, :-2]], axis=1)
        oh_ref[t] = jnp.concatenate(colsh, axis=1)
        ol_ref[t] = jnp.concatenate(colsl, axis=1)
        ivh_ref[t] = jnp.concatenate(ivsh, axis=1)
        ivl_ref[t] = jnp.concatenate(ivsl, axis=1)
        ch_ref[t] = jnp.concatenate(xsh, axis=1)
        cl_ref[t] = jnp.concatenate(xsl, axis=1)
        return (Wh, Wl, Xh, Xl)

    zw = jnp.zeros((k + 1, 2 * k), jnp.float32)
    zx = jnp.zeros((k, 1), jnp.float32)
    lax.fori_loop(0, nt, tile_body, (zw, zw, zx, zx))


# ===========================================================================
# kernel B: pair Takahashi (Kuu, P) ⊗ upper solve on P
# ===========================================================================


def _tak_pair_solve_kernel(lh_ref, ll_ref, ivh_ref, ivl_ref, mask_ref,
                           bh_ref, bl_ref,
                           sh_ref, sl_ref, uh_ref, ul_ref):
    nt, kp1, _ = lh_ref.shape
    k = kp1 - 1
    f32 = jnp.float32

    def tile_body(t, carry):
        CSh, CSl, Xh, Xl = carry  # CS: (k+1, 2k) pair cols j+1..j+k
        lth, ltl = lh_ref[t], ll_ref[t]
        ivt_h, ivt_l = ivh_ref[t], ivl_ref[t]
        msk = mask_ref[t]
        bh, bl = bh_ref[t], bl_ref[t]
        colsh, colsl = [], []
        ush, usl = [], []
        for jj in range(TILE):
            j = TILE - 1 - jj
            lch, lcl = lth[:, 2 * j:2 * j + 2], ltl[:, 2 * j:2 * j + 2]
            dh, dl = ivt_h[0:1, 2 * j:2 * j + 2], ivt_l[0:1, 2 * j:2 * j + 2]
            # ---- upper solve on the P lane (uses CS-era X window) -------
            sah, sal = jnp.float32(0.0), jnp.float32(0.0)
            for p in range(1, k + 1):
                th, tl = ds.mul(
                    lch[p, 1], lcl[p, 1],  # L_P[i+p, i]
                    Xh[p - 1, 0], Xl[p - 1, 0],
                )
                sah, sal = ds.add(sah, sal, th, tl)
            rbh, rbl = ds.sub(bh[0, j], bl[0, j], sah, sal)
            xh, xl = ds.mul(rbh, rbl, dh[0, 1], dl[0, 1])
            ush.append(xh.reshape(1, 1))
            usl.append(xl.reshape(1, 1))
            Xh = jnp.concatenate([xh.reshape(1, 1), Xh[:-1]], axis=0)
            Xl = jnp.concatenate([xl.reshape(1, 1), Xl[:-1]], axis=0)
            # ---- pair Takahashi column ((1,2) lane ops) -----------------
            s_h, s_l = [], []
            for q in range(1, k + 1):
                aqh = jnp.zeros((1, 2), f32)
                aql = jnp.zeros((1, 2), f32)
                for p in range(1, k + 1):
                    r_i, c_i = abs(q - p), min(p, q) - 1
                    mh = CSh[r_i:r_i + 1, 2 * c_i:2 * c_i + 2]
                    ml = CSl[r_i:r_i + 1, 2 * c_i:2 * c_i + 2]
                    th, tl = ds.mul(mh, ml, lch[p:p + 1, :], lcl[p:p + 1, :])
                    aqh, aql = ds.add(aqh, aql, th, tl)
                th, tl = ds.mul(aqh, aql, dh, dl)
                s_h.append(-th)
                s_l.append(-tl)
            wsh = jnp.zeros((1, 2), f32)
            wsl = jnp.zeros((1, 2), f32)
            for q in range(1, k + 1):
                th, tl = ds.mul(lch[q:q + 1, :], lcl[q:q + 1, :],
                                s_h[q - 1], s_l[q - 1])
                wsh, wsl = ds.add(wsh, wsl, th, tl)
            d2h, d2l = ds.mul(dh, dl, dh, dl)
            t2h, t2l = ds.mul(wsh, wsl, dh, dl)
            sjh, sjl = ds.sub(d2h, d2l, t2h, t2l)
            # assemble the (k+1, 2) column by one-hot row masks: Mosaic on
            # this platform cannot sublane-concatenate offset-carrying
            # register slices (pallas_kernels.py module docstring)
            colh = _row0(k, f32) * sjh
            coll = _row0(k, f32) * sjl
            for q in range(1, k + 1):
                eq = _rowp(q, k, f32)
                colh = colh + eq * s_h[q - 1]
                coll = coll + eq * s_l[q - 1]
            mj = msk[:, 2 * j:2 * j + 2]
            colh = colh * mj
            coll = coll * mj
            colsh.append(colh)
            colsl.append(coll)
            CSh = jnp.concatenate([colh, CSh[:, :-2]], axis=1)
            CSl = jnp.concatenate([coll, CSl[:, :-2]], axis=1)
        colsh.reverse()
        colsl.reverse()
        ush.reverse()
        usl.reverse()
        sh_ref[t] = jnp.concatenate(colsh, axis=1)
        sl_ref[t] = jnp.concatenate(colsl, axis=1)
        uh_ref[t] = jnp.concatenate(ush, axis=1)
        ul_ref[t] = jnp.concatenate(usl, axis=1)
        return (CSh, CSl, Xh, Xl)

    zc = jnp.zeros((k + 1, 2 * k), jnp.float32)
    zx = jnp.zeros((k, 1), jnp.float32)
    lax.fori_loop(0, nt, tile_body, (zc, zc, zx, zx))


# ===========================================================================
# XLA-side wrappers
# ===========================================================================


def factor_takahashi_solve_ds(kuu_band64, p_band64, b64):
    """Run sweeps A and B: returns (l_kuu, l_p, s_kuu, s_p, c0, u), where
    c0 = L_P⁻¹ b and u = P⁻¹ b, all float64."""
    k = kuu_band64.shape[0] - 1
    m = kuu_band64.shape[1]
    hi3, lo3, _, nt = _pair_tiles(kuu_band64, p_band64, m, diag_value=1.0)
    mask = _pair_mask_tiles(k, m, nt)
    bh3, bl3 = _split_tiles(b64[None, :], m)

    lh3, ll3, ivh3, ivl3, ch3, cl3 = _call2(
        _chol_pair_solve_kernel,
        (
            jax.ShapeDtypeStruct(hi3.shape, jnp.float32),
            jax.ShapeDtypeStruct(hi3.shape, jnp.float32),
            jax.ShapeDtypeStruct((nt, 1, 2 * TILE), jnp.float32),
            jax.ShapeDtypeStruct((nt, 1, 2 * TILE), jnp.float32),
            jax.ShapeDtypeStruct((nt, 1, TILE), jnp.float32),
            jax.ShapeDtypeStruct((nt, 1, TILE), jnp.float32),
        ),
        hi3, lo3, mask, bh3, bl3,
    )
    sh3, sl3, uh3, ul3 = _call2(
        _tak_pair_solve_kernel,
        (
            jax.ShapeDtypeStruct(hi3.shape, jnp.float32),
            jax.ShapeDtypeStruct(hi3.shape, jnp.float32),
            jax.ShapeDtypeStruct((nt, 1, TILE), jnp.float32),
            jax.ShapeDtypeStruct((nt, 1, TILE), jnp.float32),
        ),
        lh3[::-1], ll3[::-1], ivh3[::-1], ivl3[::-1], mask[::-1],
        ch3[::-1], cl3[::-1],
    )
    l_kuu, l_p = _from_pair_tiles(lh3, ll3, m)
    s_kuu, s_p = _from_pair_tiles(sh3[::-1], sl3[::-1], m)
    c0 = _merge_tiles(ch3, cl3, m)[0]
    u = _merge_tiles(uh3[::-1], ul3[::-1], m)[0]
    return l_kuu, l_p, s_kuu, s_p, c0, u


def _band_weights(k, m, dtype):
    """(2 − δ_{j0}) symmetric-double-count weights for lower-band storage."""
    return jnp.concatenate(
        [jnp.ones((1, m), dtype), jnp.full((k, m), 2.0, dtype)], axis=0
    )


def _outer_band(u, k):
    """O[j, i] = u_{i+j} u_i (lower-band of u uᵀ), right-padded."""
    m = u.shape[0]
    rows = [jnp.pad(u[j:] * u[: m - j], (0, j)) for j in range(k + 1)]
    return jnp.stack(rows, axis=0)


@jax.custom_vjp
def collapsed_core_ds(kuu_band, p_band, b, big_band):
    """(log|Kuu|, log|P|, bᵀP⁻¹b, tr(Kuu⁻¹ B)) — float64 API, DS execution.

    ``big_band`` is B = banded Kuf·Kufᵀ (same lower bandwidth as Kuu).
    """
    l_kuu, l_p, s_kuu, _, c0, _ = factor_takahashi_solve_ds(kuu_band, p_band, b)
    k = kuu_band.shape[0] - 1
    m = kuu_band.shape[1]
    w = _band_weights(k, m, kuu_band.dtype)
    trace = jnp.sum(w * s_kuu * big_band)
    return (
        2.0 * jnp.sum(jnp.log(l_kuu[0])),
        2.0 * jnp.sum(jnp.log(l_p[0])),
        jnp.sum(jnp.square(c0)),
        trace,
    )


def _cc_fwd(kuu_band, p_band, b, big_band):
    l_kuu, l_p, s_kuu, s_p, c0, u = factor_takahashi_solve_ds(
        kuu_band, p_band, b
    )
    k = kuu_band.shape[0] - 1
    m = kuu_band.shape[1]
    w = _band_weights(k, m, kuu_band.dtype)
    out = (
        2.0 * jnp.sum(jnp.log(l_kuu[0])),
        2.0 * jnp.sum(jnp.log(l_p[0])),
        jnp.sum(jnp.square(c0)),
        jnp.sum(w * s_kuu * big_band),
    )
    return out, (l_kuu, s_kuu, s_p, u, big_band)


def _cc_bwd(res, cots):
    from asvgp_tpu.banded import pallas_ds as pd

    l_kuu, s_kuu, s_p, u, big_band = res
    g_ldk, g_ldp, g_quad, g_tr = cots
    k = l_kuu.shape[0] - 1
    m = l_kuu.shape[1]
    w = _band_weights(k, m, l_kuu.dtype)

    # closed-form band gradients (see module docstring)
    p_bar = g_ldp * (w * s_p) - g_quad * (w * _outer_band(u, k))
    b_bar = (2.0 * g_quad) * u
    big_bar = g_tr * (w * s_kuu)

    # trace term: cot_S = g_tr · (w ∘ B) → Takahashi adjoint → Cholesky adjoint
    cot_s = g_tr * (w * big_band)
    l_bar = pd.takahashi_bwd_ds(l_kuu, s_kuu, cot_s)
    kuu_bar = pd.cholesky_band_bwd_ds(l_kuu, l_bar) + g_ldk * (w * s_kuu)
    return kuu_bar, p_bar, b_bar, big_bar


collapsed_core_ds.defvjp(_cc_fwd, _cc_bwd)
