"""Tangent-fused collapsed-ELBO sweeps: value AND gradient in two kernels.

The 4-sweep value-and-grad step of pallas_ds_core.py (A, B, Takahashi
adjoint, Cholesky adjoint — measured 15.0 + 9.1 + 5.8 ms at m=10⁴) spends
half its time in the two adjoint sweeps, which exist ONLY to produce the
trace term's band cotangent −band(Kuu⁻¹ B Kuu⁻¹).  But the model never
needs that full band: Kuu is a Matérn RKHS Gram matrix

    Kuu(σ_f², ℓ) = σ_f⁻² · G(ℓ)        (spline_features.make_kuu — every
                                        coefficient is ∝ 1/variance)

so the trace term tr(Kuu⁻¹B) depends on exactly TWO scalars, and

  ∂trace/∂variance = trace / variance                      (closed form!)
  ∂trace/∂ℓ        = one directional derivative in T = ∂Kuu/∂ℓ.

That single direction is computed here as a JVP (forward tangent) fused
into the SAME two sweeps:

  kernel A′ = pair Cholesky (Kuu, P) ⊗ lower solve  ⊗  Cholesky-JVP of the
              Kuu lane in direction T (the tangent recursion rides the pair
              layout with a dead second lane — zero tangent on the P lane);
  kernel B′ = pair Takahashi ⊗ upper solve  ⊗  Takahashi-JVP consuming
              kernel A′'s tangent factor L̇ and tangent reciprocal pivots.

Every OTHER gradient of the collapsed core is already closed-form in the
sweeps' outputs (see pallas_ds_core.py docstring):

  ∂log|P|/∂P = w∘S_P,  ∂(bᵀP⁻¹b)/∂P = −w∘(uuᵀ)|band,  ∂/∂b = 2u,
  ∂log|Kuu|/∂θ = ⟨w∘S_Kuu, ∂Kuu/∂θ⟩,  ∂trace/∂B = w∘S_Kuu,

so ``collapsed_core_matern_ds`` exposes a custom VJP whose backward is
ENTIRELY elementwise — the two adjoint kernels disappear from the training
step.  The tangent recursions are mul/add-only chains hanging off the
primal values (no sqrt/divide), so they hide in the latency slack of the
latency-bound primal chain (CLAUDE.md: per-column cost is ~0.5-0.9 µs
regardless of arithmetic width).

Tangent math (per column j, primal r, rv = rsqrt(r₀), c = r·rv):

  ṙ  = Ṫ_col − Σ_p [Ẇ_p g_p + W_p ġ_p]
  e  = −½ rv² ṙ₀;   ċ = rv·ṙ + c·e;   i̇v = ṙv = rv·e

  Takahashi (primal aq, d, s_q = −aq·d, sj = d² − (Σ_q w_q s_q)·d):
  ȧq = Σ_p [ĊS·w_p + CS·ẇ_p];   ṡ_q = −(ȧq·d + aq·ḋ)
  ṡj = 2d·ḋ − (ẇs·d + ws·ḋ),  ẇs = Σ_q [ẇ_q s_q + w_q ṡ_q]

Reference parity: replaces the gradient registration of the C++
``banded_matrices`` ops (inverse_from_cholesky_band / cholesky_band VJPs,
SURVEY.md §2.2 N1) with a forward-mode formulation shaped by the model's
2-hyperparameter structure.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from asvgp_tpu.banded import ds
from asvgp_tpu.banded.pallas_ds import _merge_tiles, _split_tiles
from asvgp_tpu.banded.pallas_ds_core import _band_weights, _outer_band
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
    trace_cached,
)


# ===========================================================================
# kernel A′: pair Cholesky (Kuu, P) ⊗ lower solve ⊗ Kuu-lane Cholesky JVP
# ===========================================================================


def _chol_pair_solve_tan_kernel(
    ah_ref, al_ref, mask_ref, bh_ref, bl_ref, th_ref, tl_ref,
    oh_ref, ol_ref, ivh_ref, ivl_ref, ch_ref, cl_ref,
    dlh_ref, dll_ref, divh_ref, divl_ref,
):
    nt, kp1, _ = ah_ref.shape
    k = kp1 - 1
    f32 = jnp.float32

    def tile_body(t, carry):
        Wh, Wl, Xh, Xl, TWh, TWl = carry
        Ah, Al = ah_ref[t], al_ref[t]
        Th, Tl = th_ref[t], tl_ref[t]
        M = mask_ref[t]
        bh, bl = bh_ref[t], bl_ref[t]
        colsh, colsl = [], []
        ivsh, ivsl = [], []
        xsh, xsl = [], []
        tcolsh, tcolsl = [], []
        tivsh, tivsl = [], []
        for j in range(TILE):
            ach = Ah[:, 2 * j:2 * j + 2]
            acl = Al[:, 2 * j:2 * j + 2]
            # ---- in-stream solve accumulation (uses W BEFORE update) -----
            sah, sal = jnp.float32(0.0), jnp.float32(0.0)
            for p in range(1, k + 1):
                th_, tl_ = ds.mul(
                    Wh[p, 2 * p - 1], Wl[p, 2 * p - 1],  # L_P[i, i-p]
                    Xh[p - 1, 0], Xl[p - 1, 0],
                )
                sah, sal = ds.add(sah, sal, th_, tl_)
            rbh, rbl = ds.sub(bh[0, j], bl[0, j], sah, sal)
            # ---- pair Cholesky column -----------------------------------
            Wph = ds.pad_rows(Wh, k)
            Wpl = ds.pad_rows(Wl, k)
            sh = jnp.zeros((k + 1, 2), f32)
            sl = jnp.zeros((k + 1, 2), f32)
            for p in range(1, k + 1):
                gph = Wh[p:p + 1, 2 * (p - 1):2 * p]
                gpl = Wl[p:p + 1, 2 * (p - 1):2 * p]
                th_, tl_ = ds.mul(
                    Wph[p:p + k + 1, 2 * (p - 1):2 * p],
                    Wpl[p:p + k + 1, 2 * (p - 1):2 * p],
                    gph, gpl,
                )
                sh, sl = ds.add(sh, sl, th_, tl_)
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
            # ---- Kuu-lane Cholesky JVP (dead P lane: zero tangent) ------
            tach = Th[:, 2 * j:2 * j + 2]
            tacl = Tl[:, 2 * j:2 * j + 2]
            TWph = ds.pad_rows(TWh, k)
            TWpl = ds.pad_rows(TWl, k)
            tsh = jnp.zeros((k + 1, 2), f32)
            tsl = jnp.zeros((k + 1, 2), f32)
            for p in range(1, k + 1):
                gph = Wh[p:p + 1, 2 * (p - 1):2 * p]
                gpl = Wl[p:p + 1, 2 * (p - 1):2 * p]
                tgph = TWh[p:p + 1, 2 * (p - 1):2 * p]
                tgpl = TWl[p:p + 1, 2 * (p - 1):2 * p]
                u1h, u1l = ds.mul(
                    TWph[p:p + k + 1, 2 * (p - 1):2 * p],
                    TWpl[p:p + k + 1, 2 * (p - 1):2 * p],
                    gph, gpl,
                )
                u2h, u2l = ds.mul(
                    Wph[p:p + k + 1, 2 * (p - 1):2 * p],
                    Wpl[p:p + k + 1, 2 * (p - 1):2 * p],
                    tgph, tgpl,
                )
                tsh, tsl = ds.add(tsh, tsl, u1h, u1l)
                tsh, tsl = ds.add(tsh, tsl, u2h, u2l)
            trh, trl = ds.sub(tach, tacl, tsh, tsl)
            # e = −½ rv² ṙ₀ ;  ċ = rv·ṙ + c·e ;  i̇v = rv·e
            w2h, w2l = ds.mul(rvh, rvl, rvh, rvl)
            eh, el = ds.mul(w2h, w2l, trh[0:1, :], trl[0:1, :])
            eh, el = ds.mul_f32(eh, el, jnp.float32(-0.5))
            t1h, t1l = ds.mul(trh, trl, rvh, rvl)
            t2h, t2l = ds.mul(ch, cl, eh, el)
            tch, tcl = ds.add(t1h, t1l, t2h, t2l)
            tch = tch * mj
            tcl = tcl * mj
            tivh, tivl = ds.mul(rvh, rvl, eh, el)
            tcolsh.append(tch)
            tcolsl.append(tcl)
            tivsh.append(tivh)
            tivsl.append(tivl)
            TWh = jnp.concatenate([tch, TWh[:, :-2]], axis=1)
            TWl = jnp.concatenate([tcl, TWl[:, :-2]], axis=1)
            Wh = jnp.concatenate([ch, Wh[:, :-2]], axis=1)
            Wl = jnp.concatenate([cl, Wl[:, :-2]], axis=1)
        oh_ref[t] = jnp.concatenate(colsh, axis=1)
        ol_ref[t] = jnp.concatenate(colsl, axis=1)
        ivh_ref[t] = jnp.concatenate(ivsh, axis=1)
        ivl_ref[t] = jnp.concatenate(ivsl, axis=1)
        ch_ref[t] = jnp.concatenate(xsh, axis=1)
        cl_ref[t] = jnp.concatenate(xsl, axis=1)
        dlh_ref[t] = jnp.concatenate(tcolsh, axis=1)
        dll_ref[t] = jnp.concatenate(tcolsl, axis=1)
        divh_ref[t] = jnp.concatenate(tivsh, axis=1)
        divl_ref[t] = jnp.concatenate(tivsl, axis=1)
        return (Wh, Wl, Xh, Xl, TWh, TWl)

    zw = jnp.zeros((k + 1, 2 * k), jnp.float32)
    zx = jnp.zeros((k, 1), jnp.float32)
    lax.fori_loop(0, nt, tile_body, (zw, zw, zx, zx, zw, zw))


# ===========================================================================
# kernel B′: pair Takahashi ⊗ upper solve ⊗ Kuu-lane Takahashi JVP
# ===========================================================================


def _tak_pair_solve_tan_kernel(
    lh_ref, ll_ref, ivh_ref, ivl_ref, mask_ref, bh_ref, bl_ref,
    dlh_ref, dll_ref, divh_ref, divl_ref,
    sh_ref, sl_ref, uh_ref, ul_ref, tsh_ref, tsl_ref,
):
    nt, kp1, _ = lh_ref.shape
    k = kp1 - 1
    f32 = jnp.float32

    def tile_body(t, carry):
        CSh, CSl, Xh, Xl, TCSh, TCSl = carry
        lth, ltl = lh_ref[t], ll_ref[t]
        ivt_h, ivt_l = ivh_ref[t], ivl_ref[t]
        msk = mask_ref[t]
        bh, bl = bh_ref[t], bl_ref[t]
        dlth, dltl = dlh_ref[t], dll_ref[t]
        divt_h, divt_l = divh_ref[t], divl_ref[t]
        colsh, colsl = [], []
        ush, usl = [], []
        tcolsh, tcolsl = [], []
        for jj in range(TILE):
            j = TILE - 1 - jj
            lch, lcl = lth[:, 2 * j:2 * j + 2], ltl[:, 2 * j:2 * j + 2]
            dh, dl = ivt_h[0:1, 2 * j:2 * j + 2], ivt_l[0:1, 2 * j:2 * j + 2]
            tlch = dlth[:, 2 * j:2 * j + 2]
            tlcl = dltl[:, 2 * j:2 * j + 2]
            tdh = divt_h[0:1, 2 * j:2 * j + 2]
            tdl = divt_l[0:1, 2 * j:2 * j + 2]
            # ---- upper solve on the P lane (uses CS-era X window) -------
            sah, sal = jnp.float32(0.0), jnp.float32(0.0)
            for p in range(1, k + 1):
                th_, tl_ = ds.mul(
                    lch[p, 1], lcl[p, 1],  # L_P[i+p, i]
                    Xh[p - 1, 0], Xl[p - 1, 0],
                )
                sah, sal = ds.add(sah, sal, th_, tl_)
            rbh, rbl = ds.sub(bh[0, j], bl[0, j], sah, sal)
            xh, xl = ds.mul(rbh, rbl, dh[0, 1], dl[0, 1])
            ush.append(xh.reshape(1, 1))
            usl.append(xl.reshape(1, 1))
            Xh = jnp.concatenate([xh.reshape(1, 1), Xh[:-1]], axis=0)
            Xl = jnp.concatenate([xl.reshape(1, 1), Xl[:-1]], axis=0)
            # ---- pair Takahashi column ((1,2) lane ops) -----------------
            aqsh, aqsl = [], []
            for q in range(1, k + 1):
                aqh = jnp.zeros((1, 2), f32)
                aql = jnp.zeros((1, 2), f32)
                for p in range(1, k + 1):
                    r_i, c_i = abs(q - p), min(p, q) - 1
                    mh = CSh[r_i:r_i + 1, 2 * c_i:2 * c_i + 2]
                    ml = CSl[r_i:r_i + 1, 2 * c_i:2 * c_i + 2]
                    th_, tl_ = ds.mul(mh, ml, lch[p:p + 1, :], lcl[p:p + 1, :])
                    aqh, aql = ds.add(aqh, aql, th_, tl_)
                aqsh.append(aqh)
                aqsl.append(aql)
            s_h, s_l = [], []
            for q in range(1, k + 1):
                th_, tl_ = ds.mul(aqsh[q - 1], aqsl[q - 1], dh, dl)
                s_h.append(-th_)
                s_l.append(-tl_)
            wsh = jnp.zeros((1, 2), f32)
            wsl = jnp.zeros((1, 2), f32)
            for q in range(1, k + 1):
                th_, tl_ = ds.mul(lch[q:q + 1, :], lcl[q:q + 1, :],
                                  s_h[q - 1], s_l[q - 1])
                wsh, wsl = ds.add(wsh, wsl, th_, tl_)
            d2h, d2l = ds.mul(dh, dl, dh, dl)
            t2h, t2l = ds.mul(wsh, wsl, dh, dl)
            sjh, sjl = ds.sub(d2h, d2l, t2h, t2l)
            # ---- Kuu-lane Takahashi JVP ---------------------------------
            ts_h, ts_l = [], []
            for q in range(1, k + 1):
                taqh = jnp.zeros((1, 2), f32)
                taql = jnp.zeros((1, 2), f32)
                for p in range(1, k + 1):
                    r_i, c_i = abs(q - p), min(p, q) - 1
                    mh = CSh[r_i:r_i + 1, 2 * c_i:2 * c_i + 2]
                    ml = CSl[r_i:r_i + 1, 2 * c_i:2 * c_i + 2]
                    tmh = TCSh[r_i:r_i + 1, 2 * c_i:2 * c_i + 2]
                    tml = TCSl[r_i:r_i + 1, 2 * c_i:2 * c_i + 2]
                    u1h, u1l = ds.mul(tmh, tml,
                                      lch[p:p + 1, :], lcl[p:p + 1, :])
                    u2h, u2l = ds.mul(mh, ml,
                                      tlch[p:p + 1, :], tlcl[p:p + 1, :])
                    taqh, taql = ds.add(taqh, taql, u1h, u1l)
                    taqh, taql = ds.add(taqh, taql, u2h, u2l)
                # ṡ_q = −(ȧq·d + aq·ḋ)
                v1h, v1l = ds.mul(taqh, taql, dh, dl)
                v2h, v2l = ds.mul(aqsh[q - 1], aqsl[q - 1], tdh, tdl)
                vh, vl = ds.add(v1h, v1l, v2h, v2l)
                ts_h.append(-vh)
                ts_l.append(-vl)
            twsh = jnp.zeros((1, 2), f32)
            twsl = jnp.zeros((1, 2), f32)
            for q in range(1, k + 1):
                u1h, u1l = ds.mul(tlch[q:q + 1, :], tlcl[q:q + 1, :],
                                  s_h[q - 1], s_l[q - 1])
                u2h, u2l = ds.mul(lch[q:q + 1, :], lcl[q:q + 1, :],
                                  ts_h[q - 1], ts_l[q - 1])
                twsh, twsl = ds.add(twsh, twsl, u1h, u1l)
                twsh, twsl = ds.add(twsh, twsl, u2h, u2l)
            # ṡj = 2d·ḋ − (ẇs·d + ws·ḋ)
            dd1h, dd1l = ds.mul(dh, dl, tdh, tdl)
            dd1h, dd1l = ds.mul_f32(dd1h, dd1l, jnp.float32(2.0))
            q1h, q1l = ds.mul(twsh, twsl, dh, dl)
            q2h, q2l = ds.mul(wsh, wsl, tdh, tdl)
            qh_, ql_ = ds.add(q1h, q1l, q2h, q2l)
            tsjh, tsjl = ds.sub(dd1h, dd1l, qh_, ql_)
            # ---- assemble both columns by one-hot row masks -------------
            mj = msk[:, 2 * j:2 * j + 2]
            colh = _row0(k, f32) * sjh
            coll = _row0(k, f32) * sjl
            tcolh = _row0(k, f32) * tsjh
            tcoll = _row0(k, f32) * tsjl
            for q in range(1, k + 1):
                eq = _rowp(q, k, f32)
                colh = colh + eq * s_h[q - 1]
                coll = coll + eq * s_l[q - 1]
                tcolh = tcolh + eq * ts_h[q - 1]
                tcoll = tcoll + eq * ts_l[q - 1]
            colh = colh * mj
            coll = coll * mj
            tcolh = tcolh * mj
            tcoll = tcoll * mj
            colsh.append(colh)
            colsl.append(coll)
            tcolsh.append(tcolh)
            tcolsl.append(tcoll)
            CSh = jnp.concatenate([colh, CSh[:, :-2]], axis=1)
            CSl = jnp.concatenate([coll, CSl[:, :-2]], axis=1)
            TCSh = jnp.concatenate([tcolh, TCSh[:, :-2]], axis=1)
            TCSl = jnp.concatenate([tcoll, TCSl[:, :-2]], axis=1)
        colsh.reverse()
        colsl.reverse()
        ush.reverse()
        usl.reverse()
        tcolsh.reverse()
        tcolsl.reverse()
        sh_ref[t] = jnp.concatenate(colsh, axis=1)
        sl_ref[t] = jnp.concatenate(colsl, axis=1)
        uh_ref[t] = jnp.concatenate(ush, axis=1)
        ul_ref[t] = jnp.concatenate(usl, axis=1)
        tsh_ref[t] = jnp.concatenate(tcolsh, axis=1)
        tsl_ref[t] = jnp.concatenate(tcolsl, axis=1)
        return (CSh, CSl, Xh, Xl, TCSh, TCSl)

    zc = jnp.zeros((k + 1, 2 * k), jnp.float32)
    zx = jnp.zeros((k, 1), jnp.float32)
    lax.fori_loop(0, nt, tile_body, (zc, zc, zx, zx, zc, zc))


# ===========================================================================
# XLA-side wrapper
# ===========================================================================


@trace_cached
def factor_takahashi_solve_tan_ds(kuu_band64, tan_band64, p_band64, b64):
    """A′ + B′: primal pair sweeps with a fused Kuu-direction JVP.

    Returns (l_kuu, l_p, s_kuu, s_p, c0, u, iv_kuu, sdot_kuu) — the primal
    outputs of pallas_ds_core.factor_takahashi_solve_ds plus
    sdot_kuu = ∂_ε band((Kuu + ε·tan)⁻¹), all float64.
    """
    k = kuu_band64.shape[0] - 1
    m = kuu_band64.shape[1]
    hi3, lo3, _, nt = _pair_tiles(kuu_band64, p_band64, m, diag_value=1.0)
    th3, tl3, _, _ = _pair_tiles(
        tan_band64, jnp.zeros_like(tan_band64), m
    )
    mask = _pair_mask_tiles(k, m, nt)
    bh3, bl3 = _split_tiles(b64[None, :], m)

    pair_shape = jax.ShapeDtypeStruct(hi3.shape, jnp.float32)
    row_pair = jax.ShapeDtypeStruct((nt, 1, 2 * TILE), jnp.float32)
    row_single = jax.ShapeDtypeStruct((nt, 1, TILE), jnp.float32)

    (lh3, ll3, ivh3, ivl3, ch3, cl3,
     dlh3, dll3, divh3, divl3) = _call2(
        _chol_pair_solve_tan_kernel,
        (pair_shape, pair_shape, row_pair, row_pair, row_single, row_single,
         pair_shape, pair_shape, row_pair, row_pair),
        hi3, lo3, mask, bh3, bl3, th3, tl3,
    )
    sh3, sl3, uh3, ul3, tsh3, tsl3 = _call2(
        _tak_pair_solve_tan_kernel,
        (pair_shape, pair_shape, row_single, row_single,
         pair_shape, pair_shape),
        lh3[::-1], ll3[::-1], ivh3[::-1], ivl3[::-1], mask[::-1],
        ch3[::-1], cl3[::-1],
        dlh3[::-1], dll3[::-1], divh3[::-1], divl3[::-1],
    )
    l_kuu, l_p = _from_pair_tiles(lh3, ll3, m)
    s_kuu, s_p = _from_pair_tiles(sh3[::-1], sl3[::-1], m)
    c0 = _merge_tiles(ch3, cl3, m)[0]
    u = _merge_tiles(uh3[::-1], ul3[::-1], m)[0]
    iv_kuu = _from_pair_tiles(ivh3, ivl3, m)[0][0]
    sdot_kuu, _ = _from_pair_tiles(tsh3[::-1], tsl3[::-1], m)
    return l_kuu, l_p, s_kuu, s_p, c0, u, iv_kuu, sdot_kuu


# ===========================================================================
# collapsed core with the Matérn 2-hyperparameter structure
# ===========================================================================


def _core_outputs(l_kuu, l_p, c0, s_kuu, big_band, w):
    return (
        2.0 * jnp.sum(jnp.log(l_kuu[0])),
        2.0 * jnp.sum(jnp.log(l_p[0])),
        jnp.sum(jnp.square(c0)),
        jnp.sum(w * s_kuu * big_band),
    )


from functools import partial


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def collapsed_core_matern_ds(kuu_fn, var, ell, p_band, b, big_band):
    """(log|Kuu|, log|P|, bᵀP⁻¹b, tr(Kuu⁻¹B)) with Kuu = kuu_fn(var, ell).

    CONTRACT: ``kuu_fn`` must scale as kuu_fn(var, ell) = var⁻¹·G(ell)
    (true for every Matérn RKHS Gram matrix, spline_features.make_kuu) —
    the variance leg of the trace gradient uses the closed form
    ∂tr(Kuu⁻¹B)/∂var = trace/var.  The lengthscale leg runs as a fused
    JVP inside the two forward sweeps; the backward pass is entirely
    elementwise (no adjoint kernels).
    """
    from asvgp_tpu.banded.pallas_ds_core import factor_takahashi_solve_ds

    kuu = kuu_fn(var, ell)
    l_kuu, l_p, s_kuu, _, c0, _, _ = factor_takahashi_solve_ds(
        kuu, p_band, b
    )
    w = _band_weights(kuu.shape[0] - 1, kuu.shape[1], kuu.dtype)
    return _core_outputs(l_kuu, l_p, c0, s_kuu, big_band, w)


def _ccm_fwd(kuu_fn, var, ell, p_band, b, big_band):
    kuu, tan = jax.jvp(
        lambda l: kuu_fn(var, l), (ell,), (jnp.ones_like(ell),)
    )
    l_kuu, l_p, s_kuu, s_p, c0, u, _, sdot = factor_takahashi_solve_tan_ds(
        kuu, tan, p_band, b
    )
    k = kuu.shape[0] - 1
    m = kuu.shape[1]
    w = _band_weights(k, m, kuu.dtype)
    out = _core_outputs(l_kuu, l_p, c0, s_kuu, big_band, w)
    trace_dot = jnp.sum(w * sdot * big_band)
    res = (var, ell, s_kuu, s_p, u, big_band, out[3], trace_dot)
    return out, res


def _ccm_bwd(kuu_fn, res, cots):
    var, ell, s_kuu, s_p, u, big_band, trace, trace_dot = res
    g_ldk, g_ldp, g_quad, g_tr = cots
    k = s_kuu.shape[0] - 1
    m = s_kuu.shape[1]
    w = _band_weights(k, m, s_kuu.dtype)

    p_bar = g_ldp * (w * s_p) - g_quad * (w * _outer_band(u, k))
    b_bar = (2.0 * g_quad) * u
    big_bar = g_tr * (w * s_kuu)

    # log|Kuu| leg: ∂/∂θ = ⟨w∘S_Kuu, ∂Kuu/∂θ⟩, chained through the (cheap,
    # elementwise) band assembly by plain reverse AD
    _, kuu_vjp = jax.vjp(kuu_fn, var, ell)
    var_bar, ell_bar = kuu_vjp(g_ldk * (w * s_kuu))
    # trace leg: closed form in var (Kuu ∝ 1/var), fused JVP in ell
    var_bar = var_bar + g_tr * trace / var
    ell_bar = ell_bar + g_tr * trace_dot
    return var_bar, ell_bar, p_bar, b_bar, big_bar


collapsed_core_matern_ds.defvjp(_ccm_fwd, _ccm_bwd)
