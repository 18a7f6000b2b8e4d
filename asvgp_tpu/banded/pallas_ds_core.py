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
    _ds_sum_rows,
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
    trace_cached,
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
            Wph = ds.pad_rows(Wh, k)
            Wpl = ds.pad_rows(Wl, k)
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
# Takahashi adjoint, vectorized (v2): (k,1)-vector column updates instead of
# the scalar chains of pallas_ds.py:_takahashi_bwd_ds_kernel, and the
# reciprocal diagonals streamed in from kernel A (no divides at all).
# Same recursion, ~35 DS ops/column instead of ~60 — the kernel is
# issue-bound, so instruction count is the cost model.
# ===========================================================================



def _mask_ge(n, thresh, dtype):
    rows = lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    return lax.convert_element_type(
        lax.ge(rows, jnp.full_like(rows, thresh)), dtype
    )


def _mask_le(n, thresh, dtype):
    rows = lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    return lax.convert_element_type(
        lax.le(rows, jnp.full_like(rows, thresh)), dtype
    )


def _mask_eq(n, thresh, dtype):
    rows = lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    return lax.convert_element_type(
        lax.eq(rows, jnp.full_like(rows, thresh)), dtype
    )


def _tak_bwd_vec_kernel(lh_ref, ll_ref, sh_ref, sl_ref, snh_ref, snl_ref,
                        cth_ref, ctl_ref, ivh_ref, ivl_ref, mask_ref,
                        oh_ref, ol_ref):
    nt, kp1, _ = lh_ref.shape
    k = kp1 - 1
    f32 = jnp.float32
    import numpy as np
    from jax.experimental.pallas import tpu as pltpu

    e0 = _row0(k, f32)

    def tile_body(t, Q):
        lth, ltl = lh_ref[t], ll_ref[t]
        sth, stl = sh_ref[t], sl_ref[t]
        snh, snl = snh_ref[t], snl_ref[t]
        cth, ctl = cth_ref[t], ctl_ref[t]
        ivh, ivl = ivh_ref[t], ivl_ref[t]
        msk = mask_ref[t]
        colsh, colsl = [], []
        for j in range(TILE):
            lch, lcl = lth[:, j:j + 1], ltl[:, j:j + 1]
            sch, scl = sth[:, j:j + 1], stl[:, j:j + 1]
            dh, dl = ivh[0, j], ivl[0, j]
            l0h, l0l = lch[0, 0], lcl[0, 0]

            # CS columns j+1..j+k (k+1, 1) each
            csh, csl = [], []
            for p in range(1, k + 1):
                if j + p < TILE:
                    csh.append(sth[:, j + p:j + p + 1])
                    csl.append(stl[:, j + p:j + p + 1])
                else:
                    csh.append(snh[:, j + p - TILE:j + p - TILE + 1])
                    csl.append(snl[:, j + p - TILE:j + p - TILE + 1])

            mj = msk[:, j:j + 1]
            q0h, q0l = Q[0]
            cbh, cbl = ds.add(cth[:, j:j + 1], ctl[:, j:j + 1], q0h, q0l)
            cbh = cbh * mj
            cbl = cbl * mj
            sjbh, sjbl = cbh[0, 0], cbl[0, 0]

            # ROW-ALIGNED layout: every per-q vector lives at row q of a
            # (k+1, 1) value (row 0 zeroed) — no sublane slices or pads,
            # only rolls + masks (Mosaic on this platform rejects sublane
            # concat/pad of offset-carrying slices).
            ne0 = 1.0 - e0
            wvh, wvl = lch * ne0, lcl * ne0      # rows 1..k: L[j+q, j]
            svh, svl = sch * ne0, scl * ne0      # rows 1..k: S[j+q, j]
            sbh_, sbl_ = cbh * ne0, cbl * ne0    # rows 1..k: s̄ seed

            # t_q = -s_q l0 (vector × scalar)
            tvh, tvl = ds.mul(svh, svl, l0h, l0l)
            tvh, tvl = -tvh, -tvl
            # ws = Σ w s
            ph_, pl_ = ds.mul(wvh, wvl, svh, svl)
            wsh, wsl = _ds_sum_rows(ph_, pl_, 1, k + 1)
            # m1 = d·sjb ; d̄ = 2 m1 − ws·sjb
            m1h, m1l = ds.mul(dh, dl, sjbh, sjbl)
            t2h, t2l = ds.mul(wsh, wsl, sjbh, sjbl)
            dbh, dbl = ds.sub(m1h + m1h, m1l + m1l, t2h, t2l)
            # w̄ = −m1 s ; s̄ −= m1 w
            wbh, wbl = ds.mul(svh, svl, m1h, m1l)
            wbh, wbl = -wbh, -wbl
            u1h, u1l = ds.mul(wvh, wvl, m1h, m1l)
            sbh_, sbl_ = ds.sub(sbh_, sbl_, u1h, u1l)
            # d̄ −= Σ s̄ t ; t̄ = −d s̄
            ph_, pl_ = ds.mul(sbh_, sbl_, tvh, tvl)
            u2h, u2l = _ds_sum_rows(ph_, pl_, 1, k + 1)
            dbh, dbl = ds.sub(dbh, dbl, u2h, u2l)
            tbh, tbl = ds.mul(sbh_, sbl_, dh, dl)
            tbh, tbl = -tbh, -tbl

            # ---- M products, vectorized ------------------------------
            # Lcol_p[q] = M[q,p] for q >= p  (= CS[q-p, p-1], row-aligned)
            lcolh, lcoll = [], []
            for p in range(1, k + 1):
                gm = _mask_ge(k + 1, np.int32(p), f32)
                ch_ = pltpu.roll(csh[p - 1], np.int32(p), 0) * gm
                cl_ = pltpu.roll(csl[p - 1], np.int32(p), 0) * gm
                lcolh.append(ch_)
                lcoll.append(cl_)
            # V1[q] = Σ_{p<=q} M[q,p] t̄_p  (roll masks zero the p > q part)
            v1h = jnp.zeros((k + 1, 1), f32)
            v1l = jnp.zeros((k + 1, 1), f32)
            for p in range(1, k + 1):
                uh_, ul_ = ds.mul(lcolh[p - 1], lcoll[p - 1],
                                  tbh[p, 0], tbl[p, 0])
                v1h, v1l = ds.add(v1h, v1l, uh_, ul_)
            # U_q = Σ_{p>q} M[q,p] t̄_p = Σ_{p>q} Lcol_q[p] t̄_p
            for q in range(1, k):
                gm = _mask_ge(k + 1, np.int32(q + 1), f32)
                uh_, ul_ = ds.mul(lcolh[q - 1] * gm, lcoll[q - 1] * gm,
                                  tbh, tbl)
                uqh, uql = _ds_sum_rows(uh_, ul_, q + 1, k + 1)
                eq = _mask_eq(k + 1, np.int32(q), f32)
                v1h, v1l = ds.add(v1h, v1l, eq * uqh, eq * uql)
            wbh, wbl = ds.add(wbh, wbl, v1h, v1l)

            # l̄0 = −d̄ d² ; col = e0·l̄0 + w̄ (already at rows 1..k)
            d2h, d2l = ds.mul(dh, dl, dh, dl)
            l0bh, l0bl = ds.mul(dbh, dbl, d2h, d2l)
            colh = e0 * (-l0bh) + wbh * ne0
            coll = e0 * (-l0bl) + wbl * ne0
            colsh.append(colh)
            colsl.append(coll)

            # ---- CS̄ columns and Q update ------------------------------
            # CS̄[:, c][r] = t̄_{c+1+r} w_{c+1} + (r>0) t̄_{c+1} w_{c+1+r}
            # (w = the L column VALUES wv, not the gradient w̄); row-aligned
            # vectors are indexed at row q, so A_c[r] = t̄[r+c+1] comes from
            # a downward circular roll by k-c.
            zc = jnp.zeros((k + 1, 1), f32)
            newQ = []
            for c in range(k):
                lim = _mask_le(k + 1, np.int32(k - 1 - c), f32)
                sh_c = np.int32(k - c)
                ath = pltpu.roll(tbh, sh_c, 0) * lim
                atl = pltpu.roll(tbl, sh_c, 0) * lim
                awh = pltpu.roll(wvh, sh_c, 0) * lim
                awl = pltpu.roll(wvl, sh_c, 0) * lim
                c1h, c1l = ds.mul(ath, atl, wvh[c + 1, 0], wvl[c + 1, 0])
                c2h, c2l = ds.mul(awh, awl, tbh[c + 1, 0], tbl[c + 1, 0])
                # row 0 would be double-counted: keep only c1's row 0
                c2h = c2h * ne0
                c2l = c2l * ne0
                cbarh, cbarl = ds.add(c1h, c1l, c2h, c2l)
                prevh, prevl = Q[c + 1] if c + 1 < k else (zc, zc)
                newQ.append(ds.add(prevh, prevl, cbarh, cbarl))
            Q = tuple(newQ)
        oh_ref[t] = jnp.concatenate(colsh, axis=1)
        ol_ref[t] = jnp.concatenate(colsl, axis=1)
        return Q

    zc0 = jnp.zeros((k + 1, 1), jnp.float32)
    lax.fori_loop(0, nt, tile_body, tuple((zc0, zc0) for _ in range(k)))


@trace_cached
def takahashi_bwd_vec_ds(l_band64, s_band64, cot64, iv64):
    """L̄ from the Takahashi adjoint; iv64 = reciprocal diagonal of L
    (from kernel A), so the kernel is divide-free."""
    k = l_band64.shape[0] - 1
    m = l_band64.shape[1]
    from asvgp_tpu.banded.pallas_ds import _split_tiles
    from asvgp_tpu.banded.pallas_kernels import _mask_tiles, _next_tiles

    lh3, ll3 = _split_tiles(l_band64, m, diag_value=1.0)
    sh3, sl3 = _split_tiles(s_band64, m, diag_value=1.0)
    ch3, cl3 = _split_tiles(cot64, m)
    ivh3, ivl3 = _split_tiles(iv64[None, :], m, diag_value=1.0)
    mask = _mask_tiles(k, m, jnp.float32)
    oh, ol = _call2(
        _tak_bwd_vec_kernel,
        (jax.ShapeDtypeStruct(lh3.shape, jnp.float32),) * 2,
        lh3, ll3, sh3, sl3,
        _next_tiles(sh3), _next_tiles(sl3),
        ch3, cl3, ivh3, ivl3, mask,
    )
    return _merge_tiles(oh, ol, m)


# ===========================================================================
# Takahashi adjoint, pair-width (dead lane): identical recursion to
# _tak_bwd_vec_kernel but operating on (k+1, 2)-wide register slices in the
# lane-interleaved pair layout, with the second lane dead (zeros).  The
# narrow (k+1, 1) ops are the vec kernel's bottleneck (measured: the pair
# Cholesky adjoint with a dead lane beats the single kernel 5.7 vs 8.0 ms);
# this applies the same trick to the Takahashi adjoint.  Every "pair
# scalar" operand is scalarized to its lane-0 value (SREG broadcast is
# lane-offset-agnostic), which avoids the Mosaic 'vector.broadcast of a
# (1, 2) slice carrying lane offset 128' rejection that blocked the
# round-1 attempt; the dead lane then just computes lane-0's numbers,
# which is harmless — the kernel contains no divides, so no inf/NaN.
# ===========================================================================


def _tak_bwd_pair_kernel(lh_ref, ll_ref, sh_ref, sl_ref, snh_ref, snl_ref,
                         cth_ref, ctl_ref, ivh_ref, ivl_ref, mask_ref,
                         oh_ref, ol_ref):
    nt, kp1, _ = lh_ref.shape
    k = kp1 - 1
    f32 = jnp.float32
    import numpy as np
    from jax.experimental.pallas import tpu as pltpu

    e0 = _row0(k, f32)

    def _sum_rows2(h, l, lo, hi):
        """Sequential DS sum of rows lo..hi-1 of a (r, 2) pair → lane-0
        scalars."""
        ah, al = h[lo:lo + 1, :], l[lo:lo + 1, :]
        for r in range(lo + 1, hi):
            ah, al = ds.add(ah, al, h[r:r + 1, :], l[r:r + 1, :])
        return ah[0, 0], al[0, 0]

    def tile_body(t, Q):
        lth, ltl = lh_ref[t], ll_ref[t]
        sth, stl = sh_ref[t], sl_ref[t]
        snh, snl = snh_ref[t], snl_ref[t]
        cth, ctl = cth_ref[t], ctl_ref[t]
        ivh, ivl = ivh_ref[t], ivl_ref[t]  # (1, TILE), single width
        msk = mask_ref[t]
        colsh, colsl = [], []
        for j in range(TILE):
            lch, lcl = lth[:, 2 * j:2 * j + 2], ltl[:, 2 * j:2 * j + 2]
            sch, scl = sth[:, 2 * j:2 * j + 2], stl[:, 2 * j:2 * j + 2]
            dh, dl = ivh[0, j], ivl[0, j]
            l0h, l0l = lch[0, 0], lcl[0, 0]

            # CS columns j+1..j+k, (k+1, 2) each
            csh, csl = [], []
            for p in range(1, k + 1):
                if j + p < TILE:
                    csh.append(sth[:, 2 * (j + p):2 * (j + p) + 2])
                    csl.append(stl[:, 2 * (j + p):2 * (j + p) + 2])
                else:
                    q = j + p - TILE
                    csh.append(snh[:, 2 * q:2 * q + 2])
                    csl.append(snl[:, 2 * q:2 * q + 2])

            mj = msk[:, 2 * j:2 * j + 2]
            q0h, q0l = Q[0]
            cbh, cbl = ds.add(cth[:, 2 * j:2 * j + 2],
                              ctl[:, 2 * j:2 * j + 2], q0h, q0l)
            cbh = cbh * mj
            cbl = cbl * mj
            sjbh, sjbl = cbh[0, 0], cbl[0, 0]

            ne0 = 1.0 - e0
            wvh, wvl = lch * ne0, lcl * ne0      # rows 1..k: L[j+q, j]
            svh, svl = sch * ne0, scl * ne0      # rows 1..k: S[j+q, j]
            sbh_, sbl_ = cbh * ne0, cbl * ne0    # rows 1..k: s̄ seed

            # t_q = -s_q l0 (vector × scalar)
            tvh, tvl = ds.mul(svh, svl, l0h, l0l)
            tvh, tvl = -tvh, -tvl
            # ws = Σ w s
            ph_, pl_ = ds.mul(wvh, wvl, svh, svl)
            wsh, wsl = _sum_rows2(ph_, pl_, 1, k + 1)
            # m1 = d·sjb ; d̄ = 2 m1 − ws·sjb   (all scalars)
            m1h, m1l = ds.mul(dh, dl, sjbh, sjbl)
            t2h, t2l = ds.mul(wsh, wsl, sjbh, sjbl)
            dbh, dbl = ds.sub(m1h + m1h, m1l + m1l, t2h, t2l)
            # w̄ = −m1 s ; s̄ −= m1 w
            wbh, wbl = ds.mul(svh, svl, m1h, m1l)
            wbh, wbl = -wbh, -wbl
            u1h, u1l = ds.mul(wvh, wvl, m1h, m1l)
            sbh_, sbl_ = ds.sub(sbh_, sbl_, u1h, u1l)
            # d̄ −= Σ s̄ t ; t̄ = −d s̄
            ph_, pl_ = ds.mul(sbh_, sbl_, tvh, tvl)
            u2h, u2l = _sum_rows2(ph_, pl_, 1, k + 1)
            dbh, dbl = ds.sub(dbh, dbl, u2h, u2l)
            tbh, tbl = ds.mul(sbh_, sbl_, dh, dl)
            tbh, tbl = -tbh, -tbl

            # ---- M products, vectorized ------------------------------
            lcolh, lcoll = [], []
            for p in range(1, k + 1):
                gm = _mask_ge(k + 1, np.int32(p), f32)
                ch_ = pltpu.roll(csh[p - 1], np.int32(p), 0) * gm
                cl_ = pltpu.roll(csl[p - 1], np.int32(p), 0) * gm
                lcolh.append(ch_)
                lcoll.append(cl_)
            # V1[q] = Σ_{p<=q} M[q,p] t̄_p
            v1h = jnp.zeros((k + 1, 2), f32)
            v1l = jnp.zeros((k + 1, 2), f32)
            for p in range(1, k + 1):
                uh_, ul_ = ds.mul(lcolh[p - 1], lcoll[p - 1],
                                  tbh[p, 0], tbl[p, 0])
                v1h, v1l = ds.add(v1h, v1l, uh_, ul_)
            # U_q = Σ_{p>q} M[q,p] t̄_p = Σ_{p>q} Lcol_q[p] t̄_p
            for q in range(1, k):
                gm = _mask_ge(k + 1, np.int32(q + 1), f32)
                uh_, ul_ = ds.mul(lcolh[q - 1] * gm, lcoll[q - 1] * gm,
                                  tbh, tbl)
                uqh, uql = _sum_rows2(uh_, ul_, q + 1, k + 1)
                eq = _mask_eq(k + 1, np.int32(q), f32)
                v1h, v1l = ds.add(v1h, v1l, eq * uqh, eq * uql)
            wbh, wbl = ds.add(wbh, wbl, v1h, v1l)

            # l̄0 = −d̄ d² ; col = e0·l̄0 + w̄
            d2h, d2l = ds.mul(dh, dl, dh, dl)
            l0bh, l0bl = ds.mul(dbh, dbl, d2h, d2l)
            colh = e0 * (-l0bh) + wbh * ne0
            coll = e0 * (-l0bl) + wbl * ne0
            colsh.append(colh)
            colsl.append(coll)

            # ---- CS̄ columns and Q update ------------------------------
            zc = jnp.zeros((k + 1, 2), f32)
            newQ = []
            for c in range(k):
                lim = _mask_le(k + 1, np.int32(k - 1 - c), f32)
                sh_c = np.int32(k - c)
                ath = pltpu.roll(tbh, sh_c, 0) * lim
                atl = pltpu.roll(tbl, sh_c, 0) * lim
                awh = pltpu.roll(wvh, sh_c, 0) * lim
                awl = pltpu.roll(wvl, sh_c, 0) * lim
                c1h, c1l = ds.mul(ath, atl, wvh[c + 1, 0], wvl[c + 1, 0])
                c2h, c2l = ds.mul(awh, awl, tbh[c + 1, 0], tbl[c + 1, 0])
                c2h = c2h * ne0
                c2l = c2l * ne0
                cbarh, cbarl = ds.add(c1h, c1l, c2h, c2l)
                prevh, prevl = Q[c + 1] if c + 1 < k else (zc, zc)
                newQ.append(ds.add(prevh, prevl, cbarh, cbarl))
            Q = tuple(newQ)
        oh_ref[t] = jnp.concatenate(colsh, axis=1)
        ol_ref[t] = jnp.concatenate(colsl, axis=1)
        return Q

    zc0 = jnp.zeros((k + 1, 2), jnp.float32)
    lax.fori_loop(0, nt, tile_body, tuple((zc0, zc0) for _ in range(k)))


@trace_cached
def takahashi_bwd_pair_ds(l_band64, s_band64, cot64, iv64):
    """Pair-width (dead-lane) L̄ from the Takahashi adjoint; iv64 =
    reciprocal diagonal of L (from kernel A), so the kernel is
    divide-free."""
    k = l_band64.shape[0] - 1
    m = l_band64.shape[1]
    from asvgp_tpu.banded.pallas_ds import _split_tiles
    from asvgp_tpu.banded.pallas_kernels import _next_tiles

    zero = jnp.zeros_like(l_band64)
    lh3, ll3, _, nt = _pair_tiles(l_band64, zero, m, diag_value=1.0)
    sh3, sl3, _, _ = _pair_tiles(s_band64, zero, m, diag_value=1.0)
    ch3, cl3, _, _ = _pair_tiles(cot64, zero, m)
    ivh3, ivl3 = _split_tiles(iv64[None, :], m, diag_value=1.0)
    mask = _pair_mask_tiles(k, m, nt)
    oh, ol = _call2(
        _tak_bwd_pair_kernel,
        (jax.ShapeDtypeStruct(lh3.shape, jnp.float32),) * 2,
        lh3, ll3, sh3, sl3,
        _next_tiles(sh3), _next_tiles(sl3),
        ch3, cl3, ivh3, ivl3, mask,
    )
    l_bar, _ = _from_pair_tiles(oh, ol, m)
    return l_bar


# ===========================================================================
# XLA-side wrappers
# ===========================================================================


@trace_cached
def factor_takahashi_solve_ds(kuu_band64, p_band64, b64):
    """Run sweeps A and B: returns (l_kuu, l_p, s_kuu, s_p, c0, u, iv_kuu),
    where c0 = L_P⁻¹ b, u = P⁻¹ b and iv_kuu = 1/diag(L_Kuu) (reused by the
    divide-free Takahashi adjoint), all float64."""
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
    iv_kuu = _from_pair_tiles(ivh3, ivl3, m)[0][0]
    return l_kuu, l_p, s_kuu, s_p, c0, u, iv_kuu


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
    l_kuu, l_p, s_kuu, _, c0, _, _ = factor_takahashi_solve_ds(
        kuu_band, p_band, b
    )
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
    l_kuu, l_p, s_kuu, s_p, c0, u, iv_kuu = factor_takahashi_solve_ds(
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
    return out, (l_kuu, s_kuu, s_p, u, big_band, iv_kuu)


def _cc_bwd(res, cots):
    from asvgp_tpu.banded import pallas_ds as pd

    l_kuu, s_kuu, s_p, u, big_band, iv_kuu = res
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
    l_bar = takahashi_bwd_vec_ds(l_kuu, s_kuu, cot_s, iv_kuu)
    # the lane-interleaved PAIR Cholesky adjoint is faster than the single
    # kernel even with a dead second lane (measured 5.7ms vs 8.0ms at m=10⁴
    # — narrow (k+1,1) register ops are the single kernel's bottleneck)
    from asvgp_tpu.banded import pallas_ds_pair as pdp

    kuu_bar, _ = pdp.cholesky_band_pair_bwd_ds(
        l_kuu, l_kuu, l_bar, jnp.zeros_like(l_bar)
    )
    kuu_bar = kuu_bar + g_ldk * (w * s_kuu)
    return kuu_bar, p_bar, b_bar, big_bar


collapsed_core_ds.defvjp(_cc_fwd, _cc_bwd)
