"""Double-single (f64-equivalent) Pallas TPU kernels for the banded core.

Same kernel architecture as banded/pallas_kernels.py (single program,
fori over 128-column tiles, register window carries), but every value is a
double-single (hi, lo) float32 pair (banded/ds.py), giving ~2⁻⁴⁸ relative
precision.  This is the TPU path for float64 model code: the public ops
split f64 → (hi, lo) on the XLA side, run the DS kernel, and merge back —
so ``cholesky_band(f64)`` is transparently correct on TPU even though
Pallas has no float64 and this platform's f64 emulation is unreliable in
the recursions (see pallas_kernels.py module docstring).

Needed because the spline RKHS Gram matrices are genuinely ill-conditioned
(κ ~ (ℓ/δ)^{2ν+1} can exceed 1e12 at m = 10⁴), where plain float32
recursions diverge.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from asvgp_tpu.banded import ds
from asvgp_tpu.banded.pallas_kernels import (
    TILE,
    _call2,
    _from_tiles,
    _mask_tiles,
    _next_tiles,
    _prev_tiles,
    _row0_mask,
    _rowge_mask,
    _rowp_mask,
    _to_tiles,
    trace_cached,
)
from jax.experimental import pallas as pl


def _split_tiles(x64, m, diag_value=0.0):
    h, l = ds.split_f64(x64)
    return _to_tiles(h, m, diag_value), _to_tiles(l, m)


def _merge_tiles(h3, l3, m):
    return ds.merge_f64(_from_tiles(h3, m), _from_tiles(l3, m))


def _ds_sum_rows(h, l, lo_row, hi_row):
    """Sequential DS sum of rows lo_row..hi_row-1 of a (r, 1) pair."""
    ah, al = h[lo_row, 0], l[lo_row, 0]
    for r in range(lo_row + 1, hi_row):
        ah, al = ds.add(ah, al, h[r, 0], l[r, 0])
    return ah, al


# ===========================================================================
# banded Cholesky — forward (DS)
# ===========================================================================


def _chol_fwd_ds_kernel(ah_ref, al_ref, mask_ref, oh_ref, ol_ref):
    nt, kp1, _ = ah_ref.shape
    k = kp1 - 1
    f32 = jnp.float32

    def tile_body(t, carry):
        Wh, Wl = carry  # (k+1, k) pairs: column p-1 = L column (i-p)
        Xh, Xl = ah_ref[t], al_ref[t]
        M = mask_ref[t]
        colsh, colsl = [], []
        for j in range(TILE):
            ach, acl = Xh[:, j:j + 1], Xl[:, j:j + 1]
            Wph = ds.pad_rows(Wh, k)
            Wpl = ds.pad_rows(Wl, k)
            sh = jnp.zeros((k + 1, 1), f32)
            sl = jnp.zeros((k + 1, 1), f32)
            for p in range(1, k + 1):
                gph, gpl = Wh[p, p - 1], Wl[p, p - 1]
                th, tl = ds.mul(
                    Wph[p:p + k + 1, p - 1:p], Wpl[p:p + k + 1, p - 1:p], gph, gpl
                )
                sh, sl = ds.add(sh, sl, th, tl)
            # d = a0 - s0; col = (a - s) / sqrt(d)   (row 0 = sqrt(d))
            rh, rl = ds.sub(ach, acl, sh, sl)
            dh, dl = rh[0, 0], rl[0, 0]
            qh, ql = ds.sqrt(dh, dl)
            ivh, ivl = ds.recip(qh, ql)
            ch, cl = ds.mul(rh, rl, ivh, ivl)
            mj = M[:, j:j + 1]
            ch = ch * mj
            cl = cl * mj
            colsh.append(ch)
            colsl.append(cl)
            Wh = jnp.concatenate([ch, Wh[:, :-1]], axis=1)
            Wl = jnp.concatenate([cl, Wl[:, :-1]], axis=1)
        oh_ref[t] = jnp.concatenate(colsh, axis=1)
        ol_ref[t] = jnp.concatenate(colsl, axis=1)
        return (Wh, Wl)

    z = jnp.zeros((k + 1, k), f32)
    lax.fori_loop(0, nt, tile_body, (z, z))


@trace_cached
def cholesky_band_fwd_ds(a_band64):
    k = a_band64.shape[0] - 1
    m = a_band64.shape[1]
    if k == 0:
        return jnp.sqrt(a_band64)
    ah3, al3 = _split_tiles(a_band64, m, diag_value=1.0)
    mask = _mask_tiles(k, m, jnp.float32)
    oh, ol = _call2(
        _chol_fwd_ds_kernel,
        (jax.ShapeDtypeStruct(ah3.shape, jnp.float32),) * 2,
        ah3, al3, mask,
    )
    return _merge_tiles(oh, ol, m)


# ===========================================================================
# banded Cholesky — backward (DS)
# ===========================================================================


def _chol_bwd_ds_kernel(lh_ref, ll_ref, lph_ref, lpl_ref, cth_ref, ctl_ref,
                        mask_ref, oh_ref, ol_ref):
    nt, kp1, _ = lh_ref.shape
    k = kp1 - 1
    f32 = jnp.float32

    def tile_body(t, carry):
        P = carry  # tuple of k pairs (ph, pl), each (k+1, 1)
        lth, ltl = lh_ref[t], ll_ref[t]
        lph, lpl = lph_ref[t], lpl_ref[t]
        cth, ctl = cth_ref[t], ctl_ref[t]
        msk = mask_ref[t]
        colsh, colsl = [], []
        for j in range(TILE - 1, -1, -1):
            wch, wcl = [], []
            for p in range(1, k + 1):
                if j - p >= 0:
                    wch.append(lth[:, j - p:j - p + 1])
                    wcl.append(ltl[:, j - p:j - p + 1])
                else:
                    wch.append(lph[:, TILE + j - p:TILE + j - p + 1])
                    wcl.append(lpl[:, TILE + j - p:TILE + j - p + 1])
            Wh = jnp.concatenate(wch, axis=1)
            Wl = jnp.concatenate(wcl, axis=1)

            lch, lcl = lth[:, j:j + 1], ltl[:, j:j + 1]
            mj = msk[:, j:j + 1]
            p0h, p0l = P[0]
            lbh, lbl = ds.add(cth[:, j:j + 1], ctl[:, j:j + 1], p0h, p0l)
            lbh = lbh * mj
            lbl = lbl * mj

            ivh, ivl = ds.recip(lch[0, 0], lcl[0, 0])
            # t1 = Σ_{r>=1} l̄_r l_r
            th, tl = ds.mul(lbh, lbl, lch, lcl)
            t1h, t1l = _ds_sum_rows(th, tl, 1, k + 1)
            # d̄ = (l̄_0 - t1 * inv) * 0.5 * inv
            u1h, u1l = ds.mul(t1h, t1l, ivh, ivl)
            u2h, u2l = ds.sub(lbh[0, 0], lbl[0, 0], u1h, u1l)
            u3h, u3l = ds.mul(u2h, u2l, ivh, ivl)
            dbh, dbl = ds.mul_f32(u3h, u3l, jnp.float32(0.5))
            # ā = blend(row0: d̄, rows>=1: l̄ * inv)
            abh, abl = ds.mul(lbh, lbl, ivh, ivl)
            e0 = _row0_mask(k, f32)
            ne0 = 1.0 - e0
            abh = abh * ne0 + e0 * dbh
            abl = abl * ne0 + e0 * dbl
            sbh, sbl = -abh, -abl

            Wbar = []
            Wph = ds.pad_rows(Wh, k)
            Wpl = ds.pad_rows(Wl, k)
            from jax.experimental.pallas import tpu as pltpu

            for p in range(1, k + 1):
                gph, gpl = Wh[p, p - 1], Wl[p, p - 1]
                gmask = _rowge_mask(p, k, f32)
                rh = pltpu.roll(sbh, np.int32(p), 0) * gmask
                rl = pltpu.roll(sbl, np.int32(p), 0) * gmask
                wbh, wbl = ds.mul(rh, rl, gph, gpl)
                # ḡ_p = Σ_q s̄_q Wpad[q+p]
                qh, ql = ds.mul(sbh, sbl, Wph[p:p + k + 1, p - 1:p],
                                Wpl[p:p + k + 1, p - 1:p])
                gbh, gbl = _ds_sum_rows(qh, ql, 0, k + 1)
                ep = _rowp_mask(p, k, f32)
                wbh, wbl = ds.add(wbh, wbl, ep * gbh, ep * gbl)
                Wbar.append((wbh, wbl))

            colsh.append(abh)
            colsl.append(abl)
            zc = jnp.zeros((k + 1, 1), f32)
            P = tuple(
                ds.add(*(P[r + 1] if r + 1 < k else (zc, zc)), *Wbar[r])
                for r in range(k)
            )
        colsh.reverse()
        colsl.reverse()
        oh_ref[t] = jnp.concatenate(colsh, axis=1)
        ol_ref[t] = jnp.concatenate(colsl, axis=1)
        return P

    zc = jnp.zeros((k + 1, 1), jnp.float32)
    lax.fori_loop(0, nt, tile_body, tuple((zc, zc) for _ in range(k)))


@trace_cached
def cholesky_band_bwd_ds(l_band64, cot64):
    k = l_band64.shape[0] - 1
    m = l_band64.shape[1]
    if k == 0:
        return cot64 / (2.0 * l_band64)
    lh3, ll3 = _split_tiles(l_band64, m, diag_value=1.0)
    ch3, cl3 = _split_tiles(cot64, m)
    mask = _mask_tiles(k, m, jnp.float32)
    oh, ol = _call2(
        _chol_bwd_ds_kernel,
        (jax.ShapeDtypeStruct(lh3.shape, jnp.float32),) * 2,
        lh3[::-1], ll3[::-1],
        _prev_tiles(lh3)[::-1], _prev_tiles(ll3)[::-1],
        ch3[::-1], cl3[::-1],
        mask[::-1],
    )
    return _merge_tiles(oh[::-1], ol[::-1], m)


# ===========================================================================
# Takahashi — forward (DS)
# ===========================================================================


def _takahashi_fwd_ds_kernel(lh_ref, ll_ref, mask_ref, oh_ref, ol_ref):
    nt, kp1, _ = lh_ref.shape
    k = kp1 - 1
    f32 = jnp.float32

    def tile_body(t, carry):
        CSh, CSl = carry  # (k+1, k) pairs: column p-1 = S column (j+p)
        lth, ltl = lh_ref[t], ll_ref[t]
        msk = mask_ref[t]
        colsh, colsl = [], []
        for j in range(TILE - 1, -1, -1):
            lch, lcl = lth[:, j:j + 1], ltl[:, j:j + 1]
            dh, dl = ds.recip(lch[0, 0], lcl[0, 0])
            s_h, s_l = [], []
            for q in range(1, k + 1):
                ah, al = jnp.float32(0.0), jnp.float32(0.0)
                for p in range(1, k + 1):
                    mh = CSh[abs(q - p), min(p, q) - 1]
                    ml = CSl[abs(q - p), min(p, q) - 1]
                    th, tl = ds.mul(mh, ml, lch[p, 0], lcl[p, 0])
                    ah, al = ds.add(ah, al, th, tl)
                # s_q = -d * acc
                th, tl = ds.mul(ah, al, dh, dl)
                s_h.append((-th).reshape(1, 1))
                s_l.append((-tl).reshape(1, 1))
            # sjj = d² - d Σ_q w_q s_q
            ah, al = jnp.float32(0.0), jnp.float32(0.0)
            for q in range(1, k + 1):
                th, tl = ds.mul(lch[q, 0], lcl[q, 0], s_h[q - 1][0, 0], s_l[q - 1][0, 0])
                ah, al = ds.add(ah, al, th, tl)
            d2h, d2l = ds.mul(dh, dl, dh, dl)
            t2h, t2l = ds.mul(ah, al, dh, dl)
            sjh, sjl = ds.sub(d2h, d2l, t2h, t2l)
            colh = jnp.concatenate([sjh.reshape(1, 1)] + s_h, axis=0)
            coll = jnp.concatenate([sjl.reshape(1, 1)] + s_l, axis=0)
            mj = msk[:, j:j + 1]
            colh = colh * mj
            coll = coll * mj
            colsh.append(colh)
            colsl.append(coll)
            CSh = jnp.concatenate([colh, CSh[:, :-1]], axis=1)
            CSl = jnp.concatenate([coll, CSl[:, :-1]], axis=1)
        colsh.reverse()
        colsl.reverse()
        oh_ref[t] = jnp.concatenate(colsh, axis=1)
        ol_ref[t] = jnp.concatenate(colsl, axis=1)
        return (CSh, CSl)

    z = jnp.zeros((k + 1, k), jnp.float32)
    lax.fori_loop(0, nt, tile_body, (z, z))


@trace_cached
def takahashi_fwd_ds(l_band64):
    k = l_band64.shape[0] - 1
    m = l_band64.shape[1]
    if k == 0:
        return 1.0 / (l_band64 * l_band64)
    lh3, ll3 = _split_tiles(l_band64, m, diag_value=1.0)
    mask = _mask_tiles(k, m, jnp.float32)
    oh, ol = _call2(
        _takahashi_fwd_ds_kernel,
        (jax.ShapeDtypeStruct(lh3.shape, jnp.float32),) * 2,
        lh3[::-1], ll3[::-1], mask[::-1],
    )
    return _merge_tiles(oh[::-1], ol[::-1], m)


# ===========================================================================
# triangular solves (DS)
# ===========================================================================


def _solve_lower_ds_kernel(gh_ref, gl_ref, dh_ref, dl_ref, bh_ref, bl_ref,
                           oh_ref, ol_ref):
    nt, k, _ = gh_ref.shape
    f32 = jnp.float32

    def tile_body(t, carry):
        Xh, Xl = carry  # (k, 1): row p-1 = x_{i-p}
        gh, gl = gh_ref[t], gl_ref[t]
        dh, dl = dh_ref[t], dl_ref[t]
        bh, bl = bh_ref[t], bl_ref[t]
        oh, ol = [], []
        for j in range(TILE):
            ph, pll = ds.mul(gh[:, j:j + 1], gl[:, j:j + 1], Xh, Xl)
            ah, al = _ds_sum_rows(ph, pll, 0, k)
            rh, rl = ds.sub(bh[0, j], bl[0, j], ah, al)
            xh, xl = ds.div(rh, rl, dh[0, j], dl[0, j])
            oh.append(xh.reshape(1, 1))
            ol.append(xl.reshape(1, 1))
            Xh = jnp.concatenate([xh.reshape(1, 1), Xh[:-1]], axis=0)
            Xl = jnp.concatenate([xl.reshape(1, 1), Xl[:-1]], axis=0)
        oh_ref[t] = jnp.concatenate(oh, axis=1)
        ol_ref[t] = jnp.concatenate(ol, axis=1)
        return (Xh, Xl)

    z = jnp.zeros((k, 1), jnp.float32)
    lax.fori_loop(0, nt, tile_body, (z, z))


@trace_cached
def solve_lower_ds(l_band64, b64):
    k = l_band64.shape[0] - 1
    m = l_band64.shape[1]
    if k == 0:
        return b64 / l_band64[0]
    from asvgp_tpu.banded.layout import shift_cols

    g64 = jnp.stack(
        [shift_cols(l_band64[p], -p) for p in range(1, k + 1)], axis=0
    )
    gh3, gl3 = _split_tiles(g64, m)
    dh3, dl3 = _split_tiles(l_band64[0][None, :], m, diag_value=1.0)
    bh3, bl3 = _split_tiles(b64[None, :], m)
    nt = gh3.shape[0]
    oh, ol = _call2(
        _solve_lower_ds_kernel,
        (jax.ShapeDtypeStruct((nt, 1, TILE), jnp.float32),) * 2,
        gh3, gl3, dh3, dl3, bh3, bl3,
    )
    return _merge_tiles(oh, ol, m)[0]


def _solve_upper_t_ds_kernel(lh_ref, ll_ref, bh_ref, bl_ref, oh_ref, ol_ref):
    nt, kp1, _ = lh_ref.shape
    k = kp1 - 1

    def tile_body(t, carry):
        Xh, Xl = carry  # (k, 1): row p-1 = x_{i+p}
        lth, ltl = lh_ref[t], ll_ref[t]
        bh, bl = bh_ref[t], bl_ref[t]
        oh, ol = [], []
        for j in range(TILE - 1, -1, -1):
            lch, lcl = lth[:, j:j + 1], ltl[:, j:j + 1]
            ph, pll = ds.mul(lch[1:], lcl[1:], Xh, Xl)
            ah, al = _ds_sum_rows(ph, pll, 0, k)
            rh, rl = ds.sub(bh[0, j], bl[0, j], ah, al)
            xh, xl = ds.div(rh, rl, lch[0, 0], lcl[0, 0])
            oh.append(xh.reshape(1, 1))
            ol.append(xl.reshape(1, 1))
            Xh = jnp.concatenate([xh.reshape(1, 1), Xh[:-1]], axis=0)
            Xl = jnp.concatenate([xl.reshape(1, 1), Xl[:-1]], axis=0)
        oh.reverse()
        ol.reverse()
        oh_ref[t] = jnp.concatenate(oh, axis=1)
        ol_ref[t] = jnp.concatenate(ol, axis=1)
        return (Xh, Xl)

    z = jnp.zeros((k, 1), jnp.float32)
    lax.fori_loop(0, nt, tile_body, (z, z))


@trace_cached
def solve_upper_t_ds(l_band64, b64):
    k = l_band64.shape[0] - 1
    m = l_band64.shape[1]
    if k == 0:
        return b64 / l_band64[0]
    lh3, ll3 = _split_tiles(l_band64, m, diag_value=1.0)
    bh3, bl3 = _split_tiles(b64[None, :], m)
    nt = lh3.shape[0]
    oh, ol = _call2(
        _solve_upper_t_ds_kernel,
        (jax.ShapeDtypeStruct((nt, 1, TILE), jnp.float32),) * 2,
        lh3[::-1], ll3[::-1], bh3[::-1], bl3[::-1],
    )
    return _merge_tiles(oh[::-1], ol[::-1], m)[0]


# ===========================================================================
# public custom-vjp ops (f64 API, DS execution)
# ===========================================================================


@jax.custom_vjp
def cholesky_band_ds(a_band):
    """Banded Cholesky, float64 API, double-single Pallas execution."""
    return cholesky_band_fwd_ds(a_band)


def _chol_ds_f(a):
    l = cholesky_band_fwd_ds(a)
    return l, l


def _chol_ds_b(l, cot):
    return (cholesky_band_bwd_ds(l, cot),)


cholesky_band_ds.defvjp(_chol_ds_f, _chol_ds_b)


# ===========================================================================
# Takahashi — backward (DS; the adjoint shares the forward's instability)
# ===========================================================================


def _takahashi_bwd_ds_kernel(lh_ref, ll_ref, sh_ref, sl_ref, snh_ref, snl_ref,
                             cth_ref, ctl_ref, mask_ref, oh_ref, ol_ref):
    nt, kp1, _ = lh_ref.shape
    k = kp1 - 1
    f32 = jnp.float32

    def tile_body(t, carry):
        Q = carry  # tuple of k pairs (qh, ql), each (k+1, 1)
        lth, ltl = lh_ref[t], ll_ref[t]
        sth, stl = sh_ref[t], sl_ref[t]
        snh, snl = snh_ref[t], snl_ref[t]
        cth, ctl = cth_ref[t], ctl_ref[t]
        msk = mask_ref[t]
        colsh, colsl = [], []
        for j in range(TILE):
            lch, lcl = lth[:, j:j + 1], ltl[:, j:j + 1]
            sch, scl = sth[:, j:j + 1], stl[:, j:j + 1]
            l0h, l0l = lch[0, 0], lcl[0, 0]
            dh, dl = ds.recip(l0h, l0l)

            # CS columns (S columns j+1..j+k)
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

            # scalars per q: w_q = L[j+q, j], s_q = S[j+q, j], t_q = -s_q l0
            w = [(lch[q, 0], lcl[q, 0]) for q in range(1, k + 1)]
            s_off = [(sch[q, 0], scl[q, 0]) for q in range(1, k + 1)]
            t_vec = []
            for q in range(k):
                th_, tl_ = ds.mul(s_off[q][0], s_off[q][1], l0h, l0l)
                t_vec.append((-th_, -tl_))
            sbar = [(cbh[q, 0], cbl[q, 0]) for q in range(1, k + 1)]

            # sjj = d² - d Σ w_q s_q
            wsh, wsl = jnp.float32(0.0), jnp.float32(0.0)
            for q in range(k):
                th_, tl_ = ds.mul(w[q][0], w[q][1], s_off[q][0], s_off[q][1])
                wsh, wsl = ds.add(wsh, wsl, th_, tl_)
            # d̄ = 2 d sjj̄ - sjj̄ Σ w s
            t1h, t1l = ds.mul(dh, dl, sjbh, sjbl)
            t1h, t1l = ds.mul_f32(t1h, t1l, jnp.float32(2.0))
            t2h, t2l = ds.mul(wsh, wsl, sjbh, sjbl)
            dbh, dbl = ds.sub(t1h, t1l, t2h, t2l)
            # w̄_q = -d sjj̄ s_q ;  s̄_q -= d sjj̄ w_q
            dsjh, dsjl = ds.mul(dh, dl, sjbh, sjbl)
            wbar = []
            for q in range(k):
                th_, tl_ = ds.mul(dsjh, dsjl, s_off[q][0], s_off[q][1])
                wbar.append((-th_, -tl_))
                th_, tl_ = ds.mul(dsjh, dsjl, w[q][0], w[q][1])
                sbar[q] = ds.sub(sbar[q][0], sbar[q][1], th_, tl_)
            # d̄ -= Σ s̄_q t_q ;  t̄_q = -d s̄_q
            tbar = []
            for q in range(k):
                th_, tl_ = ds.mul(sbar[q][0], sbar[q][1], t_vec[q][0], t_vec[q][1])
                dbh, dbl = ds.sub(dbh, dbl, th_, tl_)
                th_, tl_ = ds.mul(dh, dl, sbar[q][0], sbar[q][1])
                tbar.append((-th_, -tl_))
            # t_q = Σ_p M[q,p] w_p:  w̄_p += Σ_q t̄_q M[q,p];
            # CS̄[|q-p|, min-1] += t̄_q w_p
            csbar = [
                [(jnp.float32(0.0), jnp.float32(0.0)) for _ in range(k)]
                for _ in range(k + 1)
            ]
            for q in range(1, k + 1):
                for p in range(1, k + 1):
                    r, c = abs(q - p), min(p, q) - 1
                    mh, ml = csh[c][r, 0], csl[c][r, 0]
                    th_, tl_ = ds.mul(tbar[q - 1][0], tbar[q - 1][1], mh, ml)
                    wbar[p - 1] = ds.add(wbar[p - 1][0], wbar[p - 1][1], th_, tl_)
                    th_, tl_ = ds.mul(
                        tbar[q - 1][0], tbar[q - 1][1], w[p - 1][0], w[p - 1][1]
                    )
                    csbar[r][c] = ds.add(csbar[r][c][0], csbar[r][c][1], th_, tl_)
            # l̄_0 = -d̄ d²
            d2h, d2l = ds.mul(dh, dl, dh, dl)
            l0bh, l0bl = ds.mul(dbh, dbl, d2h, d2l)
            l0bh, l0bl = -l0bh, -l0bl
            colh = jnp.concatenate(
                [l0bh.reshape(1, 1)] + [wbar[q][0].reshape(1, 1) for q in range(k)],
                axis=0,
            )
            coll = jnp.concatenate(
                [l0bl.reshape(1, 1)] + [wbar[q][1].reshape(1, 1) for q in range(k)],
                axis=0,
            )
            colsh.append(colh)
            colsl.append(coll)

            csbar_cols = [
                (
                    jnp.concatenate(
                        [csbar[r][c][0].reshape(1, 1) for r in range(k + 1)], axis=0
                    ),
                    jnp.concatenate(
                        [csbar[r][c][1].reshape(1, 1) for r in range(k + 1)], axis=0
                    ),
                )
                for c in range(k)
            ]
            zc = jnp.zeros((k + 1, 1), f32)
            Q = tuple(
                ds.add(*(Q[r + 1] if r + 1 < k else (zc, zc)), *csbar_cols[r])
                for r in range(k)
            )
        oh_ref[t] = jnp.concatenate(colsh, axis=1)
        ol_ref[t] = jnp.concatenate(colsl, axis=1)
        return Q

    zc = jnp.zeros((k + 1, 1), jnp.float32)
    lax.fori_loop(0, nt, tile_body, tuple((zc, zc) for _ in range(k)))


@trace_cached
def takahashi_bwd_ds(l_band64, s_band64, cot64):
    k = l_band64.shape[0] - 1
    m = l_band64.shape[1]
    if k == 0:
        return -2.0 * cot64 / (l_band64 ** 3)
    lh3, ll3 = _split_tiles(l_band64, m, diag_value=1.0)
    sh3, sl3 = _split_tiles(s_band64, m, diag_value=1.0)
    ch3, cl3 = _split_tiles(cot64, m)
    mask = _mask_tiles(k, m, jnp.float32)
    oh, ol = _call2(
        _takahashi_bwd_ds_kernel,
        (jax.ShapeDtypeStruct(lh3.shape, jnp.float32),) * 2,
        lh3, ll3, sh3, sl3,
        _next_tiles(sh3), _next_tiles(sl3),
        ch3, cl3, mask,
    )
    return _merge_tiles(oh, ol, m)


@jax.custom_vjp
def takahashi_inverse_band_ds(l_band):
    """Takahashi banded sparse-inverse, float64 API, DS execution."""
    return takahashi_fwd_ds(l_band)


def _tak_ds_f(l_band):
    s = takahashi_fwd_ds(l_band)
    return s, (l_band, s)


def _tak_ds_b(res, cot):
    l_band, s = res
    return (takahashi_bwd_ds(l_band, s, cot),)


takahashi_inverse_band_ds.defvjp(_tak_ds_f, _tak_ds_b)


@jax.custom_vjp
def solve_lower_band_ds(l_band, b):
    return solve_lower_ds(l_band, b)


def _sl_ds_f(l_band, b):
    x = solve_lower_ds(l_band, b)
    return x, (l_band, x)


def _sl_ds_b(res, cot):
    l_band, x = res
    bbar = solve_upper_t_ds(l_band, cot)
    k = l_band.shape[0] - 1
    rows = [-(jnp.pad(bbar[p:], (0, p)) * x) for p in range(k + 1)]
    return jnp.stack(rows, axis=0), bbar


solve_lower_band_ds.defvjp(_sl_ds_f, _sl_ds_b)


@jax.custom_vjp
def solve_upper_band_transpose_ds(l_band, b):
    return solve_upper_t_ds(l_band, b)


def _su_ds_f(l_band, b):
    x = solve_upper_t_ds(l_band, b)
    return x, (l_band, x)


def _su_ds_b(res, cot):
    l_band, x = res
    bbar = solve_lower_ds(l_band, cot)
    k = l_band.shape[0] - 1
    rows = [-(jnp.pad(x[p:], (0, p)) * bbar) for p in range(k + 1)]
    return jnp.stack(rows, axis=0), bbar


solve_upper_band_transpose_ds.defvjp(_su_ds_f, _su_ds_b)
