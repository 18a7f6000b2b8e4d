"""Pair-batched double-single Cholesky kernels.

The collapsed ELBO factorizes two independent banded matrices per step
(Kuu and P = Kuu + KufKfu/σ²).  These kernels process both in one pass by
interleaving the pair along the lane dimension (column j of the pair
occupies lanes 2j, 2j+1): same recursion-depth, twice the work per vector
op — which is nearly free, because the double-single column update is a
latency-bound dependency chain with idle vector slots.

Layout: a pair of (k+1, m) bands → (k+1, m, 2) → (k+1, 2m) interleaved →
tiles (nt, k+1, 2*TILE).  The window carry W is (k+1, 2k) with pair-columns
W[:, 2(p-1):2p] = column (i-p) of both matrices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from asvgp_tpu.banded import ds
from asvgp_tpu.banded.pallas_kernels import TILE, _call2, trace_cached
from jax.experimental import pallas as pl


def _interleave(a, b):
    """Two (k+1, m) → (k+1, 2m), column j of pair at lanes 2j, 2j+1."""
    return jnp.stack([a, b], axis=-1).reshape(a.shape[0], 2 * a.shape[1])


def _deinterleave(x):
    k1, m2 = x.shape
    y = x.reshape(k1, m2 // 2, 2)
    return y[:, :, 0], y[:, :, 1]


def _pair_tiles(a64, b64, m, diag_value=0.0):
    """Split to DS and tile the interleaved pair: returns (hi3, lo3, P, nt)."""
    nt = -(-m // TILE)
    P = nt * TILE

    def prep(x):
        h, l = ds.split_f64(x)
        return h, l

    ah, al = prep(a64)
    bh, bl = prep(b64)
    hi = _interleave(ah, bh)
    lo = _interleave(al, bl)
    if P != m:
        padw = 2 * (P - m)
        pad_hi = jnp.zeros((hi.shape[0], padw), jnp.float32)
        if diag_value != 0.0:
            pad_hi = pad_hi.at[0].set(diag_value)
        hi = jnp.concatenate([hi, pad_hi], axis=1)
        lo = jnp.concatenate([lo, jnp.zeros((lo.shape[0], padw), jnp.float32)], axis=1)
    k1 = hi.shape[0]
    hi3 = jnp.moveaxis(hi.reshape(k1, nt, 2 * TILE), 1, 0)
    lo3 = jnp.moveaxis(lo.reshape(k1, nt, 2 * TILE), 1, 0)
    return hi3, lo3, P, nt


def _pair_mask_tiles(k, m, nt):
    rows = np.arange(k + 1)[:, None]
    cols = np.arange(nt * TILE)[None, :]
    msk = (rows + cols < m).astype(np.float32)
    msk2 = np.repeat(msk, 2, axis=1)  # same mask for both pair members
    return jnp.asarray(msk2.reshape(k + 1, nt, 2 * TILE).transpose(1, 0, 2))


def _from_pair_tiles(h3, l3, m):
    nt, k1, _ = h3.shape
    hi = jnp.moveaxis(h3, 0, 1).reshape(k1, nt * 2 * TILE)[:, :2 * m]
    lo = jnp.moveaxis(l3, 0, 1).reshape(k1, nt * 2 * TILE)[:, :2 * m]
    ah, bh = _deinterleave(hi)
    al, bl = _deinterleave(lo)
    return ds.merge_f64(ah, al), ds.merge_f64(bh, bl)


# ===========================================================================
# pair Cholesky — forward
# ===========================================================================


def _chol_fwd_pair_kernel(ah_ref, al_ref, mask_ref, oh_ref, ol_ref):
    nt, kp1, _ = ah_ref.shape
    k = kp1 - 1
    f32 = jnp.float32

    def tile_body(t, carry):
        Wh, Wl = carry  # (k+1, 2k): pair-columns
        Xh, Xl = ah_ref[t], al_ref[t]
        M = mask_ref[t]
        colsh, colsl = [], []
        for j in range(TILE):
            ach = Xh[:, 2 * j:2 * j + 2]
            acl = Xl[:, 2 * j:2 * j + 2]
            Wph = ds.pad_rows(Wh, k)
            Wpl = ds.pad_rows(Wl, k)
            sh = jnp.zeros((k + 1, 2), f32)
            sl = jnp.zeros((k + 1, 2), f32)
            for p in range(1, k + 1):
                gph = Wh[p:p + 1, 2 * (p - 1):2 * p]  # (1, 2)
                gpl = Wl[p:p + 1, 2 * (p - 1):2 * p]
                th, tl = ds.mul(
                    Wph[p:p + k + 1, 2 * (p - 1):2 * p],
                    Wpl[p:p + k + 1, 2 * (p - 1):2 * p],
                    gph, gpl,
                )
                sh, sl = ds.add(sh, sl, th, tl)
            rh, rl = ds.sub(ach, acl, sh, sl)
            qh, ql = ds.sqrt(rh[0:1, :], rl[0:1, :])
            ivh, ivl = ds.recip(qh, ql)
            ch, cl = ds.mul(rh, rl, ivh, ivl)
            mj = M[:, 2 * j:2 * j + 2]
            ch = ch * mj
            cl = cl * mj
            colsh.append(ch)
            colsl.append(cl)
            Wh = jnp.concatenate([ch, Wh[:, :-2]], axis=1)
            Wl = jnp.concatenate([cl, Wl[:, :-2]], axis=1)
        oh_ref[t] = jnp.concatenate(colsh, axis=1)
        ol_ref[t] = jnp.concatenate(colsl, axis=1)
        return (Wh, Wl)

    z = jnp.zeros((k + 1, 2 * k), jnp.float32)
    lax.fori_loop(0, nt, tile_body, (z, z))


@trace_cached
def cholesky_band_pair_fwd_ds(a_band64, b_band64):
    k = a_band64.shape[0] - 1
    m = a_band64.shape[1]
    if k == 0:
        return jnp.sqrt(a_band64), jnp.sqrt(b_band64)
    hi3, lo3, P, nt = _pair_tiles(a_band64, b_band64, m, diag_value=1.0)
    mask = _pair_mask_tiles(k, m, nt)
    oh, ol = _call2(
        _chol_fwd_pair_kernel,
        (jax.ShapeDtypeStruct(hi3.shape, jnp.float32),) * 2,
        hi3, lo3, mask,
    )
    return _from_pair_tiles(oh, ol, m)


# ===========================================================================
# pair Cholesky — backward
# ===========================================================================


def _chol_bwd_pair_kernel(lh_ref, ll_ref, lph_ref, lpl_ref, cth_ref, ctl_ref,
                          mask_ref, oh_ref, ol_ref):
    nt, kp1, _ = lh_ref.shape
    k = kp1 - 1
    f32 = jnp.float32

    from asvgp_tpu.banded.pallas_kernels import _row0_mask, _rowge_mask, _rowp_mask
    from jax.experimental.pallas import tpu as pltpu

    def tile_body(t, carry):
        P = carry  # tuple of k pairs (ph, pl), each (k+1, 2)
        lth, ltl = lh_ref[t], ll_ref[t]
        lph, lpl = lph_ref[t], lpl_ref[t]
        cth, ctl = cth_ref[t], ctl_ref[t]
        msk = mask_ref[t]
        colsh, colsl = [], []
        for j in range(TILE - 1, -1, -1):
            wch, wcl = [], []
            for p in range(1, k + 1):
                if j - p >= 0:
                    wch.append(lth[:, 2 * (j - p):2 * (j - p) + 2])
                    wcl.append(ltl[:, 2 * (j - p):2 * (j - p) + 2])
                else:
                    q = TILE + j - p
                    wch.append(lph[:, 2 * q:2 * q + 2])
                    wcl.append(lpl[:, 2 * q:2 * q + 2])
            Wh = jnp.concatenate(wch, axis=1)
            Wl = jnp.concatenate(wcl, axis=1)

            lch, lcl = lth[:, 2 * j:2 * j + 2], ltl[:, 2 * j:2 * j + 2]
            mj = msk[:, 2 * j:2 * j + 2]
            p0h, p0l = P[0]
            lbh, lbl = ds.add(cth[:, 2 * j:2 * j + 2], ctl[:, 2 * j:2 * j + 2],
                              p0h, p0l)
            lbh = lbh * mj
            lbl = lbl * mj

            ivh, ivl = ds.recip(lch[0:1, :], lcl[0:1, :])
            th, tl = ds.mul(lbh, lbl, lch, lcl)
            # row-sum over rows 1..k (sequential DS adds on (1, 2) rows)
            t1h, t1l = th[1:2, :], tl[1:2, :]
            for r in range(2, k + 1):
                t1h, t1l = ds.add(t1h, t1l, th[r:r + 1, :], tl[r:r + 1, :])
            u1h, u1l = ds.mul(t1h, t1l, ivh, ivl)
            u2h, u2l = ds.sub(lbh[0:1, :], lbl[0:1, :], u1h, u1l)
            u3h, u3l = ds.mul(u2h, u2l, ivh, ivl)
            dbh, dbl = ds.mul_f32(u3h, u3l, jnp.float32(0.5))
            abh, abl = ds.mul(lbh, lbl, ivh, ivl)
            e0 = _row0_mask(k, f32)
            ne0 = 1.0 - e0
            abh = abh * ne0 + e0 * dbh
            abl = abl * ne0 + e0 * dbl
            sbh, sbl = -abh, -abl

            Wbar = []
            Wph = ds.pad_rows(Wh, k)
            Wpl = ds.pad_rows(Wl, k)
            for p in range(1, k + 1):
                gph = Wh[p:p + 1, 2 * (p - 1):2 * p]
                gpl = Wl[p:p + 1, 2 * (p - 1):2 * p]
                gmask = _rowge_mask(p, k, f32)
                rh = pltpu.roll(sbh, np.int32(p), 0) * gmask
                rl = pltpu.roll(sbl, np.int32(p), 0) * gmask
                wbh, wbl = ds.mul(rh, rl, gph, gpl)
                qh, ql = ds.mul(sbh, sbl,
                                Wph[p:p + k + 1, 2 * (p - 1):2 * p],
                                Wpl[p:p + k + 1, 2 * (p - 1):2 * p])
                gbh, gbl = qh[0:1, :], ql[0:1, :]
                for r in range(1, k + 1):
                    gbh, gbl = ds.add(gbh, gbl, qh[r:r + 1, :], ql[r:r + 1, :])
                ep = _rowp_mask(p, k, f32)
                wbh, wbl = ds.add(wbh, wbl, ep * gbh, ep * gbl)
                Wbar.append((wbh, wbl))

            colsh.append(abh)
            colsl.append(abl)
            zc = jnp.zeros((k + 1, 2), f32)
            P = tuple(
                ds.add(*(P[r + 1] if r + 1 < k else (zc, zc)), *Wbar[r])
                for r in range(k)
            )
        colsh.reverse()
        colsl.reverse()
        oh_ref[t] = jnp.concatenate(colsh, axis=1)
        ol_ref[t] = jnp.concatenate(colsl, axis=1)
        return P

    zc = jnp.zeros((k + 1, 2), jnp.float32)
    lax.fori_loop(0, nt, tile_body, tuple((zc, zc) for _ in range(k)))


@trace_cached
def cholesky_band_pair_bwd_ds(l_a64, l_b64, cot_a64, cot_b64):
    k = l_a64.shape[0] - 1
    m = l_a64.shape[1]
    if k == 0:
        return cot_a64 / (2.0 * l_a64), cot_b64 / (2.0 * l_b64)
    lh3, ll3, P, nt = _pair_tiles(l_a64, l_b64, m, diag_value=1.0)
    ch3, cl3, _, _ = _pair_tiles(cot_a64, cot_b64, m)
    zero = jnp.zeros_like(lh3[:1])
    lph3 = jnp.concatenate([zero, lh3[:-1]], axis=0)
    lpl3 = jnp.concatenate([zero, ll3[:-1]], axis=0)
    mask = _pair_mask_tiles(k, m, nt)
    oh, ol = _call2(
        _chol_bwd_pair_kernel,
        (jax.ShapeDtypeStruct(lh3.shape, jnp.float32),) * 2,
        lh3[::-1], ll3[::-1], lph3[::-1], lpl3[::-1],
        ch3[::-1], cl3[::-1], mask[::-1],
    )
    return _from_pair_tiles(oh[::-1], ol[::-1], m)


# ===========================================================================
# public custom-vjp op
# ===========================================================================


@jax.custom_vjp
def cholesky_band_pair_ds(a_band, b_band):
    """Factor two independent banded SPD matrices in one DS Pallas pass."""
    return cholesky_band_pair_fwd_ds(a_band, b_band)


def _pair_f(a, b):
    la, lb = cholesky_band_pair_fwd_ds(a, b)
    return (la, lb), (la, lb)


def _pair_b(res, cots):
    la, lb = res
    ca, cb = cots
    return cholesky_band_pair_bwd_ds(la, lb, ca, cb)


cholesky_band_pair_ds.defvjp(_pair_f, _pair_b)
