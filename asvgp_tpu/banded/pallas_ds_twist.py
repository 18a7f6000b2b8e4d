"""Twisted (two-ended) tangent-fused collapsed-ELBO sweeps — quad lanes.

The tangent-fused sweeps of pallas_ds_tan.py walk m columns serially at
~0.5-0.9 µs per column (latency/issue-bound regardless of arithmetic
width — CLAUDE.md), so the value-and-grad step at m = 10⁴ floors at
~22 ms.  This module halves the *sequential depth* instead of the work:
the twisted (BABE, "burn at both ends") factorization of banded/twisted.py
factors the matrix forward from the top AND backward from the bottom
simultaneously, meeting at a k×k dense middle Schur block.  The two
streams are independent, so they ride extra vector lanes of the SAME
kernels:

  lanes (Kuu_F, P_F, Kuu_R, P_R) — quad interleave, stride 4 — where the
  R-stream operands are the index-reversed bands (flip_band).  Same vector
  instruction count per column step as the pair kernels, HALF the steps.

  kernel A = quad Cholesky ⊗ two lower solves (P_F, P_R lanes) ⊗ quad
             Cholesky-JVP of the Kuu lanes (tangent of the ∂Kuu/∂ℓ
             direction, dead P lanes);
  mid step = XLA-side k×k dense Schur complement, Cholesky, inverse and
             solve seeds (negligible; differentiated by jax.jvp);
  kernel B = quad *seeded* Takahashi ⊗ two seeded upper solves ⊗ quad
             Takahashi-JVP, running OUTWARD from the middle on both sides.

Seeding without carry-initialization (Mosaic on this platform rejects
several offset-carrying register patterns — pallas_kernels.py docstring):
k *seed columns* are placed just past each stream's real columns.  Their
validity mask is 0, so the computed column is zeroed, and a per-column
additive seed input deposits the dense-middle values; the kernel's normal
carry pushes then prime the CS / X windows before the first real column is
processed.  The kernel body stays structurally identical to the untwisted
one — one extra vector add per column.

Exactness: the twisted quantities (log-dets, quadratic, inverse band,
solve) are algebraically identical to the single-ended ones — the f64
oracle in banded/twisted.py proves the identities to ~1e-10 and is the
validation target for these kernels.

Reference parity: same collapsed-ELBO contract as asvgp/gpr.py:49-89 (via
ops.collapsed_core_matern).  The reference's C++ banded ops are serial
single-ended scans; the twisting is the TPU-first redesign.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from asvgp_tpu.banded import ds
from asvgp_tpu.banded import twisted as tw
from asvgp_tpu.banded.pallas_kernels import (
    TILE,
    _call2,
    _row0_mask as _row0,
    _rowp_mask as _rowp,
    trace_cached,
)

def twist_applicable(k: int, m: int) -> bool:
    """Both streams need >= k real columns plus headroom for seeds.

    Whether the twisted path is *used* is decided by the scoped toggle in
    ops.py (``twist_scope`` — default ON since the round-3 TPU validation:
    tools/twist_probe.py worst rel err 4.2e-13 vs the CPU f64 oracle,
    value+grad 22.2 → 13.6 ms at m=10⁴; KERNELCHECK matern_core rows).
    This predicate only answers structural applicability."""
    if k < 1:
        return False
    h = tw.split_point(m, k)
    g = m - h - k
    return h >= 2 * k and g >= 2 * k


# ===========================================================================
# quad-lane packing (stride-4 interleave of the two streams' pairs)
# ===========================================================================


def _pad_cols(x, P, diag_value=0.0):
    c = x.shape[1]
    if c == P:
        return x
    pad = jnp.zeros((x.shape[0], P - c), x.dtype)
    if diag_value != 0.0:
        pad = pad.at[0].set(diag_value)
    return jnp.concatenate([x, pad], axis=1)


def _quad_tiles(aF, bF, aR, bR, P, diag_value=0.0):
    """Four f64 (k+1, c_i) bands → DS quad tiles (nt, k+1, 4*TILE) ×2."""
    nt = P // TILE
    his, los = [], []
    for x in (aF, bF, aR, bR):
        h, l = ds.split_f64(x)
        his.append(_pad_cols(h, P, diag_value))
        los.append(_pad_cols(l, P))
    k1 = his[0].shape[0]
    hi = jnp.stack(his, axis=-1).reshape(k1, 4 * P)
    lo = jnp.stack(los, axis=-1).reshape(k1, 4 * P)
    hi3 = jnp.moveaxis(hi.reshape(k1, nt, 4 * TILE), 1, 0)
    lo3 = jnp.moveaxis(lo.reshape(k1, nt, 4 * TILE), 1, 0)
    return hi3, lo3


def _from_quad_tiles(h3, l3):
    """DS quad tiles → four f64 (k+1, P) bands (F/R pairs un-interleaved)."""
    nt, k1, _ = h3.shape
    hi = jnp.moveaxis(h3, 0, 1).reshape(k1, nt * 4 * TILE)
    lo = jnp.moveaxis(l3, 0, 1).reshape(k1, nt * 4 * TILE)
    hi4 = hi.reshape(k1, nt * TILE, 4)
    lo4 = lo.reshape(k1, nt * TILE, 4)
    return tuple(
        ds.merge_f64(hi4[:, :, i], lo4[:, :, i]) for i in range(4)
    )


def _duo_rows(aF, aR, P):
    """Two f64 (c_i,) vectors → DS 2-lane row tiles (nt, 1, 2*TILE) ×2."""
    nt = P // TILE
    hs, ls = [], []
    for x in (aF, aR):
        h, l = ds.split_f64(x[None, :])
        hs.append(_pad_cols(h, P))
        ls.append(_pad_cols(l, P))
    hi = jnp.stack(hs, axis=-1).reshape(1, 2 * P)
    lo = jnp.stack(ls, axis=-1).reshape(1, 2 * P)
    hi3 = jnp.moveaxis(hi.reshape(1, nt, 2 * TILE), 1, 0)
    lo3 = jnp.moveaxis(lo.reshape(1, nt, 2 * TILE), 1, 0)
    return hi3, lo3


def _from_duo_rows(h3, l3):
    nt = h3.shape[0]
    hi = jnp.moveaxis(h3, 0, 1).reshape(1, nt * 2 * TILE)
    lo = jnp.moveaxis(l3, 0, 1).reshape(1, nt * 2 * TILE)
    hi2 = hi.reshape(nt * TILE, 2)
    lo2 = lo.reshape(nt * TILE, 2)
    return ds.merge_f64(hi2[:, 0], lo2[:, 0]), ds.merge_f64(
        hi2[:, 1], lo2[:, 1]
    )


def _quad_mask_tiles(k, h, g, P):
    """Per-lane validity: F lanes live for cols < h, R lanes for cols < g.
    No end-of-matrix row taper — twisted columns legitimately spill their
    tail rows into the middle block."""
    colF = (np.arange(P) < h).astype(np.float32)
    colR = (np.arange(P) < g).astype(np.float32)
    mF = np.broadcast_to(colF, (k + 1, P))
    mR = np.broadcast_to(colR, (k + 1, P))
    m4 = np.stack([mF, mF, mR, mR], axis=-1).reshape(k + 1, 4 * P)
    nt = P // TILE
    return jnp.asarray(m4.reshape(k + 1, nt, 4 * TILE).transpose(1, 0, 2))


# ===========================================================================
# kernel A: quad Cholesky ⊗ two lower solves ⊗ quad Cholesky-JVP
# ===========================================================================


def _chol_quad_solve_tan_kernel(
    ah_ref, al_ref, mask_ref, bh_ref, bl_ref, th_ref, tl_ref,
    oh_ref, ol_ref, ivh_ref, ivl_ref, ch_ref, cl_ref,
    dlh_ref, dll_ref, divh_ref, divl_ref,
):
    nt, kp1, _ = ah_ref.shape
    k = kp1 - 1
    f32 = jnp.float32

    def tile_body(t, carry):
        Wh, Wl, XFh, XFl, XRh, XRl, TWh, TWl = carry
        Ah, Al = ah_ref[t], al_ref[t]
        Th, Tl = th_ref[t], tl_ref[t]
        M = mask_ref[t]
        bh, bl = bh_ref[t], bl_ref[t]
        colsh, colsl, ivsh, ivsl = [], [], [], []
        xsh, xsl = [], []
        tcolsh, tcolsl, tivsh, tivsl = [], [], [], []
        for j in range(TILE):
            ach = Ah[:, 4 * j:4 * j + 4]
            acl = Al[:, 4 * j:4 * j + 4]
            mj = M[:, 4 * j:4 * j + 4]
            # ---- two in-stream solve accumulations (window BEFORE update)
            saFh, saFl = jnp.float32(0.0), jnp.float32(0.0)
            saRh, saRl = jnp.float32(0.0), jnp.float32(0.0)
            for p in range(1, k + 1):
                th_, tl_ = ds.mul(
                    Wh[p, 4 * (p - 1) + 1], Wl[p, 4 * (p - 1) + 1],
                    XFh[p - 1, 0], XFl[p - 1, 0],
                )
                saFh, saFl = ds.add(saFh, saFl, th_, tl_)
                th_, tl_ = ds.mul(
                    Wh[p, 4 * (p - 1) + 3], Wl[p, 4 * (p - 1) + 3],
                    XRh[p - 1, 0], XRl[p - 1, 0],
                )
                saRh, saRl = ds.add(saRh, saRl, th_, tl_)
            rbFh, rbFl = ds.sub(bh[0, 2 * j], bl[0, 2 * j], saFh, saFl)
            rbRh, rbRl = ds.sub(bh[0, 2 * j + 1], bl[0, 2 * j + 1],
                                saRh, saRl)
            # ---- quad Cholesky column -----------------------------------
            Wph = ds.pad_rows(Wh, k)
            Wpl = ds.pad_rows(Wl, k)
            sh = jnp.zeros((k + 1, 4), f32)
            sl = jnp.zeros((k + 1, 4), f32)
            for p in range(1, k + 1):
                gph = Wh[p:p + 1, 4 * (p - 1):4 * p]
                gpl = Wl[p:p + 1, 4 * (p - 1):4 * p]
                th_, tl_ = ds.mul(
                    Wph[p:p + k + 1, 4 * (p - 1):4 * p],
                    Wpl[p:p + k + 1, 4 * (p - 1):4 * p],
                    gph, gpl,
                )
                sh, sl = ds.add(sh, sl, th_, tl_)
            rh, rl = ds.sub(ach, acl, sh, sl)
            # pad-column pivot guard: unlike the single-ended kernels there
            # is no end-of-matrix row taper, so the first pad columns see
            # live window values and r could go non-positive → NaN that
            # would leak through mask·NaN into kernel B's seed columns.
            # Force padded pivots to exactly 1 before the rsqrt.
            m0 = mj[0:1, :]
            rgh = rh[0:1, :] * m0 + (1.0 - m0)
            rgl = rl[0:1, :] * m0
            rvh, rvl = ds.rsqrt(rgh, rgl)  # (1, 4)
            cch, ccl = ds.mul(rh, rl, rvh, rvl)  # row 0 = sqrt(d) exactly
            cch = cch * mj
            ccl = ccl * mj
            colsh.append(cch)
            colsl.append(ccl)
            ivsh.append(rvh)
            ivsl.append(rvl)
            # ---- finish solves with the P-lane reciprocal pivots --------
            xFh, xFl = ds.mul(rbFh, rbFl, rvh[0, 1], rvl[0, 1])
            xFh = xFh * mj[0, 1]
            xFl = xFl * mj[0, 1]
            xRh, xRl = ds.mul(rbRh, rbRl, rvh[0, 3], rvl[0, 3])
            xRh = xRh * mj[0, 3]
            xRl = xRl * mj[0, 3]
            xsh.append(jnp.concatenate(
                [xFh.reshape(1, 1), xRh.reshape(1, 1)], axis=1))
            xsl.append(jnp.concatenate(
                [xFl.reshape(1, 1), xRl.reshape(1, 1)], axis=1))
            XFh = jnp.concatenate([xFh.reshape(1, 1), XFh[:-1]], axis=0)
            XFl = jnp.concatenate([xFl.reshape(1, 1), XFl[:-1]], axis=0)
            XRh = jnp.concatenate([xRh.reshape(1, 1), XRh[:-1]], axis=0)
            XRl = jnp.concatenate([xRl.reshape(1, 1), XRl[:-1]], axis=0)
            # ---- quad Cholesky JVP (dead P lanes: zero tangent) ---------
            tach = Th[:, 4 * j:4 * j + 4]
            tacl = Tl[:, 4 * j:4 * j + 4]
            TWph = ds.pad_rows(TWh, k)
            TWpl = ds.pad_rows(TWl, k)
            tsh = jnp.zeros((k + 1, 4), f32)
            tsl = jnp.zeros((k + 1, 4), f32)
            for p in range(1, k + 1):
                gph = Wh[p:p + 1, 4 * (p - 1):4 * p]
                gpl = Wl[p:p + 1, 4 * (p - 1):4 * p]
                tgph = TWh[p:p + 1, 4 * (p - 1):4 * p]
                tgpl = TWl[p:p + 1, 4 * (p - 1):4 * p]
                u1h, u1l = ds.mul(
                    TWph[p:p + k + 1, 4 * (p - 1):4 * p],
                    TWpl[p:p + k + 1, 4 * (p - 1):4 * p],
                    gph, gpl,
                )
                u2h, u2l = ds.mul(
                    Wph[p:p + k + 1, 4 * (p - 1):4 * p],
                    Wpl[p:p + k + 1, 4 * (p - 1):4 * p],
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
            t2h, t2l = ds.mul(cch, ccl, eh, el)
            tch, tcl = ds.add(t1h, t1l, t2h, t2l)
            tch = tch * mj
            tcl = tcl * mj
            tivh, tivl = ds.mul(rvh, rvl, eh, el)
            tcolsh.append(tch)
            tcolsl.append(tcl)
            tivsh.append(tivh)
            tivsl.append(tivl)
            TWh = jnp.concatenate([tch, TWh[:, :-4]], axis=1)
            TWl = jnp.concatenate([tcl, TWl[:, :-4]], axis=1)
            Wh = jnp.concatenate([cch, Wh[:, :-4]], axis=1)
            Wl = jnp.concatenate([ccl, Wl[:, :-4]], axis=1)
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
        return (Wh, Wl, XFh, XFl, XRh, XRl, TWh, TWl)

    zw = jnp.zeros((k + 1, 4 * k), jnp.float32)
    zx = jnp.zeros((k, 1), jnp.float32)
    lax.fori_loop(0, nt, tile_body, (zw, zw, zx, zx, zx, zx, zw, zw))


# ===========================================================================
# kernel B: quad seeded Takahashi ⊗ two seeded upper solves ⊗ quad JVP
# ===========================================================================


def _tak_quad_solve_tan_kernel(
    lh_ref, ll_ref, ivh_ref, ivl_ref, mask_ref, bh_ref, bl_ref,
    dlh_ref, dll_ref, divh_ref, divl_ref,
    ssh_ref, ssl_ref, tssh_ref, tssl_ref, xsh_ref, xsl_ref,
    sh_ref, sl_ref, uh_ref, ul_ref, tsh_ref, tsl_ref,
):
    nt, kp1, _ = lh_ref.shape
    k = kp1 - 1
    f32 = jnp.float32

    def tile_body(t, carry):
        CSh, CSl, XFh, XFl, XRh, XRl, TCSh, TCSl = carry
        lth, ltl = lh_ref[t], ll_ref[t]
        ivt_h, ivt_l = ivh_ref[t], ivl_ref[t]
        msk = mask_ref[t]
        bh, bl = bh_ref[t], bl_ref[t]
        dlth, dltl = dlh_ref[t], dll_ref[t]
        divt_h, divt_l = divh_ref[t], divl_ref[t]
        ssth, sstl = ssh_ref[t], ssl_ref[t]
        tssth, tsstl = tssh_ref[t], tssl_ref[t]
        xsth, xstl = xsh_ref[t], xsl_ref[t]
        colsh, colsl = [], []
        ush, usl = [], []
        tcolsh, tcolsl = [], []
        for jj in range(TILE):
            j = TILE - 1 - jj
            lch, lcl = lth[:, 4 * j:4 * j + 4], ltl[:, 4 * j:4 * j + 4]
            dh, dl = ivt_h[0:1, 4 * j:4 * j + 4], ivt_l[0:1, 4 * j:4 * j + 4]
            tlch = dlth[:, 4 * j:4 * j + 4]
            tlcl = dltl[:, 4 * j:4 * j + 4]
            tdh = divt_h[0:1, 4 * j:4 * j + 4]
            tdl = divt_l[0:1, 4 * j:4 * j + 4]
            mj = msk[:, 4 * j:4 * j + 4]
            # ---- two seeded upper solves (CS-era X windows) -------------
            saFh, saFl = jnp.float32(0.0), jnp.float32(0.0)
            saRh, saRl = jnp.float32(0.0), jnp.float32(0.0)
            for p in range(1, k + 1):
                th_, tl_ = ds.mul(lch[p, 1], lcl[p, 1],
                                  XFh[p - 1, 0], XFl[p - 1, 0])
                saFh, saFl = ds.add(saFh, saFl, th_, tl_)
                th_, tl_ = ds.mul(lch[p, 3], lcl[p, 3],
                                  XRh[p - 1, 0], XRl[p - 1, 0])
                saRh, saRl = ds.add(saRh, saRl, th_, tl_)
            rbFh, rbFl = ds.sub(bh[0, 2 * j], bl[0, 2 * j], saFh, saFl)
            rbRh, rbRl = ds.sub(bh[0, 2 * j + 1], bl[0, 2 * j + 1],
                                saRh, saRl)
            xFh, xFl = ds.mul(rbFh, rbFl, dh[0, 1], dl[0, 1])
            xFh = xFh * mj[0, 1] + xsth[0, 2 * j]
            xFl = xFl * mj[0, 1] + xstl[0, 2 * j]
            xRh, xRl = ds.mul(rbRh, rbRl, dh[0, 3], dl[0, 3])
            xRh = xRh * mj[0, 3] + xsth[0, 2 * j + 1]
            xRl = xRl * mj[0, 3] + xstl[0, 2 * j + 1]
            ush.append(jnp.concatenate(
                [xFh.reshape(1, 1), xRh.reshape(1, 1)], axis=1))
            usl.append(jnp.concatenate(
                [xFl.reshape(1, 1), xRl.reshape(1, 1)], axis=1))
            XFh = jnp.concatenate([xFh.reshape(1, 1), XFh[:-1]], axis=0)
            XFl = jnp.concatenate([xFl.reshape(1, 1), XFl[:-1]], axis=0)
            XRh = jnp.concatenate([xRh.reshape(1, 1), XRh[:-1]], axis=0)
            XRl = jnp.concatenate([xRl.reshape(1, 1), XRl[:-1]], axis=0)
            # ---- quad Takahashi column ----------------------------------
            aqsh, aqsl = [], []
            for q in range(1, k + 1):
                aqh = jnp.zeros((1, 4), f32)
                aql = jnp.zeros((1, 4), f32)
                for p in range(1, k + 1):
                    r_i, c_i = abs(q - p), min(p, q) - 1
                    mh = CSh[r_i:r_i + 1, 4 * c_i:4 * c_i + 4]
                    ml = CSl[r_i:r_i + 1, 4 * c_i:4 * c_i + 4]
                    th_, tl_ = ds.mul(mh, ml,
                                      lch[p:p + 1, :], lcl[p:p + 1, :])
                    aqh, aql = ds.add(aqh, aql, th_, tl_)
                aqsh.append(aqh)
                aqsl.append(aql)
            s_h, s_l = [], []
            for q in range(1, k + 1):
                th_, tl_ = ds.mul(aqsh[q - 1], aqsl[q - 1], dh, dl)
                s_h.append(-th_)
                s_l.append(-tl_)
            wsh = jnp.zeros((1, 4), f32)
            wsl = jnp.zeros((1, 4), f32)
            for q in range(1, k + 1):
                th_, tl_ = ds.mul(lch[q:q + 1, :], lcl[q:q + 1, :],
                                  s_h[q - 1], s_l[q - 1])
                wsh, wsl = ds.add(wsh, wsl, th_, tl_)
            d2h, d2l = ds.mul(dh, dl, dh, dl)
            t2h, t2l = ds.mul(wsh, wsl, dh, dl)
            sjh, sjl = ds.sub(d2h, d2l, t2h, t2l)
            # ---- quad Takahashi JVP -------------------------------------
            ts_h, ts_l = [], []
            for q in range(1, k + 1):
                taqh = jnp.zeros((1, 4), f32)
                taql = jnp.zeros((1, 4), f32)
                for p in range(1, k + 1):
                    r_i, c_i = abs(q - p), min(p, q) - 1
                    mh = CSh[r_i:r_i + 1, 4 * c_i:4 * c_i + 4]
                    ml = CSl[r_i:r_i + 1, 4 * c_i:4 * c_i + 4]
                    tmh = TCSh[r_i:r_i + 1, 4 * c_i:4 * c_i + 4]
                    tml = TCSl[r_i:r_i + 1, 4 * c_i:4 * c_i + 4]
                    u1h, u1l = ds.mul(tmh, tml,
                                      lch[p:p + 1, :], lcl[p:p + 1, :])
                    u2h, u2l = ds.mul(mh, ml,
                                      tlch[p:p + 1, :], tlcl[p:p + 1, :])
                    taqh, taql = ds.add(taqh, taql, u1h, u1l)
                    taqh, taql = ds.add(taqh, taql, u2h, u2l)
                v1h, v1l = ds.mul(taqh, taql, dh, dl)
                v2h, v2l = ds.mul(aqsh[q - 1], aqsl[q - 1], tdh, tdl)
                vh, vl = ds.add(v1h, v1l, v2h, v2l)
                ts_h.append(-vh)
                ts_l.append(-vl)
            twsh = jnp.zeros((1, 4), f32)
            twsl = jnp.zeros((1, 4), f32)
            for q in range(1, k + 1):
                u1h, u1l = ds.mul(tlch[q:q + 1, :], tlcl[q:q + 1, :],
                                  s_h[q - 1], s_l[q - 1])
                u2h, u2l = ds.mul(lch[q:q + 1, :], lcl[q:q + 1, :],
                                  ts_h[q - 1], ts_l[q - 1])
                twsh, twsl = ds.add(twsh, twsl, u1h, u1l)
                twsh, twsl = ds.add(twsh, twsl, u2h, u2l)
            dd1h, dd1l = ds.mul(dh, dl, tdh, tdl)
            dd1h, dd1l = ds.mul_f32(dd1h, dd1l, jnp.float32(2.0))
            q1h, q1l = ds.mul(twsh, twsl, dh, dl)
            q2h, q2l = ds.mul(wsh, wsl, tdh, tdl)
            qh_, ql_ = ds.add(q1h, q1l, q2h, q2l)
            tsjh, tsjl = ds.sub(dd1h, dd1l, qh_, ql_)
            # ---- assemble, mask, inject seeds ---------------------------
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
            colh = colh * mj + ssth[:, 4 * j:4 * j + 4]
            coll = coll * mj + sstl[:, 4 * j:4 * j + 4]
            tcolh = tcolh * mj + tssth[:, 4 * j:4 * j + 4]
            tcoll = tcoll * mj + tsstl[:, 4 * j:4 * j + 4]
            colsh.append(colh)
            colsl.append(coll)
            tcolsh.append(tcolh)
            tcolsl.append(tcoll)
            CSh = jnp.concatenate([colh, CSh[:, :-4]], axis=1)
            CSl = jnp.concatenate([coll, CSl[:, :-4]], axis=1)
            TCSh = jnp.concatenate([tcolh, TCSh[:, :-4]], axis=1)
            TCSl = jnp.concatenate([tcoll, TCSl[:, :-4]], axis=1)
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
        return (CSh, CSl, XFh, XFl, XRh, XRl, TCSh, TCSl)

    zc = jnp.zeros((k + 1, 4 * k), jnp.float32)
    zx = jnp.zeros((k, 1), jnp.float32)
    lax.fori_loop(0, nt, tile_body, (zc, zc, zx, zx, zx, zx, zc, zc))


# ===========================================================================
# XLA-side mid step (k×k dense; differentiated by jax.jvp)
# ===========================================================================


def _kxk_mm_t(a, b):
    """a @ b.T for k×k without touching the (emulated-f64) MXU path."""
    return jnp.sum(a[:, None, :] * b[None, :, :], axis=-1)


def _mid_logdet_inv(mid_band, tail_f, tail_r):
    """(log|S22|, S22⁻¹, chol(S22)) from the dense middle block and the two
    streams' k-column factor tails (twisted.py:156-180 semantics)."""
    from jax.scipy.linalg import cho_solve

    l21f = tw._lower_tail_dense(tail_f)
    l21r = tw._lower_tail_dense(tail_r)
    s = mid_band - _kxk_mm_t(l21f, l21f) - _kxk_mm_t(l21r, l21r)[::-1, ::-1]
    c = jnp.linalg.cholesky(s)
    ld = 2.0 * jnp.sum(jnp.log(jnp.diagonal(c)))
    z = cho_solve((c, True), jnp.eye(s.shape[0], dtype=s.dtype))
    return ld, z, c


def _seed_cols(z_mid):
    """(k+1, k) seed-column block: column c = S[h+c+r, h+c] window."""
    return tw._seed_from_mid(z_mid).T


def _place(P, k, h, g, valF, valR, dtype):
    """Zero (k+1, P) arrays with the F seed block at cols [h, h+k) and the
    R seed block at cols [g, g+k)."""
    zF = jnp.zeros((k + 1, P), dtype).at[:, h:h + k].set(valF)
    zR = jnp.zeros((k + 1, P), dtype).at[:, g:g + k].set(valR)
    return zF, zR


# ===========================================================================
# XLA-side wrapper
# ===========================================================================


@trace_cached
def factor_takahashi_solve_tan_twist(kuu_band64, tan_band64, p_band64, b64):
    """Twisted A + mid + B: same contract as
    pallas_ds_tan.factor_takahashi_solve_tan_ds but with the log-dets and
    quadratic returned as scalars (they are three-part sums here, not
    factor-diagonal folds):

    Returns (ld_kuu, ld_p, quad, s_kuu, s_p, u, sdot_kuu), all float64.
    """
    k = kuu_band64.shape[0] - 1
    m = kuu_band64.shape[1]
    h = tw.split_point(m, k)
    g = m - h - k
    P = TILE * (-(-(max(h, g) + k) // TILE))
    dt = kuu_band64.dtype

    fb_kuu = tw.flip_band(kuu_band64)
    fb_p = tw.flip_band(p_band64)
    fb_tan = tw.flip_band(tan_band64)
    bf = b64[::-1]

    ah3, al3 = _quad_tiles(kuu_band64[:, :h], p_band64[:, :h],
                           fb_kuu[:, :g], fb_p[:, :g], P, diag_value=1.0)
    zF = jnp.zeros((k + 1, h), dt)
    zR = jnp.zeros((k + 1, g), dt)
    th3, tl3 = _quad_tiles(tan_band64[:, :h], zF, fb_tan[:, :g], zR, P)
    mask = _quad_mask_tiles(k, h, g, P)
    bh3, bl3 = _duo_rows(b64[:h], bf[:g], P)

    quad_shape = jax.ShapeDtypeStruct(ah3.shape, jnp.float32)
    row_quad = jax.ShapeDtypeStruct((P // TILE, 1, 4 * TILE), jnp.float32)
    row_duo = jax.ShapeDtypeStruct((P // TILE, 1, 2 * TILE), jnp.float32)

    (lh3, ll3, ivh3, ivl3, ch3, cl3,
     dlh3, dll3, divh3, divl3) = _call2(
        _chol_quad_solve_tan_kernel,
        (quad_shape, quad_shape, row_quad, row_quad, row_duo, row_duo,
         quad_shape, quad_shape, row_quad, row_quad),
        ah3, al3, mask, bh3, bl3, th3, tl3,
    )

    lF_kuu, lF_p, lR_kuu, lR_p = _from_quad_tiles(lh3, ll3)
    dlF_kuu, _, dlR_kuu, _ = _from_quad_tiles(dlh3, dll3)
    y1, y3 = _from_duo_rows(ch3, cl3)
    y1, y3 = y1[:h], y3[:g]

    # ---- mid step: Schur complements, seeds, logdet/quad pieces ---------
    kuu_mid = tw._middle_dense(kuu_band64, h)
    tan_mid = tw._middle_dense(tan_band64, h)
    p_mid = tw._middle_dense(p_band64, h)
    (ld_kuu_mid, z_kuu, _), (_, zdot_kuu, _) = jax.jvp(
        _mid_logdet_inv,
        (kuu_mid, lF_kuu[:, h - k:h], lR_kuu[:, g - k:g]),
        (tan_mid, dlF_kuu[:, h - k:h], dlR_kuu[:, g - k:g]),
    )
    ld_p_mid, z_p, c_p = _mid_logdet_inv(
        p_mid, lF_p[:, h - k:h], lR_p[:, g - k:g]
    )
    l21f_p = tw._lower_tail_dense(lF_p[:, h - k:h])
    l21r_p = tw._lower_tail_dense(lR_p[:, g - k:g])
    b2c = (
        b64[h:h + k]
        - jnp.sum(l21f_p * y1[h - k:][None, :], axis=-1)
        - jnp.sum(l21r_p * y3[g - k:][None, :], axis=-1)[::-1]
    )
    from jax.scipy.linalg import cho_solve

    x2 = cho_solve((c_p, True), b2c)
    quad = jnp.sum(y1 * y1) + jnp.sum(y3 * y3) + jnp.dot(b2c, x2)
    ld_kuu = (
        2.0 * jnp.sum(jnp.log(lF_kuu[0, :h]))
        + 2.0 * jnp.sum(jnp.log(lR_kuu[0, :g]))
        + ld_kuu_mid
    )
    ld_p = (
        2.0 * jnp.sum(jnp.log(lF_p[0, :h]))
        + 2.0 * jnp.sum(jnp.log(lR_p[0, :g]))
        + ld_p_mid
    )

    # ---- seed arrays for kernel B ---------------------------------------
    zkf = _seed_cols(z_kuu)
    zkr = _seed_cols(z_kuu[::-1, ::-1])
    zpf = _seed_cols(z_p)
    zpr = _seed_cols(z_p[::-1, ::-1])
    tkf = _seed_cols(zdot_kuu)
    tkr = _seed_cols(zdot_kuu[::-1, ::-1])
    sKF, sKR = _place(P, k, h, g, zkf, zkr, dt)
    sPF, sPR = _place(P, k, h, g, zpf, zpr, dt)
    tKF, tKR = _place(P, k, h, g, tkf, tkr, dt)
    zP = jnp.zeros((k + 1, P), dt)
    ssh3, ssl3 = _quad_tiles(sKF, sPF, sKR, sPR, P)
    tssh3, tssl3 = _quad_tiles(tKF, zP, tKR, zP, P)
    xF = jnp.zeros((P,), dt).at[h:h + k].set(x2)
    xR = jnp.zeros((P,), dt).at[g:g + k].set(x2[::-1])
    xsh3, xsl3 = _duo_rows(xF, xR, P)

    sh3, sl3, uh3, ul3, tsh3, tsl3 = _call2(
        _tak_quad_solve_tan_kernel,
        (quad_shape, quad_shape, row_duo, row_duo, quad_shape, quad_shape),
        lh3[::-1], ll3[::-1], ivh3[::-1], ivl3[::-1], mask[::-1],
        ch3[::-1], cl3[::-1],
        dlh3[::-1], dll3[::-1], divh3[::-1], divl3[::-1],
        ssh3[::-1], ssl3[::-1], tssh3[::-1], tssl3[::-1],
        xsh3[::-1], xsl3[::-1],
    )
    sF_kuu, sF_p, sR_kuu, sR_p = _from_quad_tiles(sh3[::-1], sl3[::-1])
    tsF_kuu, _, tsR_kuu, _ = _from_quad_tiles(tsh3[::-1], tsl3[::-1])
    x1, x3 = _from_duo_rows(uh3[::-1], ul3[::-1])
    u = jnp.concatenate([x1[:h], x2, x3[:g][::-1]])

    s_kuu = tw._assemble_band(sF_kuu[:, :h], sR_kuu[:, :g], z_kuu, m)
    s_p = tw._assemble_band(sF_p[:, :h], sR_p[:, :g], z_p, m)
    sdot_kuu = tw._assemble_band(
        tsF_kuu[:, :h], tsR_kuu[:, :g], zdot_kuu, m
    )
    return ld_kuu, ld_p, quad, s_kuu, s_p, u, sdot_kuu


# ===========================================================================
# collapsed core (Matérn structure) on the twisted sweeps
# ===========================================================================


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def collapsed_core_matern_twist_ds(kuu_fn, var, ell, p_band, b, big_band):
    """Twisted-sweep collapsed core; same contract (and backward) as
    pallas_ds_tan.collapsed_core_matern_ds."""
    from asvgp_tpu.banded.pallas_ds_core import (
        _band_weights,
        factor_takahashi_solve_ds,
    )

    # value-only path: the untwisted primal sweeps (rarely hit — training
    # always runs value_and_grad, which uses _fwd below)
    kuu = kuu_fn(var, ell)
    l_kuu, l_p, s_kuu, _, c0, _, _ = factor_takahashi_solve_ds(
        kuu, p_band, b
    )
    w = _band_weights(kuu.shape[0] - 1, kuu.shape[1], kuu.dtype)
    return (
        2.0 * jnp.sum(jnp.log(l_kuu[0])),
        2.0 * jnp.sum(jnp.log(l_p[0])),
        jnp.sum(jnp.square(c0)),
        jnp.sum(w * s_kuu * big_band),
    )


def _ccmt_fwd(kuu_fn, var, ell, p_band, b, big_band):
    from asvgp_tpu.banded.pallas_ds_core import _band_weights

    kuu, tan = jax.jvp(
        lambda l: kuu_fn(var, l), (ell,), (jnp.ones_like(ell),)
    )
    ld_kuu, ld_p, quad, s_kuu, s_p, u, sdot = (
        factor_takahashi_solve_tan_twist(kuu, tan, p_band, b)
    )
    k = kuu.shape[0] - 1
    m = kuu.shape[1]
    w = _band_weights(k, m, kuu.dtype)
    trace = jnp.sum(w * s_kuu * big_band)
    trace_dot = jnp.sum(w * sdot * big_band)
    out = (ld_kuu, ld_p, quad, trace)
    res = (var, ell, s_kuu, s_p, u, big_band, trace, trace_dot)
    return out, res


def _ccmt_bwd(kuu_fn, res, cots):
    # identical residual layout → reuse the untwisted elementwise backward
    from asvgp_tpu.banded.pallas_ds_tan import _ccm_bwd

    return _ccm_bwd(kuu_fn, res, cots)


collapsed_core_matern_twist_ds.defvjp(_ccmt_fwd, _ccmt_bwd)
