"""Dense-block double-single Pallas kernel: fused Cholesky ⊗ tri-inverse.

The Kronecker ELBO's block-banded Cholesky (banded/block_ds.py) is
latency-bound in the per-block-column DIAGONAL sweep: at eNATL shape
(nb = 100 block columns of B = 100) the XLA-level DS rank-1 sweep costs
~5.8 µs per inner column (each column is a handful of *dependent* XLA ops
dispatched at full-graph latency), i.e. ~580 µs per block — ~58 ms of the
Kron step is just this sweep.  The 1-D banded kernels (pallas_ds.py) show
the same recursion runs at ~0.5-0.9 µs per column once the whole sweep
lives inside ONE Mosaic program.

This module brings that to dense blocks: one single-program kernel
factorizes a (B, B) SPD block AND produces the triangular inverse of the
factor in the same B-step chain (the fused recursion of
block_ds._fused_sweep_ds, reference contract asvgp/gpr.py:292-296 via
block_ds), with every value a double-single (hi, lo) float32 pair
(banded/ds.py, ~2⁻⁴⁸ relative precision — this platform's emulated f64 is
unreliable in recursions, see pallas_kernels.py).

Kernel architecture (the platform rules of pallas_kernels.py apply: no
grid, no dynamic lane indexing, no sub-block VMEM stores):

- B ≤ 128: the block occupies ONE lane tile; rows ride the sublanes.
- The B-column sweep is statically unrolled; all state (Schur complement,
  inverse, output accumulators) lives in registers/VMEM values, never
  re-loaded.
- Column/row emission is ``jnp.where`` against an iota lane/row selector
  (a sub-block VMEM store per column would be illegal; a concat of 100
  (R, 1) registers would blow the register file).
- The sweep is garbage-tolerant: rows/lanes left of the pivot turn to
  junk (possibly inf/NaN) but provably never flow back into the valid
  region, and emissions are masked with ``where`` (NOT multiply — junk
  may be non-finite).  The inverse stream only ever consumes masked
  (junk-free) operands, exactly like block_ds._fused_sweep_ds.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from asvgp_tpu.banded import ds
from asvgp_tpu.banded.pallas_kernels import TILE, _call2, trace_cached


def _make_kernel(B: int):
    def kernel(mh_ref, ml_ref, lh_ref, ll_ref, th_ref, tl_ref):
        R, C = mh_ref.shape
        f32 = jnp.float32
        Mh, Ml = mh_ref[:], ml_ref[:]
        rowI = lax.broadcasted_iota(jnp.int32, (R, C), 0)
        laneI = lax.broadcasted_iota(jnp.int32, (R, C), 1)
        rows1 = lax.broadcasted_iota(jnp.int32, (R, 1), 0)
        zero = jnp.zeros((R, C), f32)
        # T starts as the identity; its rows become L^{-1} rows as the
        # factor columns appear (one shared B-step chain)
        Th = jnp.where(rowI == laneI, f32(1.0), f32(0.0))
        Tl = zero
        Lh, Ll, Xh, Xl = zero, zero, zero, zero
        for c in range(B):
            rh, rl = ds.rsqrt(Mh[c, c], Ml[c, c])
            colh, coll = ds.mul(Mh[:, c:c + 1], Ml[:, c:c + 1], rh, rl)
            keep = rows1 >= c
            colzh = jnp.where(keep, colh, f32(0.0))
            colzl = jnp.where(keep, coll, f32(0.0))
            sel = laneI == c
            Lh = jnp.where(sel, colzh, Lh)
            Ll = jnp.where(sel, colzl, Ll)
            # inverse row c = T[c, :] / L[c, c]; T row c is junk-free
            xh, xl = ds.mul(Th[c:c + 1, :], Tl[c:c + 1, :], rh, rl)
            rsel = rowI == c
            Xh = jnp.where(rsel, xh, Xh)
            Xl = jnp.where(rsel, xl, Xl)
            if c < B - 1:
                # Schur rank-1 update; the row-side operand is the scaled
                # pivot ROW (equals the column transposed, exactly, by
                # elementwise symmetry of the DS ops)
                rwh, rwl = ds.mul(Mh[c:c + 1, :], Ml[c:c + 1, :], rh, rl)
                ph, pl = ds.mul(colh, coll, rwh, rwl)
                Mh, Ml = ds.sub(Mh, Ml, ph, pl)
                # inverse update must see exact zeros above the pivot or
                # junk would corrupt already-emitted rows
                qh, ql = ds.mul(colzh, colzl, xh, xl)
                Th, Tl = ds.sub(Th, Tl, qh, ql)
        lh_ref[:] = Lh
        ll_ref[:] = Ll
        th_ref[:] = Xh
        tl_ref[:] = Xl

    return kernel


@trace_cached
def chol_inv_dense_ds(mh, ml):
    """Fused dense DS Cholesky + triangular inverse of one SPD block.

    mh, ml: (B, B) float32 double-single pair, symmetric SPD, B ≤ 128.
    Returns (lh, ll, ivh, ivl): L = chol(M) and L^{-1}, both exactly
    lower-triangular (strict upper = 0.0).
    """
    B = mh.shape[0]
    if B > TILE:
        raise ValueError(f"dense-block kernel requires B <= {TILE}, got {B}")
    R = -(-B // 8) * 8
    # zero padding is safe: the sweep never reads pad columns' pivots, and
    # pad rows of every read column are zero (they stay zero under the
    # rank-1 updates, contributing nothing)
    mh_p = jnp.pad(mh, ((0, R - B), (0, TILE - B)))
    ml_p = jnp.pad(ml, ((0, R - B), (0, TILE - B)))
    out = _call2(
        _make_kernel(B),
        (jax.ShapeDtypeStruct((R, TILE), jnp.float32),) * 4,
        mh_p, ml_p,
    )
    lh, ll, ivh, ivl = (o[:B, :B] for o in out)
    return lh, ll, ivh, ivl
