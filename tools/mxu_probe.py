"""Probe Mosaic capabilities needed by the block-DS Pallas kernel family.

Run on the real TPU (needs the relay free):  python tools/mxu_probe.py

Checks, each in its own tiny no-grid kernel (the only pallas_call shape
this platform accepts — see banded/pallas_kernels.py docstring):
  1. f32 jnp.dot inside a kernel (MXU)
  2. bf16 x bf16 -> f32 dot (preferred_element_type) — Ozaki slices need it
  3. dynamic SUBLANE slicing of a VMEM ref inside fori_loop (pl.dynamic_slice)
  4. a ~8 MB VMEM-resident input (chunked block-band feasibility)
  5. dot of a dynamically sliced operand (slice -> dot chain)
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl


def run(name, fn):
    try:
        out = fn()
        print(f"PASS {name}: {out}")
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:300]
        print(f"FAIL {name}: {type(e).__name__}: {msg}")
        return False


def probe_f32_dot():
    def kern(a_ref, b_ref, o_ref):
        o_ref[...] = jnp.dot(a_ref[...], b_ref[...],
                             preferred_element_type=jnp.float32)

    a = jnp.asarray(np.random.RandomState(0).randn(256, 128), jnp.float32)
    b = jnp.asarray(np.random.RandomState(1).randn(128, 128), jnp.float32)
    out = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32)
    )(a, b)
    want = np.asarray(a) @ np.asarray(b)
    err = float(np.max(np.abs(np.asarray(out) - want)) / np.max(np.abs(want)))
    return f"rel err {err:.2e}"


def probe_bf16_dot():
    def kern(a_ref, b_ref, o_ref):
        o_ref[...] = jnp.dot(a_ref[...], b_ref[...],
                             preferred_element_type=jnp.float32)

    a = jnp.asarray(np.random.RandomState(0).randn(256, 128), jnp.bfloat16)
    b = jnp.asarray(np.random.RandomState(1).randn(128, 128), jnp.bfloat16)
    out = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32)
    )(a, b)
    want = np.asarray(a, np.float32) @ np.asarray(b, np.float32)
    err = float(np.max(np.abs(np.asarray(out) - want)) / np.max(np.abs(want)))
    return f"rel err {err:.2e} (bf16 rounding expected ~1e-2)"


def probe_dyn_sublane():
    def kern(a_ref, o_ref):
        def body(i, acc):
            blk = lax.dynamic_slice(a_ref[...], (i * 8, 0), (8, 128))
            return acc + blk

        o_ref[...] = lax.fori_loop(0, 4, body, jnp.zeros((8, 128), jnp.float32))

    a = jnp.asarray(np.random.RandomState(0).randn(32, 128), jnp.float32)
    out = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
    )(a)
    want = np.asarray(a).reshape(4, 8, 128).sum(0)
    err = float(np.max(np.abs(np.asarray(out) - want)))
    return f"abs err {err:.2e}"


def probe_dyn_sublane_ref():
    """Dynamic slice directly on the ref (not the loaded value)."""

    def kern(a_ref, o_ref):
        def body(i, acc):
            blk = a_ref[pl.dslice(i * 8, 8), :]
            return acc + blk

        o_ref[...] = lax.fori_loop(0, 4, body, jnp.zeros((8, 128), jnp.float32))

    a = jnp.asarray(np.random.RandomState(0).randn(32, 128), jnp.float32)
    out = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
    )(a)
    want = np.asarray(a).reshape(4, 8, 128).sum(0)
    err = float(np.max(np.abs(np.asarray(out) - want)))
    return f"abs err {err:.2e}"


def probe_big_vmem():
    def kern(a_ref, o_ref):
        o_ref[...] = jnp.sum(a_ref[...], axis=0)

    a = jnp.ones((16 * 1024, 128), jnp.float32)  # 8 MB
    out = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((128,), jnp.float32)
    )(a)
    return f"sum[0]={float(out[0])} (want 16384)"


def probe_slice_dot():
    def kern(a_ref, b_ref, o_ref):
        def body(i, acc):
            blk = a_ref[pl.dslice(i * 128, 128), :]
            return acc + jnp.dot(blk, b_ref[...],
                                 preferred_element_type=jnp.float32)

        o_ref[...] = lax.fori_loop(
            0, 4, body, jnp.zeros((128, 128), jnp.float32)
        )

    a = jnp.asarray(np.random.RandomState(0).randn(512, 128), jnp.float32)
    b = jnp.asarray(np.random.RandomState(1).randn(128, 128), jnp.float32)
    out = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32)
    )(a, b)
    want = np.asarray(a).reshape(4, 128, 128).sum(0) @ np.asarray(b)
    err = float(np.max(np.abs(np.asarray(out) - want)) / np.max(np.abs(want)))
    return f"rel err {err:.2e}"


def probe_dyn_update():
    """Dynamic-update-slice on a loop carry (sublane dim)."""

    def kern(a_ref, o_ref):
        def body(i, acc):
            blk = lax.dynamic_slice(a_ref[...], (i * 8, 0), (8, 128))
            return lax.dynamic_update_slice(acc, blk * 2.0, (i * 8, 0))

        o_ref[...] = lax.fori_loop(
            0, 4, body, jnp.zeros((32, 128), jnp.float32)
        )

    a = jnp.asarray(np.random.RandomState(0).randn(32, 128), jnp.float32)
    out = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32)
    )(a)
    err = float(np.max(np.abs(np.asarray(out) - 2 * np.asarray(a))))
    return f"abs err {err:.2e}"


def probe_dyn_store():
    """Dynamic sublane STORE to the output ref inside fori_loop (input also
    read via ref dynamic slice — value-level dynamic_slice doesn't lower)."""

    def kern(a_ref, o_ref):
        def body(i, _):
            blk = a_ref[pl.dslice(i * 8, 8), :]
            o_ref[pl.dslice(i * 8, 8), :] = blk * 3.0
            return 0

        lax.fori_loop(0, 4, body, 0)

    a = jnp.asarray(np.random.RandomState(0).randn(32, 128), jnp.float32)
    out = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32)
    )(a)
    err = float(np.max(np.abs(np.asarray(out) - 3 * np.asarray(a))))
    return f"abs err {err:.2e}"


def probe_scratch_carry():
    """VMEM scratch ref as a rolling window: dynamic-slice write then
    dynamic-slice read-back in a later fori iteration, feeding a dot."""
    from jax.experimental.pallas import tpu as pltpu

    def kern(a_ref, o_ref, w_ref):
        def body(i, acc):
            blk = a_ref[pl.dslice(i * 128, 128), :]
            w_ref[pl.dslice((i % 2) * 128, 128), :] = blk
            prev = w_ref[pl.dslice(((i + 1) % 2) * 128, 128), :]
            return acc + jnp.dot(prev, blk, preferred_element_type=jnp.float32)

        o_ref[...] = lax.fori_loop(
            1, 4, body, jnp.zeros((128, 128), jnp.float32)
        )

    def setup():
        a = jnp.asarray(np.random.RandomState(0).randn(512, 128), jnp.float32)
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((256, 128), jnp.float32)],
        )(a)
        an = np.asarray(a).reshape(4, 128, 128)
        # i=1: w empty slot 1? i starts 1: writes slot1=a1, reads slot0 (junk!)
        return out, an

    # deterministic variant: prefill via first iteration starting at 0
    def kern2(a_ref, o_ref, w_ref):
        w_ref[pl.dslice(0, 128), :] = a_ref[pl.dslice(0, 128), :]

        def body(i, acc):
            blk = a_ref[pl.dslice(i * 128, 128), :]
            prev = w_ref[pl.dslice(((i + 1) % 2) * 128, 128), :]
            w_ref[pl.dslice((i % 2) * 128, 128), :] = blk
            return acc + jnp.dot(prev, blk, preferred_element_type=jnp.float32)

        o_ref[...] = lax.fori_loop(
            1, 4, body, jnp.zeros((128, 128), jnp.float32)
        )

    a = jnp.asarray(np.random.RandomState(0).randn(512, 128), jnp.float32)
    out = pl.pallas_call(
        kern2,
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((256, 128), jnp.float32)],
    )(a)
    an = np.asarray(a).reshape(4, 128, 128)
    want = an[0] @ an[1] + an[1] @ an[2] + an[2] @ an[3]
    err = float(np.max(np.abs(np.asarray(out) - want)) / np.max(np.abs(want)))
    return f"rel err {err:.2e}"


def probe_hbm_stream():
    """Input left in ANY/HBM memory space, streamed into a VMEM scratch
    block-by-block with make_async_copy inside fori_loop."""
    from jax.experimental.pallas import tpu as pltpu

    def kern(a_ref, o_ref, buf_ref, sem):
        def body(i, acc):
            cp = pltpu.make_async_copy(
                a_ref.at[pl.dslice(i * 128, 128), :], buf_ref, sem
            )
            cp.start()
            cp.wait()
            return acc + buf_ref[...]

        o_ref[...] = lax.fori_loop(
            0, 4, body, jnp.zeros((128, 128), jnp.float32)
        )

    a = jnp.asarray(np.random.RandomState(0).randn(512, 128), jnp.float32)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        scratch_shapes=[
            pltpu.VMEM((128, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(a)
    want = np.asarray(a).reshape(4, 128, 128).sum(0)
    err = float(np.max(np.abs(np.asarray(out) - want)))
    return f"abs err {err:.2e}"


def probe_hbm_store():
    """Output left in ANY/HBM, written back block-by-block from VMEM
    scratch with make_async_copy (the reverse direction)."""
    from jax.experimental.pallas import tpu as pltpu

    def kern(a_ref, o_ref, buf_ref, sem):
        def body(i, _):
            buf_ref[...] = a_ref[pl.dslice(i * 128, 128), :] * 2.0
            cp = pltpu.make_async_copy(
                buf_ref, o_ref.at[pl.dslice(i * 128, 128), :], sem
            )
            cp.start()
            cp.wait()
            return 0

        lax.fori_loop(0, 4, body, 0)

    a = jnp.asarray(np.random.RandomState(0).randn(512, 128), jnp.float32)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((512, 128), jnp.float32),
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((128, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(a)
    err = float(np.max(np.abs(np.asarray(out) - 2 * np.asarray(a))))
    return f"abs err {err:.2e}"


def probe_transpose2d():
    """In-kernel 2-D transpose of a (128,128) f32 tile."""

    def kern(a_ref, o_ref):
        o_ref[...] = a_ref[...].T

    a = jnp.asarray(np.random.RandomState(0).randn(128, 128), jnp.float32)
    out = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32)
    )(a)
    err = float(np.max(np.abs(np.asarray(out) - np.asarray(a).T)))
    return f"abs err {err:.2e}"


def probe_bitcast_scale():
    """Power-of-two scale via int32 bit ops (frexp replacement)."""

    def kern(a_ref, o_ref):
        x = a_ref[...]
        bits = lax.bitcast_convert_type(x, jnp.int32)
        e = (bits >> 23) & 0xFF
        scale = lax.bitcast_convert_type((e + 1) << 23, jnp.float32)
        o_ref[...] = scale

    a = jnp.asarray(
        np.abs(np.random.RandomState(0).randn(8, 128)) + 0.1, jnp.float32
    )
    out = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
    )(a)
    an = np.asarray(a)
    want = 2.0 ** (np.floor(np.log2(an)) + 1)
    err = float(np.max(np.abs(np.asarray(out) / want - 1)))
    return f"rel err {err:.2e}"


def probe_round():
    def kern(a_ref, o_ref):
        o_ref[...] = jnp.round(a_ref[...] * 256.0) / 256.0

    a = jnp.asarray(np.random.RandomState(0).randn(8, 128), jnp.float32)
    out = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
    )(a)
    want = np.round(np.asarray(a) * 256.0) / 256.0
    err = float(np.max(np.abs(np.asarray(out) - want)))
    return f"abs err {err:.2e}"


def probe_lane_max():
    """Lane-dim max with keepdims + broadcast multiply back."""

    def kern(a_ref, o_ref):
        x = a_ref[...]
        m = jnp.max(jnp.abs(x), axis=-1, keepdims=True)  # (rows, 1)
        o_ref[...] = x / m

    a = jnp.asarray(np.random.RandomState(0).randn(32, 128), jnp.float32)
    out = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32)
    )(a)
    an = np.asarray(a)
    want = an / np.max(np.abs(an), axis=-1, keepdims=True)
    err = float(np.max(np.abs(np.asarray(out) - want)))
    return f"abs err {err:.2e}"


def probe_offset_broadcasts():
    """The symmetric rank-1 Cholesky column patterns, 8 static columns:
    pivot slice at lane offset c, sublane-broadcast of (1,1), lane-broadcast
    of a (rows,1) slice at offset c across 128 lanes."""

    def kern(a_ref, o_ref):
        S = a_ref[...]  # (32, 128) symmetric in [0:32, 0:32]
        cols = []
        for c in range(8):
            piv = S[c:c + 1, c:c + 1]  # (1,1) at offsets (c, c)
            r = lax.rsqrt(piv)
            lcol = S[:, c:c + 1] * r        # (32,1): sublane bcast of (1,1)
            lrow = S[c:c + 1, :] * r        # (1,128): elementwise, (1,1) bcast
            S = S - lcol * lrow             # 2-way broadcast outer product
            cols.append(lcol)
        o_ref[...] = jnp.concatenate(cols, axis=1)

    rng = np.random.RandomState(0)
    m = rng.randn(32, 32)
    sym = m @ m.T + 32 * np.eye(32)
    a = np.zeros((32, 128), np.float32)
    a[:, :32] = sym
    out = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((32, 8), jnp.float32)
    )(jnp.asarray(a))
    want = np.linalg.cholesky(sym)[:, :8]
    err = float(np.max(np.abs(np.asarray(out) - want)))
    return f"abs err {err:.2e}"


def probe_kernel_matmul_ds():
    """Full in-kernel Ozaki DS matmul: slice both DS operands into six
    8-bit bf16 slices with bitcast power-of-two row/col scales, dot on the
    MXU, recombine with DS adds.  This is the core primitive of the block
    kernels — if this passes, the design is viable."""
    import asvgp_tpu.banded.ds as ds

    def _scale_pow2(m):
        safe = jnp.where(m > 0, m, 1.0)
        bits = lax.bitcast_convert_type(safe, jnp.int32)
        e = (bits >> 23) & 0xFF
        scale = lax.bitcast_convert_type((e + 1) << 23, jnp.float32)
        inv = lax.bitcast_convert_type((253 - e) << 23, jnp.float32)
        return scale, inv

    def _slice6(h, l, axis):
        m = jnp.max(jnp.abs(h), axis=axis, keepdims=True)
        scale, inv = _scale_pow2(m)
        rh = h * inv
        rl = l * inv
        slices = []
        for i in range(6):
            p = float(2.0 ** (7 + 8 * i))
            s = jnp.round(rh * p) / p
            slices.append(s.astype(jnp.bfloat16))
            rh, rl = ds.add(rh, rl, -s, jnp.zeros_like(s))
        return slices, scale

    def kern(ah_ref, al_ref, bh_ref, bl_ref, oh_ref, ol_ref):
        asl, sa = _slice6(ah_ref[...], al_ref[...], -1)
        bsl, sb = _slice6(bh_ref[...], bl_ref[...], -2)
        ch = jnp.zeros((256, 128), jnp.float32)
        cl = jnp.zeros((256, 128), jnp.float32)
        for lev in range(7):
            for i in range(lev + 1):
                j = lev - i
                if i >= 6 or j >= 6:
                    continue
                d = jnp.dot(asl[i], bsl[j],
                            preferred_element_type=jnp.float32)
                ch, cl = ds.add(ch, cl, d, jnp.zeros_like(d))
        s = sa * sb
        oh_ref[...] = ch * s
        ol_ref[...] = cl * s

    rng = np.random.RandomState(0)
    a64 = rng.randn(256, 128) * np.exp(rng.randn(256, 1))
    b64 = rng.randn(128, 128) * np.exp(rng.randn(1, 128))
    ah = jnp.asarray(a64, jnp.float32)
    al = jnp.asarray(a64 - np.asarray(ah, np.float64), jnp.float32)
    bh = jnp.asarray(b64, jnp.float32)
    bl = jnp.asarray(b64 - np.asarray(bh, np.float64), jnp.float32)
    oh, ol = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((256, 128), jnp.float32),
            jax.ShapeDtypeStruct((256, 128), jnp.float32),
        ),
    )(ah, al, bh, bl)
    got = np.asarray(oh, np.float64) + np.asarray(ol, np.float64)
    want = a64 @ b64
    err = float(np.max(np.abs(got - want) / (np.abs(want) + 1e-30)))
    return f"rel err {err:.2e} (want ~1e-14)"


if __name__ == "__main__":
    if "--interpret" in sys.argv:  # CPU logic check only
        jax.config.update("jax_platforms", "cpu")
        _orig = pl.pallas_call

        def _interp_call(*a, **kw):
            kw.setdefault("interpret", True)
            return _orig(*a, **kw)

        pl.pallas_call = _interp_call
    print("devices:", jax.devices())
    results = {}
    for nm, fn in [
        ("f32_dot", probe_f32_dot),
        ("bf16_dot", probe_bf16_dot),
        ("dyn_sublane_value", probe_dyn_sublane),
        ("dyn_sublane_ref", probe_dyn_sublane_ref),
        ("big_vmem_8MB", probe_big_vmem),
        ("slice_then_dot", probe_slice_dot),
        ("dyn_update_carry", probe_dyn_update),
        ("dyn_store_out", probe_dyn_store),
        ("scratch_carry", probe_scratch_carry),
        ("hbm_stream", probe_hbm_stream),
        ("hbm_store", probe_hbm_store),
        ("transpose2d", probe_transpose2d),
        ("bitcast_scale", probe_bitcast_scale),
        ("round", probe_round),
        ("lane_max", probe_lane_max),
        ("offset_broadcasts", probe_offset_broadcasts),
        ("kernel_matmul_ds", probe_kernel_matmul_ds),
    ]:
        results[nm] = run(nm, fn)
    sys.exit(0 if all(results.values()) else 1)
