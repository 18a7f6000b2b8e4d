"""Probe: does PjRt executable serialization work through the axon relay?

If jax.experimental.serialize_executable round-trips on this platform, the
fit-loop disk cache can store the COMPILED executable instead of jax.export
StableHLO — a warm process would skip trace AND the relay compile/load
(196 s + 358 s at eNATL), and the cold path could compile the DIRECT jit
lowering (sidestepping any export round-trip codegen differences).

Run on the TPU (relay free): python tools/exec_serialize_probe.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
from jax.experimental import serialize_executable as se  # noqa: E402


def main():
    dev = jax.devices()[0]
    print("device:", dev, flush=True)

    def f(x, y):
        def body(c, _):
            c = jnp.tanh(c @ y) + x
            return c, jnp.sum(c)
        c, s = jax.lax.scan(body, x, jnp.arange(8))
        return c, s

    x = jnp.asarray(np.random.RandomState(0).randn(256, 256))
    y = jnp.asarray(np.random.RandomState(1).randn(256, 256))

    t0 = time.time()
    lowered = jax.jit(f).lower(x, y)
    compiled = lowered.compile()
    print(f"compile: {time.time()-t0:.1f}s", flush=True)
    ref = compiled(x, y)
    ref0 = np.asarray(ref[0])

    t0 = time.time()
    payload, in_tree, out_tree = se.serialize(compiled)
    print(f"serialize: {time.time()-t0:.2f}s, {len(payload)/1e6:.2f} MB",
          flush=True)

    t0 = time.time()
    loaded = se.deserialize_and_load(payload, in_tree, out_tree)
    print(f"deserialize_and_load: {time.time()-t0:.2f}s", flush=True)

    t0 = time.time()
    out = loaded(x, y)
    got0 = np.asarray(out[0])
    print(f"exec: {time.time()-t0:.3f}s", flush=True)
    err = float(np.abs(got0 - ref0).max())
    print("max abs diff vs direct:", err, flush=True)
    print("OK" if err == 0.0 else "MISMATCH", flush=True)


if __name__ == "__main__":
    main()
