"""Probe: does PjRt executable serialization work through the axon relay?

If jax.experimental.serialize_executable round-trips on this platform, the
fit-loop disk cache can store the COMPILED executable instead of jax.export
StableHLO — a warm process would skip trace AND the relay compile/load
(196 s + 358 s at eNATL), and the cold path could compile the DIRECT jit
lowering (sidestepping any export round-trip codegen differences).

Three-phase, to test CROSS-PROCESS reuse (the case that matters):
  python tools/exec_serialize_probe.py           # in-process round-trip
  python tools/exec_serialize_probe.py --save    # compile + save payload
  python tools/exec_serialize_probe.py --load    # new process: load + compare

Result (round 4, TPU v5 lite0): in-process AND cross-process both exact
(max abs diff 0.0 vs the direct executable; payload 3.5 MB; load 0.1 s vs
compile 3.7 s).  The round-3 "MISMATCH" was NaN != NaN in a badly seeded
probe — the direct executable itself produced NaNs, and the deserialized
one reproduced them bit-exactly.

OPEN (round 4): the deserialized eNATL fit loop EXECUTES ~2x slower than
the freshly compiled one (35.6 vs 17.7 s; EXPORT_AB pjrt2 42.5 vs 15.0).
``--steps N`` scales the probe body so repeated-exec timing (printed for
every variant) can discriminate executable-vs-dispatch in a healthy relay
window: python tools/exec_serialize_probe.py --steps 2000

RESULT (2026-08-21, TPU v5 lite0, --steps 2000, relay grant 1287 s):
direct exec 0.191/0.184/0.185 s vs loaded-inproc 0.225/0.185/0.184 s —
the deserialized executable is EXECUTION-IDENTICAL (first call +40 ms of
dispatch warmup only; results bit-exact).  The 2x eNATL discrepancy is
therefore not a property of loaded executables; prime remaining suspect
is relay condition during those cross-process measurements (grants took
15-21 min per fresh process that day — the relay was demonstrably
degraded).  Cross-process confirmation at the real shape: the eNATL warm
run's opt exec_s in a healthy window.
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import pickle
import time

import numpy as np

import jax

if "--cpu" in _sys.argv:  # env vars are too late on this image (CLAUDE.md)
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
from jax.experimental import serialize_executable as se  # noqa: E402

PAYLOAD = "/tmp/asvgp_exec_probe.pkl"


def build():
    steps = 8
    if "--steps" in _sys.argv:
        steps = int(_sys.argv[_sys.argv.index("--steps") + 1])

    def f(x, y):
        def body(c, _):
            c = jnp.tanh(c @ y) + x
            return c, jnp.sum(c)
        c, s = jax.lax.scan(body, x, jnp.arange(steps))
        return c, s

    x = jnp.asarray(0.1 * np.random.RandomState(0).randn(256, 256))
    y = jnp.asarray(0.05 * np.random.RandomState(1).randn(256, 256))
    return f, x, y


def time_execs(tag, call, x, y, reps=3):
    for i in range(reps):
        t0 = time.time()
        out = call(x, y)
        s = float(np.asarray(out[1])[-1])  # force to host through the relay
        print(f"{tag} exec[{i}]: {time.time()-t0:.3f}s (s={s:.3e})",
              flush=True)
    return out


def main():
    from asvgp_tpu.utils.relay import ensure_tpu_ready

    print(f"relay ready in {ensure_tpu_ready(timeout_s=2400):.1f}s",
          flush=True)
    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    f, x, y = build()

    mode = _sys.argv[1] if len(_sys.argv) > 1 else "inproc"

    if mode == "--load":
        with open(PAYLOAD, "rb") as fh:
            payload, in_tree, out_tree, ref0 = pickle.load(fh)
        t0 = time.time()
        loaded = se.deserialize_and_load(payload, in_tree, out_tree)
        print(f"deserialize_and_load (new process): {time.time()-t0:.2f}s",
              flush=True)
        out = time_execs("loaded-xproc", loaded, x, y)
        got0 = np.asarray(out[0])
        assert np.isfinite(got0).all(), "probe produced non-finite values"
        err = float(np.abs(got0 - ref0).max())
        print("max abs diff vs direct (cross-process):", err, flush=True)
        print("OK" if err == 0.0 else "MISMATCH", flush=True)
        return

    t0 = time.time()
    compiled = jax.jit(f).lower(x, y).compile()
    print(f"compile: {time.time()-t0:.1f}s", flush=True)
    ref = time_execs("direct", compiled, x, y)
    ref0 = np.asarray(ref[0])
    assert np.isfinite(ref0).all(), "probe produced non-finite values"

    t0 = time.time()
    payload, in_tree, out_tree = se.serialize(compiled)
    print(f"serialize: {time.time()-t0:.2f}s, {len(payload)/1e6:.2f} MB",
          flush=True)

    if mode == "--save":
        with open(PAYLOAD, "wb") as fh:
            pickle.dump((payload, in_tree, out_tree, ref0), fh)
        print("saved payload to", PAYLOAD, flush=True)
        return

    t0 = time.time()
    loaded = se.deserialize_and_load(payload, in_tree, out_tree)
    print(f"deserialize_and_load: {time.time()-t0:.2f}s", flush=True)

    out = time_execs("loaded-inproc", loaded, x, y)
    got0 = np.asarray(out[0])
    err = float(np.abs(got0 - ref0).max())
    print("max abs diff vs direct:", err, flush=True)
    print("OK" if err == 0.0 else "MISMATCH", flush=True)


if __name__ == "__main__":
    main()
