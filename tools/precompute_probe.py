"""Split the eNATL precompute (Kron stats build) into trace/compile/exec.

ENATL_RUN/ENATL_WARM have precompute 500.2 s (cold) vs 840.3 s (warm) at
identical code and shapes — the dominant phase of the whole protocol and
unexplained variance.  The build is ONE jit of ~500 cell-grid reductions
over N=2M points (stats/kron.py _kron_stats_local).  This probe times, at
the real shape:

  trace    — jax.jit(...).trace (host Python)
  lower    — trace.lower()
  compile  — lowered.compile() (remote relay; persistent-cache sensitive)
  exec x3  — the compiled executable (the hardware truth)

plus the same for a second process-identical call (in-process cache), with
JAX_LOG_COMPILES visible in the log.

Run (TPU relay free): python tools/precompute_probe.py [--n 2000000]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if "--cpu" in sys.argv:  # env vars are too late on this image (CLAUDE.md)
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_log_compiles", True)
os.makedirs("/tmp/asvgp_jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/asvgp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_000_000)
    ap.add_argument("--m", type=int, default=100)
    ap.add_argument("--order", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    from asvgp_tpu.basis import BSplineBasis
    from asvgp_tpu.stats.kron import compute_kron_stats
    from asvgp_tpu.utils.relay import ensure_tpu_ready

    print(f"relay ready in {ensure_tpu_ready():.1f}s", flush=True)

    bases = [BSplineBasis(0.0, 1.0, args.m, args.order)] * 2
    rng = np.random.RandomState(0)
    X = jnp.asarray(rng.uniform(0.02, 0.98, (args.n, 2)))
    y = jnp.asarray(rng.randn(args.n))
    jax.block_until_ready((X, y))

    fn = jax.jit(lambda xx, yy: compute_kron_stats(bases, xx, yy))

    t0 = time.time()
    traced = fn.trace(X, y)
    print(f"trace:   {time.time() - t0:7.2f}s", flush=True)
    t0 = time.time()
    lowered = traced.lower()
    print(f"lower:   {time.time() - t0:7.2f}s", flush=True)
    t0 = time.time()
    compiled = lowered.compile()
    print(f"compile: {time.time() - t0:7.2f}s", flush=True)
    for i in range(3):
        t0 = time.time()
        out = compiled(X, y)
        # force a value to HOST: block_until_ready alone can acknowledge
        # before the relay D2H path has produced anything (CLAUDE.md)
        yty = float(out.yty)
        print(f"exec[{i}]: {time.time() - t0:7.2f}s (yty={yty:.6g})",
              flush=True)

    # dispatch-path timing (what GPRKron actually does)
    t0 = time.time()
    out = fn(X, y)
    jax.block_until_ready(out)
    print(f"jit-dispatch (in-process warm): {time.time() - t0:7.2f}s",
          flush=True)


if __name__ == "__main__":
    main()
