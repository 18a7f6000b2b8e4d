"""Bisect the SVGP TPU device fault (2026-08-21).

synthetic_1m's SVGP baseline faults the TPU ("UNAVAILABLE: TPU device
error - often a kernel fault") reproducibly at fold 0 under the reference
protocol (batch 100 x 10,000 Adam steps, m=1000, n=1e6) while the round-3
run (batch 4096 x 2000 steps, same model/shapes) completed.  This probe
runs fit_svgp standalone at a given (batch, steps) to separate the axes:

  python tools/svgp_fault_probe.py --batch 100  --steps 2000    # A
  python tools/svgp_fault_probe.py --batch 4096 --steps 10000   # B
  python tools/svgp_fault_probe.py --batch 100  --steps 10000   # the fault

A faults / B runs  -> batch-100 shapes hit a kernel bug
A runs  / B faults -> long scans hit a runtime limit
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
os.makedirs("/tmp/asvgp_jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/asvgp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--m", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=100)
    ap.add_argument("--steps", type=int, default=10000)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    from asvgp_tpu.basis import BSplineBasis
    from asvgp_tpu.models import Matern52
    from asvgp_tpu.models.svgp import SVGP1D, fit_svgp
    from asvgp_tpu.utils.relay import ensure_tpu_ready

    print(f"relay ready in {ensure_tpu_ready():.1f}s", flush=True)

    rng = np.random.RandomState(0)
    x = rng.uniform(0.002, 0.998, args.n)
    y = np.sin(7 * x) + 0.5 * np.sin(23 * x) * np.exp(-x) + 0.3 * rng.randn(args.n)

    basis = BSplineBasis(0.0, 1.0, args.m, 3)
    svgp = SVGP1D(Matern52(lengthscales=0.05), basis, num_data=args.n)
    t0 = time.time()
    params, losses = fit_svgp(
        svgp, x, y, svgp.init_params(),
        batch_size=args.batch, steps=args.steps,
    )
    ls = np.asarray(losses)  # host round-trip
    bad = np.flatnonzero(~np.isfinite(ls))
    onset = int(bad[0]) if bad.size else -1
    print(f"batch={args.batch} steps={args.steps}: ran in "
          f"{time.time()-t0:.1f}s, final loss {float(ls[-1]):.2f}, "
          f"first non-finite step {onset}", flush=True)
    for k in range(0, len(ls), max(1, len(ls) // 10)):
        print(f"  loss[{k}] = {float(ls[k]):.3f}", flush=True)


if __name__ == "__main__":
    main()
