"""A/B the fit-loop disk-cache regimes on the eNATL-shaped Kron fit loop.

Round-3 ENATL_RUN shows exec 213 s / 100 iters vs 32.5 s in round 2 at
IDENTICAL ELBO, while tools/block_regress_probe.py shows the block-DS ops
themselves got FASTER (81.5 ms chol+solve+grad vs 96.9).  The remaining
round-3 change on that path was fit_lbfgs(export_dir=...): the optimization
loop was compiled from jax.export ROUND-TRIPPED StableHLO even on a cold
run.  Round 2 already saw this failure shape once: extra pjit boundaries in
the loop body regressed eNATL exec 32 -> 158 s (commit 827f5f6) via
fusion/layout loss on the ~40 MB block operands.

This probe fits the same eNATL-shaped GPRKron (m=100^2, B4, N=2e5 — the
fit-loop executable is N-independent, stats are m-shaped) for 100
iterations under each regime and prints the phase splits:

  direct  : fit_lbfgs(export_dir=None)             — no caching (round-2 regime)
  pjrt    : executable disk cache, cold            — round-4 default, cold
  pjrt2   : executable disk cache, warm blob       — round-4 default, warm
  export  : ASVGP_CACHE_MODE=export, cold          — round-3 regime (control)

Expected: exec_s identical for direct/pjrt/pjrt2 (same executable bits);
export exec_s is the regression under test.

Run on the TPU (relay free): python tools/export_ab_probe.py
Result: committed as EXPORT_AB.json at the repo root.
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import os
import shutil
import time

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)
os.makedirs("/tmp/asvgp_jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/asvgp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp  # noqa: E402

M = 100
N = 200_000
ITERS = 100


def main():
    from asvgp_tpu.basis import B4Spline
    from asvgp_tpu.models import Matern32
    from asvgp_tpu.models.kron import GPRKron
    from asvgp_tpu.train import fit_lbfgs
    from asvgp_tpu.utils.relay import ensure_tpu_ready

    rng = np.random.RandomState(0)
    x = rng.uniform(0.02, 0.98, (N, 2))
    y = np.sin(6 * x[:, 0]) * np.cos(5 * x[:, 1]) + 0.1 * rng.randn(N)

    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    print(f"relay ready in {ensure_tpu_ready(dev):.1f}s", flush=True)
    ab_dir = "/tmp/asvgp_export_ab"
    shutil.rmtree(ab_dir, ignore_errors=True)
    with jax.default_device(dev):
        model = GPRKron(
            (jnp.asarray(x), jnp.asarray(y)),
            [Matern32(variance=1.0, lengthscales=0.2)] * 2,
            [B4Spline(0.0, 1.0, M), B4Spline(0.0, 1.0, M)],
            noise_variance=0.1,
        )
        jax.block_until_ready(model.stats.t_band)
        print("stats done", flush=True)

        results = {}
        for tag, export_dir, mode in (
            ("direct", None, "pjrt"),
            ("pjrt", ab_dir, "pjrt"),
            ("pjrt2", ab_dir, "pjrt"),
            ("export", ab_dir, "export"),
        ):
            timings = {}
            os.environ["ASVGP_CACHE_MODE"] = mode
            try:
                t0 = time.time()
                params, loss, iters = fit_lbfgs(
                    jax.jit(model.training_loss), model.init_params(),
                    max_iters=ITERS, timings=timings, export_dir=export_dir,
                )
                total = time.time() - t0
            finally:
                os.environ.pop("ASVGP_CACHE_MODE", None)
            results[tag] = {
                "loss": float(loss),
                "iters": int(iters),
                "total_s": round(total, 2),
                **timings,
            }
            print(tag, json.dumps(results[tag]), flush=True)
        out = {
            "config": {"m_per_dim": M, "n": N, "iters": ITERS,
                       "device": str(dev)},
            "regimes": results,
        }
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "EXPORT_AB.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out))


if __name__ == "__main__":
    main()
