"""Line-search economics A/B at the north-star shape (VERDICT r4 next #1).

evals/iter is the exec-time multiplier: NORTHSTAR r5 measures 3.58 evals
per L-BFGS iteration at 15.8 ms/eval (= the bench step), so the zoom
curvature tolerance directly scales t_opt exec.  This probe fits the
north-star config on the TPU under several ``curv_rtol`` settings (each is
a distinct compiled loop — the tolerance is baked into the executable),
records evals/iter, exec time, final ELBO and held-out NLPD, and compares
the NLPD against the CPU-f64 oracle value recorded in NORTHSTAR.json.

A looser curvature test accepts the first Armijo point more often (fewer
zoom refinements) at the cost of lower-quality secant pairs; the decision
criterion is: NLPD still matched to ~1e-6 AND evals/iter down.

Writes LS_TUNE.json.  Run (TPU relay free): python tools/ls_tune_probe.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import os
import time

import numpy as np

import jax

os.environ.setdefault("ASVGP_EXEC_CACHE_DIR", "/tmp/asvgp_export_cache")
jax.config.update("jax_enable_x64", True)
os.makedirs("/tmp/asvgp_jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/asvgp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
jax.config.update("jax_hlo_source_file_canonicalization_regex", ".*")

import jax.numpy as jnp  # noqa: E402

from northstar_run import make_data, M, MAX_ITERS  # noqa: E402


def main():
    from asvgp_tpu.basis import B3Spline
    from asvgp_tpu.models import GPR1D, Matern32
    from asvgp_tpu.train import fit_lbfgs, nlpd
    from asvgp_tpu.utils.relay import ensure_tpu_ready

    (xtr, ytr), (xte, yte) = make_data()
    device = jax.devices()[0]
    relay_wait_s = ensure_tpu_ready(device)
    print(f"relay ready in {relay_wait_s:.1f}s", flush=True)

    with open(os.path.join(os.path.dirname(__file__), "..",
                           "NORTHSTAR.json")) as f:
        oracle_nlpd = json.load(f)["cpu_f64"]["nlpd"]

    rows = []
    with jax.default_device(device):
        t0 = time.time()
        model = GPR1D(
            (jnp.asarray(xtr), jnp.asarray(ytr)),
            Matern32(variance=1.0, lengthscales=1e-3),
            B3Spline(0.0, 1.0, M),
            noise_variance=0.1,
        )
        jax.block_until_ready(model.stats.kuf_y)
        print(f"precompute {time.time()-t0:.1f}s", flush=True)
        loss_fn, dargs, ktag = model.loss_args()

        for curv in (0.9, 0.99, 10.0):
            timings, info = {}, {}
            t0 = time.time()
            params, loss, iters = fit_lbfgs(
                loss_fn, model.init_params(),
                max_iters=MAX_ITERS, timings=timings, info=info,
                export_dir="/tmp/asvgp_export_cache",
                data_args=dargs, key_extra=ktag, curv_rtol=curv,
            )
            t_opt = time.time() - t0
            post = model.posterior(params)
            ld = post.predict_log_density((jnp.asarray(xte),
                                           jnp.asarray(yte)))
            row = {
                "curv_rtol": curv,
                "elbo": -float(loss),
                "iters": int(iters),
                "nlpd": float(nlpd(ld)),
                "nlpd_abs_diff_vs_cpu_oracle": abs(float(nlpd(ld))
                                                   - oracle_nlpd),
                "t_opt_s": round(t_opt, 2),
                "timings": timings,
                "info": info,
            }
            rows.append(row)
            print(json.dumps(row), flush=True)

    out = {
        "config": {"n": len(xtr) + len(xte), "m": M,
                   "max_iters": MAX_ITERS},
        "device": str(device),
        "relay_wait_s": round(relay_wait_s, 2),
        "cpu_oracle_nlpd": oracle_nlpd,
        "rows": rows,
    }
    path = os.path.join(os.path.dirname(__file__), "..", "LS_TUNE.json")
    with open(os.path.abspath(path), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
