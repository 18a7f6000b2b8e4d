"""Diagnose SYNTH1M fold 5 (seed=4): truncation vs optimizer pathology.

Round-3 SYNTH1M.json rows[4] has ASVGP ELBO -228,960 vs ~-204,600 on
folds 1-4 (24k nats off) at identical MSE, with every fold reporting
iters=200 (the cap) — so nothing distinguished converged from truncated
(VERDICT r3 weak #4).  This probe reruns seed 4 standalone:

  a) iters=200, fresh fit (reproduce the committed row + grad_norm)
  b) iters=1000 (is it just the iteration cap?)
  c) iters=200 through a shared refit cache primed by seed 0 (rule out a
     refit-cache interaction)

Run (TPU relay free): python tools/fold5_probe.py [--out FOLD5.json]
Or on CPU f64 (the optimizer's trajectory is platform-independent at this
conditioning; the CPU leg fits this shape in ~35 s): add --cpu.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "experiments", "large_regression"))

os.environ.setdefault("ASVGP_EXEC_CACHE_DIR", "/tmp/asvgp_export_cache")

import jax  # noqa: E402

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
os.makedirs("/tmp/asvgp_jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/asvgp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def probe_args(iters):
    return argparse.Namespace(
        n=1_000_000, m=1000, lengthscale_init=0.05, order=3, iters=iters,
        adam_baseline=False, svgp_baseline=False, vff_baseline=True,
        vff_frequencies=100, batch=4096, adam_steps=2000,
        svgp_batch=100, svgp_steps=10000,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    from synthetic_1m import run_split

    from asvgp_tpu.utils.relay import ensure_tpu_ready

    relay_wait_s = ensure_tpu_ready()
    print(f"relay ready in {relay_wait_s:.1f}s", flush=True)

    keep = ("elbo", "nlpd", "mse", "iters", "grad_norm", "converged",
            "noise_variance", "elbo_vff", "nlpd_vff", "t_opt")
    out = {"device": str(jax.devices()[0]), "relay_wait_s": round(relay_wait_s, 2)}

    row = run_split(probe_args(200), seed=4, fit_cache=None)
    out["a_iters200_fresh"] = {k: row.get(k) for k in keep}
    print("a) iters=200 fresh:", out["a_iters200_fresh"], flush=True)

    row = run_split(probe_args(1000), seed=4, fit_cache=None)
    out["b_iters1000"] = {k: row.get(k) for k in keep}
    print("b) iters=1000:", out["b_iters1000"], flush=True)

    cache = {}
    args200 = probe_args(200)
    args200.vff_baseline = False
    run_split(args200, seed=0, fit_cache=cache)  # prime like the 5-fold loop
    row = run_split(args200, seed=4, fit_cache=cache)
    out["c_iters200_shared_cache"] = {k: row.get(k) for k in keep}
    print("c) iters=200 shared cache:", out["c_iters200_shared_cache"],
          flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
