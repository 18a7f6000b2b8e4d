"""Additive-family perf probe (VERDICT r4 stretch #8: a committed timing).

Times the GPRAdditive collapsed-ELBO value+grad on the TPU at a
representative shape (D=4, m=250 per dim => M=1000 coupled features,
N=500k statistics) and cross-checks the value against the CPU-f64 oracle.
The reference never benchmarks GPR_additive (asvgp/gpr.py:139-236), so
this is completeness evidence, not a headline.

Writes ADDITIVE_PROBE.json.  Run (TPU relay free):
python tools/additive_probe.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import os
import time

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)
os.makedirs("/tmp/asvgp_jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/asvgp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
jax.config.update("jax_hlo_source_file_canonicalization_regex", ".*")

import jax.numpy as jnp  # noqa: E402

N, D, M_PER_DIM = 500_000, 4, 250
ITERS = 5


def main():
    from asvgp_tpu.basis import B3Spline
    from asvgp_tpu.models import Matern32
    from asvgp_tpu.models.additive import GPRAdditive
    from asvgp_tpu.utils.relay import ensure_tpu_ready

    rng = np.random.RandomState(0)
    X = rng.uniform(0.02, 0.98, (N, D))
    y = sum(np.sin((3 + 2 * d) * X[:, d]) for d in range(D))
    y = (y + 0.2 * rng.randn(N)).reshape(-1, 1)
    bases = [B3Spline(0.0, 1.0, M_PER_DIM)] * D
    kernels = [Matern32(lengthscales=0.2)] * D

    tpu = jax.devices()[0]
    cpu = jax.devices("cpu")[0]
    relay_wait_s = ensure_tpu_ready(tpu)
    print(f"relay ready in {relay_wait_s:.1f}s", flush=True)

    def leg(device, reps):
        with jax.default_device(device):
            t0 = time.time()
            model = GPRAdditive((jnp.asarray(X), jnp.asarray(y)), kernels,
                                bases, noise_variance=0.1)
            jax.block_until_ready(model.stats.kuf_y)
            t_pre = time.time() - t0
            vg = jax.jit(jax.value_and_grad(model.training_loss))
            p0 = model.init_params()

            # chain ITERS evals in one jit so per-dispatch relay latency
            # amortizes as in a real fit loop
            @jax.jit
            def k_steps(p):
                def body(c, i):
                    q = jax.tree.map(lambda a: a, p)
                    q["likelihood"] = dict(p["likelihood"])
                    q["likelihood"]["raw_variance"] = (
                        p["likelihood"]["raw_variance"] + 1e-12 * i
                    )
                    v, g = jax.value_and_grad(model.training_loss)(q)
                    return c + v, v

                tot, vs = jax.lax.scan(
                    body, jnp.zeros(()), jnp.arange(ITERS, dtype=jnp.float64)
                )
                return tot, vs

            t0 = time.time()
            tot, vs = jax.block_until_ready(k_steps(p0))
            t_compile = time.time() - t0
            ts = []
            for _ in range(reps):
                t0 = time.time()
                float(k_steps(p0)[0])
                ts.append(time.time() - t0)
            # hardware-vs-oracle gradient row (round-4 verdict weak #5:
            # every numeric path that ships gets a hardware check)
            v0, g0 = jax.block_until_ready(vg(p0))
            # predict path: exercises the block Takahashi full-inverse
            # route on TPU (_solve_and_inverse_block)
            mean_p, var_p = model.predict_f(p0, X[:256])
            return {
                "device": str(device),
                "t_precompute_s": round(t_pre, 2),
                "compile_s": round(t_compile, 1),
                "value_grad_step_s": round(
                    float(np.median(ts)) / ITERS, 4),
                "loss0": float(vs[0]),
            }, np.concatenate([
                np.asarray(x, dtype=np.float64).ravel()
                for x in jax.tree.leaves(g0)
            ]), (np.asarray(mean_p).ravel(), np.asarray(var_p).ravel())

    print("TPU leg...", flush=True)
    res_tpu, g_tpu, pred_tpu = leg(tpu, reps=3)
    print(json.dumps(res_tpu), flush=True)
    print("CPU f64 leg...", flush=True)
    res_cpu, g_cpu, pred_cpu = leg(cpu, reps=2)
    print(json.dumps(res_cpu), flush=True)

    gref = np.maximum(np.abs(g_cpu), 1e-6 * np.abs(g_cpu).max())
    out = {
        "config": {"n": N, "d": D, "m_per_dim": M_PER_DIM,
                   "coupled_features": D * M_PER_DIM},
        "relay_wait_s": round(relay_wait_s, 2),
        "tpu": res_tpu,
        "cpu_f64": res_cpu,
        "loss_rel_err_vs_f64": abs(res_tpu["loss0"] - res_cpu["loss0"])
        / abs(res_cpu["loss0"]),
        "grad_max_rel_err_vs_f64": float(
            np.max(np.abs(g_tpu - g_cpu) / gref)
        ),
        "predict_mean_max_abs_err_vs_f64": float(
            np.max(np.abs(pred_tpu[0] - pred_cpu[0]))
        ),
        "predict_var_max_rel_err_vs_f64": float(
            np.max(np.abs(pred_tpu[1] - pred_cpu[1]) / np.abs(pred_cpu[1]))
        ),
        "vs_baseline_step": round(
            res_cpu["value_grad_step_s"] / res_tpu["value_grad_step_s"], 2),
    }
    path = os.path.join(os.path.dirname(__file__), "..",
                        "ADDITIVE_PROBE.json")
    with open(os.path.abspath(path), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
