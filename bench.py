"""North-star benchmark: ELBO+grad step at N=1e6 points, m=10k B3 features.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
``value`` is the median ELBO value-and-grad step time (ms) on the default
JAX device — the training hot loop of BASELINE.md's "1e6-point 1-D
Matérn-3/2 regression with 10k B-spline features".  On TPU this runs the
double-single Pallas kernels (banded/pallas_ds.py), f64-equivalent
precision; the reported ``loss_rel_err_vs_f64`` verifies the value against
the host CPU float64 scan path.  ``vs_baseline`` is the speedup vs that CPU
f64 step (the stand-in for the reference's C++ banded ops + TF autodiff,
which cannot run in this image — no gpflow/banded_matrices).

The synthetic data carries ~700 effective periods so the m=10⁴ basis is
genuinely exercised and the lengthscale init matches the data scale — the
regime the method is designed for (with smooth data + m=10⁴ the ELBO's
trace term is mathematically ill-conditioned, κ(Kuu) ≳ 1e16, and *no*
implementation, the reference's f64 CPU included, computes it to any
precision).
"""

import json
import time

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)
# persistent compilation cache: the DS kernels take minutes to compile via
# this platform's remote-compile tunnel; cache across bench runs
try:
    import os

    os.makedirs("/tmp/asvgp_jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/asvgp_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    # strip per-instruction source paths from lowered HLO (pure metadata,
    # ~10% of serialized executables shipped through the relay)
    jax.config.update("jax_hlo_source_file_canonicalization_regex", ".*")
except Exception:
    pass

import jax.numpy as jnp  # noqa: E402

N = 1_000_000
M = 10_000
SEED = 0


def make_data():
    rng = np.random.RandomState(SEED)
    x = rng.uniform(0.005, 0.995, N)
    y = np.sin(4400.0 * x) + 0.5 * np.sin(1100.0 * x) + 0.3 * rng.randn(N)
    return x, y


def build(device, rebuild_warm=True):
    from asvgp_tpu.basis import B3Spline
    from asvgp_tpu.models import GPR1D, Matern32

    x, y = make_data()
    with jax.default_device(device):
        t0 = time.time()
        model = GPR1D(
            (jnp.asarray(x), jnp.asarray(y)),
            Matern32(variance=1.0, lengthscales=1e-3),
            B3Spline(0.0, 1.0, M),
            noise_variance=0.1,
        )
        jax.block_until_ready(model.stats.kuf_y)
        t_pre = time.time() - t0
        # warm precompute: second construction hits the in-process jit cache
        # — this is the steady-state cost (round-1 artifact conflated a
        # cold remote-tunnel compile into precompute_s; VERDICT weak #5)
        t_pre_warm = t_pre
        if rebuild_warm:
            t0 = time.time()
            model = GPR1D(
                (jnp.asarray(x), jnp.asarray(y)),
                Matern32(variance=1.0, lengthscales=1e-3),
                B3Spline(0.0, 1.0, M),
                noise_variance=0.1,
            )
            jax.block_until_ready(model.stats.kuf_y)
            t_pre_warm = time.time() - t0
        params = jax.tree.map(
            lambda a: jax.device_put(a, device), model.init_params()
        )
        model.stats = jax.tree.map(
            lambda a: jax.device_put(a, device), model.stats
        )
    return model, params, (t_pre, t_pre_warm)


K_STEPS = 10


def time_step(model, params, device, reps=5):
    """Median per-step ELBO+grad time with K_STEPS steps inside one jit —
    how training actually runs (fit_lbfgs is a single on-device while_loop),
    so per-dispatch latency is amortized as in production."""
    with jax.default_device(device):
        vg = jax.value_and_grad(model.training_loss)

        @jax.jit
        def k_steps(p):
            def body(carry, i):
                # perturb a hyperparameter so no step can be CSE'd away
                q = dict(p)
                q["kernel"] = dict(p["kernel"])
                q["kernel"]["raw_lengthscales"] = (
                    p["kernel"]["raw_lengthscales"] + 1e-12 * (i + carry * 0.0)
                )
                loss, grads = vg(q)
                gsum = sum(jax.tree.leaves(jax.tree.map(jnp.sum, grads)))
                return carry + loss + 1e-20 * gsum, loss

            total, losses = jax.lax.scan(
                body, jnp.zeros((), p["likelihood"]["raw_variance"].dtype),
                jnp.arange(K_STEPS, dtype=p["likelihood"]["raw_variance"].dtype),
            )
            return total, losses

        t0 = time.time()
        total, losses = k_steps(params)
        val = float(losses[0])
        t_compile = time.time() - t0
        ts = []
        for i in range(reps):
            p = dict(params)
            p["kernel"] = dict(params["kernel"])
            p["kernel"]["raw_lengthscales"] = (
                params["kernel"]["raw_lengthscales"] + 1e-10 * (i + 1)
            )
            t0 = time.time()
            _ = float(k_steps(p)[0])
            ts.append(time.time() - t0)
    return float(np.median(ts)) / K_STEPS, t_compile, val


def main():
    import os

    from asvgp_tpu.utils.relay import ensure_tpu_ready

    dev = jax.devices()[0]
    # absorb any relay grant-wait (~250 s after an abnormal prior exit)
    # BEFORE any timed phase; report it separately
    relay_wait_s = ensure_tpu_ready(dev)
    model, params, (t_pre_cold, t_pre_warm) = build(dev)
    step_s, t_compile, val = time_step(model, params, dev)

    # the CPU comparison leg runs on THIS host (1 core in the build image):
    # record ambient load so a contended number is identifiable
    # (CLAUDE.md: 61-162 ms observed depending on load)
    load1 = os.getloadavg()[0]
    cpu = jax.devices("cpu")[0]
    model_cpu, params_cpu, _ = build(cpu, rebuild_warm=False)
    cpu_s, _, cpu_val = time_step(model_cpu, params_cpu, cpu, reps=2)

    print(
        json.dumps(
            {
                "metric": "elbo_grad_step_1m_points_10k_features",
                "value": round(step_s * 1000, 3),
                "unit": "ms",
                "vs_baseline": round(cpu_s / step_s, 3),
                "extras": {
                    "device": str(dev),
                    "relay_wait_s": round(relay_wait_s, 2),
                    "precompute_s": round(t_pre_cold, 3),
                    "precompute_warm_s": round(t_pre_warm, 3),
                    "compile_s": round(t_compile, 1),
                    "loss": val,
                    "cpu_f64_step_ms": round(cpu_s * 1000, 3),
                    "cpu_loadavg_before": round(load1, 2),
                    "loss_rel_err_vs_f64": abs(val - cpu_val) / abs(cpu_val),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
