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

import jax.numpy as jnp  # noqa: E402

N = 1_000_000
M = 10_000
SEED = 0


def make_data():
    rng = np.random.RandomState(SEED)
    x = rng.uniform(0.005, 0.995, N)
    y = np.sin(4400.0 * x) + 0.5 * np.sin(1100.0 * x) + 0.3 * rng.randn(N)
    return x, y


def build(device):
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
        params = jax.tree.map(
            lambda a: jax.device_put(a, device), model.init_params()
        )
        model.stats = jax.tree.map(
            lambda a: jax.device_put(a, device), model.stats
        )
    return model, params, t_pre


def time_step(model, params, device, reps=10):
    with jax.default_device(device):
        vg = jax.jit(jax.value_and_grad(model.training_loss))
        t0 = time.time()
        val = float(vg(params)[0])
        t_compile = time.time() - t0
        ts = []
        for i in range(reps):
            p = dict(params)
            p["kernel"] = dict(params["kernel"])
            p["kernel"]["raw_lengthscales"] = (
                params["kernel"]["raw_lengthscales"] + 1e-10 * (i + 1)
            )
            t0 = time.time()
            _ = float(vg(p)[0])
            ts.append(time.time() - t0)
    return float(np.median(ts)), t_compile, val


def main():
    dev = jax.devices()[0]
    model, params, t_pre = build(dev)
    step_s, t_compile, val = time_step(model, params, dev)

    cpu = jax.devices("cpu")[0]
    model_cpu, params_cpu, _ = build(cpu)
    cpu_s, _, cpu_val = time_step(model_cpu, params_cpu, cpu, reps=3)

    print(
        json.dumps(
            {
                "metric": "elbo_grad_step_1m_points_10k_features",
                "value": round(step_s * 1000, 3),
                "unit": "ms",
                "vs_baseline": round(cpu_s / step_s, 3),
                "extras": {
                    "device": str(dev),
                    "precompute_s": round(t_pre, 3),
                    "compile_s": round(t_compile, 1),
                    "loss": val,
                    "cpu_f64_step_ms": round(cpu_s * 1000, 3),
                    "loss_rel_err_vs_f64": abs(val - cpu_val) / abs(cpu_val),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
