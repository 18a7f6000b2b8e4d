"""North-star benchmark: ELBO+grad step at N=1e6 points, m=10k B3 features.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
``value`` is the median ELBO value-and-grad step time (ms) on the default
JAX device (TPU under the driver; the training hot loop of BASELINE.md's
"1e6-point 1-D Matérn-3/2 regression with 10k B-spline features").
``vs_baseline`` is the speedup vs this host's CPU running the same f64
step (the stand-in for the reference's C++ banded ops + TF autodiff, which
cannot run here — no gpflow/banded_matrices in the image).
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


def build(device, dtype=None):
    from asvgp_tpu.basis import B3Spline
    from asvgp_tpu.models import GPR1D, Matern32

    rng = np.random.RandomState(SEED)
    x = rng.uniform(0.005, 0.995, N)
    y = np.sin(6.0 * x) + 0.25 * rng.randn(N)
    basis = B3Spline(0.0, 1.0, M)
    with jax.default_device(device):
        t0 = time.time()
        model = GPR1D((jnp.asarray(x), jnp.asarray(y)), Matern32(), basis,
                      dtype=dtype)
        jax.block_until_ready(model.stats.kuf_y)
        t_pre = time.time() - t0
    return model, t_pre


def time_step(model, device, reps=10):
    params = model.init_params()
    with jax.default_device(device):
        vg = jax.jit(jax.value_and_grad(model.training_loss))
        t0 = time.time()
        out = vg(params)
        val = float(out[0])  # host sync
        t_compile = time.time() - t0
        ts = []
        for _ in range(reps):
            t0 = time.time()
            out = vg(params)
            _ = float(out[0])
            ts.append(time.time() - t0)
    return float(np.median(ts)), t_compile, val


def main():
    dev = jax.devices()[0]
    on_tpu = "cpu" not in str(dev).lower()
    # headline: float32 Pallas-kernel path on the accelerator
    model, t_pre = build(dev, dtype=jnp.float32 if on_tpu else None)
    step_s, t_compile, val = time_step(model, dev)

    # float64 CPU run = stand-in for the reference's C++ banded ops (the
    # reference stack cannot run in this image); also the precision check
    cpu = jax.devices("cpu")[0]
    model_cpu, _ = build(cpu)
    cpu_s, _, cpu_val = time_step(model_cpu, cpu, reps=3)

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
