"""Probe: GPRKron ELBO value+grad on the TPU (f64 XLA block ops) vs CPU f64.

Measures how wrong/slow the current block-banded f64 path is on this
platform (CLAUDE.md: f64 emulation unreliable in recursions) to size the
round's DS-block-kernel work.  Run: python tools/kron_tpu_probe.py [m_per_dim]
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)
import os

os.makedirs("/tmp/asvgp_jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/asvgp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp  # noqa: E402

M = int(sys.argv[1]) if len(sys.argv) > 1 else 40
N = 100_000


def main():
    from asvgp_tpu.basis import B4Spline
    from asvgp_tpu.models import Matern32
    from asvgp_tpu.models.kron import GPRKron

    rng = np.random.RandomState(0)
    x = rng.uniform(0.02, 0.98, (N, 2))
    y = np.sin(6 * x[:, 0]) * np.cos(5 * x[:, 1]) + 0.1 * rng.randn(N)

    results = {}
    for devname in ["cpu", "tpu"]:
        dev = jax.devices("cpu")[0] if devname == "cpu" else jax.devices()[0]
        with jax.default_device(dev):
            model = GPRKron(
                (jnp.asarray(x), jnp.asarray(y)),
                [Matern32(variance=1.0, lengthscales=0.2)] * 2,
                [B4Spline(0.0, 1.0, M), B4Spline(0.0, 1.0, M)],
                noise_variance=0.1,
            )
            params = model.init_params()
            vg = jax.jit(jax.value_and_grad(model.training_loss))
            t0 = time.time()
            loss, grads = vg(params)
            loss = float(loss)
            t_compile = time.time() - t0
            t0 = time.time()
            loss2, grads2 = vg(params)
            gsum = float(
                sum(jnp.sum(jnp.abs(g)) for g in jax.tree.leaves(grads2))
            )
            t_step = time.time() - t0
        results[devname] = (loss, gsum, t_step, t_compile)
        print(
            f"{devname}: loss={loss:.10g} gsum={gsum:.10g} "
            f"step={t_step*1000:.1f}ms compile={t_compile:.1f}s",
            flush=True,
        )

    lc, gc = results["cpu"][0], results["cpu"][1]
    lt, gt = results["tpu"][0], results["tpu"][1]
    print(
        f"rel err: loss {abs(lt-lc)/abs(lc):.3g}  gsum {abs(gt-gc)/abs(gc):.3g}"
    )


if __name__ == "__main__":
    main()
