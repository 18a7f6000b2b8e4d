"""Per-phase timing of the FULL GPRKron ELBO value+grad at eNATL shape.

The block-op phase probe (block_phase_probe.py) shows the scan-free DS
block ops are fast (chol 70ms, value+grad-of-logdet 87ms at W=4, nb=100,
B=100), yet the whole model step measured ~1.3s at the SMALLER m=40²
(kron_tpu_probe).  This probe splits the model ELBO into its phases to
find where the rest of the time goes.

Run on the TPU (relay free): python tools/kron_elbo_phase_probe.py [m]
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import sys
import time

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)
os.makedirs("/tmp/asvgp_jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/asvgp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp  # noqa: E402

M = int(sys.argv[1]) if len(sys.argv) > 1 else 100
N = 200_000
ITERS = 3
REPS = 2


def time_one(name, fn, args, results):
    import json

    @jax.jit
    def run(eps, args):
        def body(e, _):
            out = fn(jax.tree.map(lambda a: a + (e * 0.0).astype(a.dtype), args))
            leaf = jax.tree.leaves(out)[0]
            return e + 1e-300 * jnp.sum(leaf), 0.0

        e, _ = jax.lax.scan(body, eps, jnp.arange(ITERS))
        return e

    t0 = time.time()
    float(run(jnp.float64(0.0), args))
    compile_s = time.time() - t0
    ts = []
    for r in range(REPS):
        t0 = time.time()
        float(run(jnp.float64(1e-12 * r), args))
        ts.append(time.time() - t0)
    per = float(np.median(ts)) / ITERS * 1000
    results[name] = round(per, 3)
    print(f"{name:32s} {per:10.3f} ms  (compile {compile_s:.1f}s)", flush=True)


def main():
    import json

    from asvgp_tpu import banded
    from asvgp_tpu.banded import block
    from asvgp_tpu.basis import B4Spline
    from asvgp_tpu.features.spline_features import make_kuu
    from asvgp_tpu.models import Matern32
    from asvgp_tpu.models.kron import GPRKron, kron_params_to_kernels
    from asvgp_tpu.stats.kron import (
        t_band_to_blocks,
        t_band_trace_against_kron,
    )

    rng = np.random.RandomState(0)
    x = rng.uniform(0.02, 0.98, (N, 2))
    y = np.sin(6 * x[:, 0]) * np.cos(5 * x[:, 1]) + 0.1 * rng.randn(N)

    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    with jax.default_device(dev):
        model = GPRKron(
            (jnp.asarray(x), jnp.asarray(y)),
            [Matern32(variance=1.0, lengthscales=0.2)] * 2,
            [B4Spline(0.0, 1.0, M), B4Spline(0.0, 1.0, M)],
            noise_variance=0.1,
        )
        params = model.init_params()
        jax.block_until_ready(model.stats.t_band)
        print("stats done", flush=True)

        results = {}
        kernels = kron_params_to_kernels(params, model.nu2s)
        kuu_bands = [make_kuu(k, b) for k, b in zip(kernels, model.bases)]
        sigma2 = jnp.float64(0.1)
        t_band = model.stats.t_band
        kuu2_dense = banded.band_to_dense(
            banded.symmetrise_lower_band(kuu_bands[1]),
            model.bases[1].order,
            model.bases[1].order,
        )
        l_bands = [jax.jit(banded.cholesky_band)(kb) for kb in kuu_bands]
        s_bands = [jax.jit(banded.takahashi_inverse_band)(lb) for lb in l_bands]
        p_blocks = jax.jit(
            lambda tb, k1, k2d, s2: t_band_to_blocks(tb, k1, k2d, s2)
        )(t_band, kuu_bands[0], kuu2_dense, sigma2)
        jax.block_until_ready((l_bands, s_bands, p_blocks))
        print("setup done", flush=True)

        # phase 1: per-dim banded value+grad (chol + takahashi + logdet)
        def perdim(a):
            kb = a[0]
            lb = banded.cholesky_band(kb)
            sb = banded.takahashi_inverse_band(lb)
            return banded.log_det_from_cholesky(lb) + jnp.sum(sb)

        time_one(
            "perdim_chol_tak_grad",
            lambda a: jax.grad(perdim)(a),
            (kuu_bands[0],),
            results,
        )

        # phase 2: trace term value+grad
        def tracef(a):
            return t_band_trace_against_kron(t_band, a[0], a[1])

        time_one(
            "trace_grad",
            lambda a: jax.grad(tracef)(a),
            (s_bands[0], s_bands[1]),
            results,
        )

        # phase 3: P assembly value+grad
        def passm(a):
            return jnp.sum(t_band_to_blocks(t_band, a[0], a[1], a[2]))

        time_one(
            "p_assembly_grad",
            lambda a: jax.grad(passm)(a),
            (kuu_bands[0], kuu2_dense, sigma2),
            results,
        )

        # phase 4: block chol + logdet + solve value+grad
        def blockf(a):
            l_p = block.cholesky_block_banded(a[0])
            c = block.solve_lower_block_banded(l_p, a[1])
            return block.log_det_from_block_cholesky(l_p) + jnp.sum(
                jnp.square(c)
            )

        time_one(
            "block_chol_solve_grad",
            lambda a: jax.grad(blockf)(a),
            (p_blocks, model.stats.kuf_y),
            results,
        )

        # phase 5: full elbo forward only
        time_one("elbo_fwd", lambda a: model.training_loss(a[0]), (params,), results)

        # phase 6: full value+grad
        time_one(
            "elbo_value_grad",
            lambda a: jax.value_and_grad(model.training_loss)(a[0]),
            (params,),
            results,
        )

        print(json.dumps(results))


if __name__ == "__main__":
    main()
