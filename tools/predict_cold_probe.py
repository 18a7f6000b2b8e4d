"""Decompose the 1-D predict cold-start (NORTHSTAR tpu_warm cold_s ~5 s).

The warm-process predict path pays ~5 s on its FIRST chunk call even with
the executable disk cache (factor_s is solved at 0.85 s).  This probe
splits that cold_s into its parts at the north-star shape (m=10^4, 50k
test points):

  load_chunk_s    cached_compile() for _predict_chunk (disk deserialize
                  or trace+relay-compile when cold)
  first_chunk_s   first execution of the chunk executable (ships the
                  program through the relay; first-call penalty)
  ld_first_s      _log_density first call (plain jax.jit: trace + compile
                  or persistent-cache load + exec)
  warm_chunk_s    second execution (pure exec)

plus the on-disk blob sizes of the predict/posterior executables.

Writes PREDICT_COLD.json.  Run twice (same command) — first populates the
caches, second measures the warm process:
  python tools/predict_cold_probe.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import glob
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

N = 1_000_000
M = 10_000


def main():
    from asvgp_tpu.basis import B3Spline
    from asvgp_tpu.models import GPR1D, Matern32
    from asvgp_tpu.models.gpr1d import (
        Posterior1D, _log_density, _predict_chunk, _basis_tag,
    )
    from asvgp_tpu.utils import exec_cache as _ec
    from asvgp_tpu.utils.relay import ensure_tpu_ready

    rng = np.random.RandomState(0)
    x = rng.uniform(0.005, 0.995, N)
    y = np.sin(4400.0 * x) + 0.5 * np.sin(1100.0 * x) + 0.3 * rng.randn(N)
    n_test = N // 20
    xte, yte = x[:n_test], y[:n_test]

    tpu = jax.devices()[0]
    relay_wait_s = ensure_tpu_ready(tpu)
    out = {"relay_wait_s": round(relay_wait_s, 2)}

    with jax.default_device(tpu):
        model = GPR1D(
            (jnp.asarray(x[n_test:]), jnp.asarray(y[n_test:])),
            Matern32(variance=1.0, lengthscales=1e-3),
            B3Spline(0.0, 1.0, M),
            noise_variance=0.1,
        )
        jax.block_until_ready(model.stats.kuf_y)
        params = model.init_params()

        t0 = time.time()
        post = model.posterior(params)
        jax.block_until_ready(post.w)
        out["factor_s"] = round(time.time() - t0, 2)

        xc = jnp.reshape(jnp.asarray(xte), (-1,))
        dyn = (post.w, post.diff_band, post.kernel.variance, xc)
        timings = {}
        t0 = time.time()
        compiled = _ec.cached_compile(
            _predict_chunk, (post.basis,), dyn,
            tag=f"pred1d-{_basis_tag(post.basis)}",
            device=_ec.params_device(dyn), timings=timings,
        )
        out["load_chunk_s"] = round(time.time() - t0, 2)
        out["load_chunk_phases"] = timings
        t0 = time.time()
        mean, var = jax.block_until_ready(compiled(*dyn))
        out["first_chunk_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        jax.block_until_ready(compiled(*dyn))
        out["warm_chunk_s"] = round(time.time() - t0, 3)

        yj = jnp.reshape(jnp.asarray(yte), mean.shape)
        t0 = time.time()
        ld = jax.block_until_ready(
            _log_density(post.likelihood, mean, var, yj)
        )
        out["ld_first_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        jax.block_until_ready(_log_density(post.likelihood, mean, var, yj))
        out["ld_warm_s"] = round(time.time() - t0, 3)
        out["nlpd"] = float(-jnp.mean(ld))

    blobs = {}
    for p in sorted(glob.glob("/tmp/asvgp_export_cache/*")):
        blobs[os.path.basename(p)] = os.path.getsize(p)
    out["cache_blobs_bytes"] = blobs

    path = os.path.join(os.path.dirname(__file__), "..", "PREDICT_COLD.json")
    with open(os.path.abspath(path), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
