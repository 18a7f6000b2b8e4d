"""Incremental CR-on-TPU probe: compile+run cr_logdet, grad(cr_logdet),
cr_solve separately at m=10^4 to find where the remote compiler struggles.
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)
import os

os.makedirs("/tmp/asvgp_jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/asvgp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp  # noqa: E402

from asvgp_tpu import banded  # noqa: E402
from asvgp_tpu.banded import cyclic  # noqa: E402

M, K = 10_000, 3


def random_band(key, m, k, diag=2.0):
    kl, kd = jax.random.split(jax.random.PRNGKey(key))
    l0 = jax.random.normal(kl, (k + 1, m), jnp.float64) * 0.3
    l0 = l0.at[0].set(diag + jax.random.uniform(kd, (m,), jnp.float64))
    l0 = banded.mask_lower_band(l0)
    L0 = banded.lower_band_to_dense(l0)
    return banded.dense_to_lower_band(L0 @ L0.T, k)


def bench_one(name, fn, args, ref=None):
    t0 = time.time()
    out = jax.block_until_ready(jax.jit(fn)(*args))
    compile_s = time.time() - t0
    ts = []
    for _ in range(5):
        t0 = time.time()
        jax.block_until_ready(jax.jit(fn)(*args))
        ts.append(time.time() - t0)
    run_ms = float(np.median(ts)) * 1000
    line = f"{name:22s} compile {compile_s:7.1f}s  run {run_ms:8.2f} ms"
    if ref is not None:
        got = np.asarray(out)
        rel = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-300)
        line += f"  rel {rel:.3g}"
    print(line, flush=True)
    return out


def main():
    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    with jax.default_device(cpu):
        a = random_band(10, M, K)
        b = jax.random.normal(jax.random.PRNGKey(12), (M,), jnp.float64)
        ld_ref = np.asarray(jax.jit(cyclic.cr_logdet)(a))
        g_ref = np.asarray(jax.jit(jax.grad(cyclic.cr_logdet))(a))
        x_ref = np.asarray(jax.jit(cyclic.cr_solve)(a, b))
    print("CPU refs done", flush=True)
    at = jax.device_put(a, tpu)
    bt = jax.device_put(b, tpu)
    with jax.default_device(tpu):
        bench_one("cr_logdet", cyclic.cr_logdet, (at,), ld_ref)
        bench_one("grad(cr_logdet)", jax.grad(cyclic.cr_logdet), (at,), g_ref)
        bench_one("cr_solve", cyclic.cr_solve, (at, bt), x_ref)


if __name__ == "__main__":
    main()
