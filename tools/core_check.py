"""Correctness check of the fused collapsed-core DS kernels ON THE TPU
against the CPU float64 scan path (value + all input gradients), m=300 k=3.

Interpret-mode equivalents exist in tests/test_pallas_ds_core.py (slow tier)
but take tens of minutes on this 1-core host; the real TPU runs in seconds
once compiled.  Run: python tools/core_check.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)
import os

os.makedirs("/tmp/asvgp_jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/asvgp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp  # noqa: E402

from asvgp_tpu import banded  # noqa: E402
from asvgp_tpu.banded import ops as bops  # noqa: E402

M, K = 300, 3


def random_band(key, m, k, diag=2.0):
    kl, kd = jax.random.split(jax.random.PRNGKey(key))
    l0 = jax.random.normal(kl, (k + 1, m), jnp.float64) * 0.3
    l0 = l0.at[0].set(diag + jax.random.uniform(kd, (m,), jnp.float64))
    l0 = banded.mask_lower_band(l0)
    L0 = banded.lower_band_to_dense(l0)
    return banded.dense_to_lower_band(L0 @ L0.T, k)


def main():
    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    with jax.default_device(cpu):
        kuu = random_band(10, M, K)
        p = random_band(11, M, K, diag=4.0)
        b = jax.random.normal(jax.random.PRNGKey(12), (M,), jnp.float64)
        big = random_band(13, M, K, diag=3.0)
    coef = jnp.asarray([0.7, -1.3, 0.11, 0.37], jnp.float64)

    def loss(kuu_, p_, b_, big_):
        out = banded.collapsed_core(kuu_, p_, b_, big_)
        return sum(c * o for c, o in zip(coef, out))

    # CPU scan reference
    bops.set_impl("scan")
    with jax.default_device(cpu):
        ref_out = jax.jit(
            lambda *a: banded.collapsed_core(*a)
        )(kuu, p, b, big)
        ref_out = [float(x) for x in ref_out]
        ref_g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))(kuu, p, b, big)
        ref_g = [np.asarray(x) for x in ref_g]
    bops.set_impl("auto")

    # TPU DS
    args_t = [jax.device_put(x, tpu) for x in (kuu, p, b, big)]
    with jax.default_device(tpu):
        got_out = jax.jit(lambda *a: banded.collapsed_core(*a))(*args_t)
        got_out = [float(x) for x in got_out]
        got_g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))(*args_t)
        got_g = [np.asarray(x) for x in got_g]

    names = ["ld_kuu", "ld_p", "quad", "trace"]
    ok = True
    for n, r, g in zip(names, ref_out, got_out):
        rel = abs(g - r) / max(abs(r), 1e-300)
        print(f"{n:8s} ref={r:+.12e} tpu={g:+.12e} rel={rel:.3g}")
        ok &= rel < 1e-9
    for n, r, g in zip(["g_kuu", "g_p", "g_b", "g_big"], ref_g, got_g):
        scale = np.abs(r).max()
        rel = np.abs(g - r).max() / scale
        print(f"{n:8s} max|ref|={scale:.3e} rel={rel:.3g}")
        ok &= rel < 1e-8
    print("PASS" if ok else "FAIL")


if __name__ == "__main__":
    main()
