"""TPU probe for the cyclic-reduction core: emulated-f64 accuracy at depth
~12 (the platform's f64 problem is LONG recursions — CR should be safe) and
amortized speed at the north-star size (m=10⁴, k=3).

Run: python tools/cr_probe.py
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
from asvgp_tpu.banded import ops as bops  # noqa: E402

M, K = 10_000, 3
ITERS = 20


def random_band(key, m, k, diag=2.0):
    kl, kd = jax.random.split(jax.random.PRNGKey(key))
    l0 = jax.random.normal(kl, (k + 1, m), jnp.float64) * 0.3
    l0 = l0.at[0].set(diag + jax.random.uniform(kd, (m,), jnp.float64))
    l0 = banded.mask_lower_band(l0)
    L0 = banded.lower_band_to_dense(l0)
    return banded.dense_to_lower_band(L0 @ L0.T, k)


def core(kuu, p, b, big):
    ld_kuu = cyclic.cr_logdet(kuu)
    ld_p = cyclic.cr_logdet(p)
    u = cyclic.cr_solve(p, b)
    quad = jnp.vdot(b, u)
    trace = jnp.vdot(jax.grad(cyclic.cr_logdet)(kuu), big)
    return ld_kuu - 1.3 * ld_p + 0.11 * quad + 0.37 * trace


def main():
    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    with jax.default_device(cpu):
        kuu = random_band(10, M, K)
        p = random_band(11, M, K, diag=4.0)
        b = jax.random.normal(jax.random.PRNGKey(12), (M,), jnp.float64)
        big = random_band(13, M, K, diag=3.0)

    vg = jax.value_and_grad(core, argnums=(0, 1, 2, 3))

    # CPU reference: CR and scan composition
    with jax.default_device(cpu):
        ref_v, ref_g = jax.jit(vg)(kuu, p, b, big)
        ref_v = float(ref_v)
        ref_g = [np.asarray(g) for g in ref_g]

        def scan_core(kuu_, p_, b_, big_):
            bops.set_impl("scan")
            try:
                l_kuu = bops.cholesky_band(kuu_)
                l_p = bops.cholesky_band(p_)
                s_kuu = bops.takahashi_inverse_band(l_kuu)
                u = bops.cholesky_solve_band(l_p, b_)
                w = cyclic.band_weights(K, M, kuu_.dtype)
                return (
                    bops.log_det_from_cholesky(l_kuu)
                    - 1.3 * bops.log_det_from_cholesky(l_p)
                    + 0.11 * jnp.vdot(b_, u)
                    + 0.37 * jnp.sum(w * s_kuu * big_)
                )
            finally:
                bops.set_impl("auto")

        scan_v = float(jax.jit(scan_core)(kuu, p, b, big))
    print(f"CPU: cr={ref_v:.12e} scan={scan_v:.12e} "
          f"rel={abs(ref_v-scan_v)/abs(scan_v):.3g}", flush=True)

    # TPU: value+grad accuracy
    args_t = [jax.device_put(x, tpu) for x in (kuu, p, b, big)]
    with jax.default_device(tpu):
        jvg = jax.jit(vg)
        t0 = time.time()
        got_v, got_g = jvg(*args_t)
        got_v = float(got_v)
        compile_s = time.time() - t0
        print(f"TPU value rel err: {abs(got_v-ref_v)/abs(ref_v):.3g} "
              f"(compile {compile_s:.0f}s)", flush=True)
        for name, r, g in zip(["g_kuu", "g_p", "g_b", "g_big"], ref_g, got_g):
            rel = float(np.abs(np.asarray(g) - r).max() / np.abs(r).max())
            print(f"  {name}: rel {rel:.3g}", flush=True)

        # amortized timing: chain ITERS dependent value+grad evaluations
        @jax.jit
        def chain(k0, p0, b0, big0):
            def body(carry, i):
                v, gs = vg(k0 + 1e-300 * carry, p0, b0, big0)
                return carry + v + 1e-300 * jnp.sum(gs[0]), 0.0

            c, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(ITERS))
            return c

        t0 = time.time()
        float(chain(*args_t))
        print(f"chain compile: {time.time()-t0:.0f}s", flush=True)
        ts = []
        for r in range(3):
            t0 = time.time()
            float(chain(args_t[0] + 1e-12 * r, *args_t[1:]))
            ts.append(time.time() - t0)
        per = float(np.median(ts)) / ITERS * 1000
        print(f"value+grad per step: {per:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
