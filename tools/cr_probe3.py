"""CR-on-TPU probe 3: amortized (chained) timings for the solve fix and the
FULL collapsed-core value+grad (second-order through the trace term)."""

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
ITERS = 20


def random_band(key, m, k, diag=2.0):
    kl, kd = jax.random.split(jax.random.PRNGKey(key))
    l0 = jax.random.normal(kl, (k + 1, m), jnp.float64) * 0.3
    l0 = l0.at[0].set(diag + jax.random.uniform(kd, (m,), jnp.float64))
    l0 = banded.mask_lower_band(l0)
    L0 = banded.lower_band_to_dense(l0)
    return banded.dense_to_lower_band(L0 @ L0.T, k)


def core(kuu, p, b, big):
    ld_p, u = cyclic.cr_logdet_solve(p, b)
    return (
        cyclic.cr_logdet(kuu)
        - 1.3 * ld_p
        + 0.11 * jnp.vdot(b, u)
        + 0.37 * cyclic.cr_trace(kuu, big)
    )


def chain_time(name, fn, args, n_state=0):
    """fn(*args) -> scalar (or pytree); chain ITERS dependent evals."""

    @jax.jit
    def run(a0, rest):
        def body(carry, i):
            out = fn(a0 + 1e-300 * carry, *rest)
            s = sum(jnp.sum(o) for o in jax.tree.leaves(out))
            return carry + s, 0.0

        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float64),
                            jnp.arange(ITERS))
        return c

    t0 = time.time()
    float(run(args[0], args[1:]))
    compile_s = time.time() - t0
    ts = []
    for r in range(3):
        t0 = time.time()
        float(run(args[0] + 1e-12 * r, args[1:]))
        ts.append(time.time() - t0)
    per = float(np.median(ts)) / ITERS * 1000
    print(f"{name:28s} compile {compile_s:7.1f}s  {per:8.3f} ms/iter",
          flush=True)


def main():
    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    with jax.default_device(cpu):
        a = random_band(10, M, K)
        p = random_band(11, M, K, diag=4.0)
        b = jax.random.normal(jax.random.PRNGKey(12), (M,), jnp.float64)
        big = random_band(13, M, K, diag=3.0)
        ref_v = float(jax.jit(core)(a, p, b, big))
    at, pt, bt, bigt = (jax.device_put(x, tpu) for x in (a, p, b, big))
    with jax.default_device(tpu):
        got_v = float(jax.jit(core)(at, pt, bt, bigt))
        print(f"core value rel err: {abs(got_v-ref_v)/abs(ref_v):.3g}",
              flush=True)
        chain_time("cr_solve (chained)",
                   lambda p_, b_: jnp.sum(cyclic.cr_solve(p_, b_)),
                   (pt, bt))
        chain_time("core value (chained)", core, (at, pt, bt, bigt))
        vg = jax.value_and_grad(core, argnums=(0, 1, 2, 3))
        chain_time("core value+grad (chained)",
                   lambda *xs: vg(*xs), (at, pt, bt, bigt))


if __name__ == "__main__":
    main()
