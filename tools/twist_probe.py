"""TPU probe for the twisted quad collapsed-core kernels (pallas_ds_twist).

1. correctness at m=512: twisted sweep outputs vs the untwisted tangent
   path (factor_takahashi_solve_tan_ds), and full custom-VJP gradients of
   collapsed_core_matern_twist_ds vs reverse AD through the f64 scan path
   on CPU.
2. timing at m=10⁴: value-and-grad of the twisted vs untwisted Matérn
   collapsed core (untwisted baseline: 22.0 ms/step).
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
from asvgp_tpu.banded import ops as bops  # noqa: E402
from asvgp_tpu.banded import pallas_ds_tan as pdt  # noqa: E402
from asvgp_tpu.banded import pallas_ds_twist as pdw  # noqa: E402
from asvgp_tpu.basis import B3Spline  # noqa: E402
from asvgp_tpu.features.spline_features import make_kuu  # noqa: E402
from asvgp_tpu.models.kernels import Matern  # noqa: E402

K = 3
ITERS = 20


def random_band(key, m, k, diag=2.0):
    kl, kd = jax.random.split(jax.random.PRNGKey(key))
    l0 = jax.random.normal(kl, (k + 1, m), jnp.float64) * 0.3
    l0 = l0.at[0].set(diag + jax.random.uniform(kd, (m,), jnp.float64))
    l0 = banded.mask_lower_band(l0)
    L0 = banded.lower_band_to_dense(l0)
    return banded.dense_to_lower_band(L0 @ L0.T, k)


def rel(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    den = np.maximum(np.abs(b).max(), 1e-30)
    return float(np.abs(a - b).max() / den)


def correctness(m=512):
    k = K
    kuu = random_band(0, m, k)
    tan = random_band(1, m, k, diag=0.0) * 0.3
    p = random_band(2, m, k, diag=6.0)
    b = jax.random.normal(jax.random.PRNGKey(5), (m,), jnp.float64)

    tw = jax.jit(pdw.factor_takahashi_solve_tan_twist)(kuu, tan, p, b)
    un = jax.jit(pdt.factor_takahashi_solve_tan_ds)(kuu, tan, p, b)
    l_kuu, l_p, s_kuu, s_p, c0, u, iv, sdot = un
    names = ("ld_kuu", "ld_p", "quad", "s_kuu", "s_p", "u", "sdot")
    refs = (
        2.0 * jnp.sum(jnp.log(l_kuu[0])),
        2.0 * jnp.sum(jnp.log(l_p[0])),
        jnp.sum(jnp.square(c0)),
        s_kuu, s_p, u, sdot,
    )
    worst = 0.0
    for got, want, name in zip(tw, refs, names):
        e = rel(got, want)
        worst = max(worst, e)
        print(f"  twist {name:8s} rel err {e:.3e}", flush=True)

    # full custom-VJP gradients on a Matérn Kuu vs the CPU f64 scan path
    basis = B3Spline(0.0, 1.0, m)

    def kuu_fn(v, l):
        return make_kuu(Matern.tree_unflatten((3,), (v, l)), basis)

    var = jnp.asarray(1.3)
    ell = jnp.asarray(3.0 / m)
    big = random_band(3, m, k)
    pb = big / 0.4 + kuu_fn(var, ell)

    def combo(outs):
        ldk, ldp, quad, tr = outs
        return ldk - 1.3 * ldp + 0.11 * quad + 0.37 * tr

    def f_tw(v, l, pb_, bb, gg):
        return combo(
            pdw.collapsed_core_matern_twist_ds(kuu_fn, v, l, pb_, bb, gg)
        )

    val_tw, g_tw = jax.jit(
        jax.value_and_grad(f_tw, argnums=(0, 1, 2, 3, 4))
    )(var, ell, pb, b, big)

    cpu = jax.devices("cpu")[0]

    def f_scan(v, l, pb_, bb, gg):
        with bops.impl_scope("scan"):
            return combo(banded.collapsed_core(kuu_fn(v, l), pb_, bb, gg))

    with jax.default_device(cpu):
        val_sc, g_sc = jax.jit(
            jax.value_and_grad(f_scan, argnums=(0, 1, 2, 3, 4))
        )(var, ell, pb, b, big)
    print(f"  core value        rel err {rel(val_tw, val_sc):.3e}", flush=True)
    for gd, gs, name in zip(g_tw, g_sc, ("var", "ell", "p", "b", "big")):
        e = rel(gd, gs)
        worst = max(worst, e)
        print(f"  grad {name:12s} rel err {e:.3e}", flush=True)
    return worst


def timing(m=10_000):
    k = K
    basis = B3Spline(0.0, 1.0, m)

    def kuu_fn(v, l):
        return make_kuu(Matern.tree_unflatten((3,), (v, l)), basis)

    var = jnp.asarray(1.3)
    ell = jnp.asarray(3.0 / m)
    big = random_band(3, m, k)
    pb = big / 0.4 + kuu_fn(var, ell)
    b = jax.random.normal(jax.random.PRNGKey(5), (m,), jnp.float64)

    def combo(outs):
        ldk, ldp, quad, tr = outs
        return ldk - 1.3 * ldp + 0.11 * quad + 0.37 * tr

    def time_one(name, core):
        def f(v, l, pb_, bb, gg):
            return combo(core(kuu_fn, v, l, pb_, bb, gg))

        vg = jax.value_and_grad(f, argnums=(0, 1, 2, 3, 4))

        @jax.jit
        def run(v0, rest):
            def body(carry, i):
                val, g = vg(v0 + 1e-300 * carry, *rest)
                s = val + sum(jnp.sum(o) for o in jax.tree.leaves(g))
                return carry + s, 0.0

            c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float64),
                                jnp.arange(ITERS))
            return c

        t0 = time.time()
        float(run(var, (ell, pb, b, big)))
        comp = time.time() - t0
        ts = []
        for r in range(3):
            t0 = time.time()
            float(run(var + 1e-12 * r, (ell, pb, b, big)))
            ts.append(time.time() - t0)
        per = float(np.median(ts)) / ITERS * 1000
        print(f"  {name:32s} {per:8.3f} ms  (compile {comp:.1f}s)", flush=True)
        return per

    t_un = time_one("value+grad untwisted (22.0 ref)",
                    pdt.collapsed_core_matern_ds)
    t_tw = time_one("value+grad TWISTED",
                    pdw.collapsed_core_matern_twist_ds)
    print(f"  speedup {t_un / t_tw:.2f}x", flush=True)


if __name__ == "__main__":
    print("correctness m=512", flush=True)
    worst = correctness()
    print(f"worst rel err {worst:.3e}", flush=True)
    if "--timing" in _sys.argv:
        print("timing m=10000", flush=True)
        timing()
