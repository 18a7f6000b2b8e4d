"""TPU probe for the tangent-fused collapsed-core kernels (pallas_ds_tan).

1. correctness at m=512: primal outputs vs factor_takahashi_solve_ds, the
   tangent band Ṡ vs the dense identity −band(K⁻¹TK⁻¹), and the full
   custom-VJP gradients vs reverse AD through the f64 scan path (CPU).
2. timing at m=10⁴: A′+B′ amortized inside one jit, and the full
   value-and-grad of the θ-structured collapsed core, vs the current
   4-sweep path (26.9 ms in tools/phase_bench.py).
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
from asvgp_tpu.banded import pallas_ds_core as pdc  # noqa: E402
from asvgp_tpu.banded import pallas_ds_tan as pdt  # noqa: E402
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

    outs = jax.jit(pdt.factor_takahashi_solve_tan_ds)(kuu, tan, p, b)
    ref = jax.jit(pdc.factor_takahashi_solve_ds)(kuu, p, b)
    names = ("l_kuu", "l_p", "s_kuu", "s_p", "c0", "u", "iv_kuu")
    for got, want, name in zip(outs[:7], ref, names):
        print(f"  primal {name:8s} rel err {rel(got, want):.3e}", flush=True)

    # dense reference for the tangent band
    Kd = np.asarray(banded.lower_band_to_dense(kuu))
    Kd = Kd + Kd.T - np.diag(np.diag(Kd))
    Td = np.asarray(banded.lower_band_to_dense(tan))
    Td = Td + Td.T - np.diag(np.diag(Td))
    Kinv = np.linalg.inv(Kd)
    Sdot = -Kinv @ Td @ Kinv
    sdot_band = np.stack(
        [np.pad(np.diag(Sdot, -j), (0, j)) for j in range(k + 1)]
    )
    print(f"  tangent sdot      rel err {rel(outs[7], sdot_band):.3e}",
          flush=True)

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

    def f_ds(v, l, pb_, bb, gg):
        return combo(pdt.collapsed_core_matern_ds(kuu_fn, v, l, pb_, bb, gg))

    val_ds, g_ds = jax.jit(
        jax.value_and_grad(f_ds, argnums=(0, 1, 2, 3, 4))
    )(var, ell, pb, b, big)

    cpu = jax.devices("cpu")[0]

    def f_scan(v, l, pb_, bb, gg):
        with bops.impl_scope("scan"):
            return combo(banded.collapsed_core(kuu_fn(v, l), pb_, bb, gg))

    with jax.default_device(cpu):
        val_sc, g_sc = jax.jit(
            jax.value_and_grad(f_scan, argnums=(0, 1, 2, 3, 4))
        )(var, ell, pb, b, big)
    print(f"  core value        rel err {rel(val_ds, val_sc):.3e}", flush=True)
    for gd, gs, name in zip(g_ds, g_sc, ("var", "ell", "p", "b", "big")):
        print(f"  grad {name:12s} rel err {rel(gd, gs):.3e}", flush=True)


def timing(m=10_000):
    k = K
    kuu = random_band(0, m, k)
    tan = random_band(1, m, k, diag=0.0) * 0.3
    p = random_band(2, m, k, diag=6.0)
    b = jax.random.normal(jax.random.PRNGKey(5), (m,), jnp.float64)

    def chain(fn):
        @jax.jit
        def run(a0, rest):
            def body(carry, i):
                out = fn(a0 + 1e-300 * carry, *rest)
                s = sum(jnp.sum(o) for o in jax.tree.leaves(out))
                return carry + s, 0.0

            c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float64),
                                jnp.arange(ITERS))
            return c

        return run

    def time_one(name, fn, a0, rest):
        run = chain(fn)
        t0 = time.time()
        float(run(a0, rest))
        comp = time.time() - t0
        ts = []
        for r in range(3):
            t0 = time.time()
            float(run(a0 + 1e-12 * r, rest))
            ts.append(time.time() - t0)
        per = float(np.median(ts)) / ITERS * 1000
        print(f"  {name:32s} {per:8.3f} ms  (compile {comp:.1f}s)", flush=True)
        return per

    time_one("A'+B' tan (fwd+jvp)",
             lambda x, t, y, v: pdt.factor_takahashi_solve_tan_ds(x, t, y, v)[2],
             kuu, (tan, p, b))
    time_one("A+B primal (ref)",
             lambda x, y, v: pdc.factor_takahashi_solve_ds(x, y, v)[2],
             kuu, (p, b))

    # full value+grad at the bench shape on a Matérn Kuu
    basis = B3Spline(0.0, 1.0, m)

    def kuu_fn(v, l):
        return make_kuu(Matern.tree_unflatten((3,), (v, l)), basis)

    var = jnp.asarray(1.1)
    ell = jnp.asarray(3.0 / m)
    big = random_band(3, m, k)
    pb = big / 0.4 + kuu_fn(var, ell)

    def combo(outs):
        ldk, ldp, quad, tr = outs
        return ldk - 1.3 * ldp + 0.11 * quad + 0.37 * tr

    def vg_new(v, rest):
        l, pb_, bb, gg = rest
        g = jax.grad(
            lambda vv, ll, pp, bbb, ggg: combo(
                pdt.collapsed_core_matern_ds(kuu_fn, vv, ll, pp, bbb, ggg)
            ),
            argnums=(0, 1, 2),
        )(v, l, pb_, bb, gg)
        return g

    def vg_old(v, rest):
        l, pb_, bb, gg = rest
        g = jax.grad(
            lambda vv, ll, pp, bbb, ggg: combo(
                banded.collapsed_core(kuu_fn(vv, ll), pp, bbb, ggg)
            ),
            argnums=(0, 1, 2),
        )(v, l, pb_, bb, gg)
        return g

    time_one("core value+grad NEW (tan)", vg_new, var, ((ell, pb, b, big),))
    time_one("core value+grad OLD (adjoints)", vg_old, var, ((ell, pb, b, big),))


if __name__ == "__main__":
    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    print("correctness @ m=512", flush=True)
    correctness()
    print("timing @ m=10000", flush=True)
    timing()
