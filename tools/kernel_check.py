"""On-TPU DS-kernel parity artifact (VERDICT round-1, weak #6 / next #8).

Checks every double-single Pallas banded op — and their VJPs — against the
CPU float64 lax.scan reference path at the north-star size (m=10^4, k=3)
on REAL hardware, and writes a JSON of max relative errors to
KERNELCHECK.json at the repo root.  Also covers the fused collapsed-ELBO
core (values + all four closed-form band gradients) and the block-banded
DS ops at eNATL block shape (W=4, nb=25, B=100 — reduced nb to bound the
CPU-f64 reference time on this 1-core host; same per-step math).

Run (TPU relay free): python tools/kernel_check.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import os

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)
os.makedirs("/tmp/asvgp_jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/asvgp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp  # noqa: E402

K, M = 3, 10_000


def _rel(got, want):
    got = np.asarray(got, dtype=np.float64)
    want = np.asarray(want, dtype=np.float64)
    den = np.max(np.abs(want)) + 1e-300
    return float(np.max(np.abs(got - want)) / den)


def make_spd_band(k, m, seed=0, diag=2.0):
    rng = np.random.RandomState(seed)
    band = rng.randn(k + 1, m) * 0.1
    band[0] = diag + rng.rand(m)
    for j in range(1, k + 1):
        band[j, m - j:] = 0.0
    return band


def banded_checks(results):
    from asvgp_tpu.banded import ops

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    rng = np.random.RandomState(1)

    kuu = jnp.asarray(make_spd_band(K, M, seed=0))
    p = jnp.asarray(make_spd_band(K, M, seed=1, diag=5.0))
    b = jnp.asarray(rng.randn(M))
    mask = np.arange(K + 1)[:, None] + np.arange(M)[None, :] < M
    big = jnp.asarray(make_spd_band(K, M, seed=2) * mask)

    def run(device, impl):
        with jax.default_device(device), ops.impl_scope(impl):
            l = jax.jit(ops.cholesky_band)(kuu)
            s = jax.jit(ops.takahashi_inverse_band)(l)
            x_lo = jax.jit(ops.solve_lower_band)(l, b)
            x_up = jax.jit(ops.solve_upper_band_transpose)(l, x_lo)

            def core(args):
                kk, pp, bb, gg = args
                v = ops.collapsed_core(kk, pp, bb, gg)
                return (
                    v[0] + 2.0 * v[1] + 0.5 * v[2] + 0.25 * v[3],
                    jnp.stack(v),
                )

            (scalar, vals), grads = jax.jit(
                lambda a: jax.value_and_grad(core, has_aux=True)(a)
            )((kuu, p, b, big))
            out = dict(
                l=l, s=s, x_lo=x_lo, x_up=x_up, core_vals=vals,
                g_kuu=grads[0], g_p=grads[1], g_b=grads[2], g_big=grads[3],
            )
            return jax.tree.map(np.asarray, jax.block_until_ready(out))

    print("CPU f64 scan reference...", flush=True)
    ref = run(cpu, "scan")
    print("TPU DS kernels...", flush=True)
    got = run(tpu, "pallas_ds")
    for name in ref:
        results[f"banded_1d/{name}"] = _rel(got[name], ref[name])
        print(f"  {name:12s} rel err {results[f'banded_1d/{name}']:.3e}",
              flush=True)


def matern_core_checks(results):
    """Validate the PRODUCTION training path on hardware: GPR1D's loss
    routes through ops.collapsed_core_matern → the tangent-fused kernels
    (twisted by default since round 3), not the band-input collapsed_core
    checked above (VERDICT r2 missing #2 / next #5).  θ-structured value +
    gradients (var, ℓ, P, b, big) vs the CPU f64 scan path, at the
    north-star size."""
    from asvgp_tpu.banded import ops
    from asvgp_tpu.basis import B3Spline
    from asvgp_tpu.features.spline_features import make_kuu
    from asvgp_tpu.models.kernels import Matern

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    rng = np.random.RandomState(7)

    basis = B3Spline(0.0, 1.0, M)

    def kuu_fn(v, l):
        return make_kuu(Matern.tree_unflatten((3,), (v, l)), basis)

    var = jnp.asarray(1.3)
    ell = jnp.asarray(3.0 / M)
    mask = np.arange(K + 1)[:, None] + np.arange(M)[None, :] < M
    big = jnp.asarray(make_spd_band(K, M, seed=8) * mask)
    p = big / 0.4 + kuu_fn(var, ell)
    b = jnp.asarray(rng.randn(M))

    def run(device, impl, twist):
        with jax.default_device(device), ops.impl_scope(impl), \
                ops.twist_scope(twist):

            def f(args):
                v, l, pb, bb, gg = args
                outs = ops.collapsed_core_matern(kuu_fn, v, l, pb, bb, gg)
                return (
                    outs[0] + 2.0 * outs[1] + 0.5 * outs[2] + 0.25 * outs[3],
                    jnp.stack(outs),
                )

            (scalar, vals), grads = jax.jit(
                lambda a: jax.value_and_grad(f, has_aux=True)(a)
            )((var, ell, p, b, big))
            out = dict(
                core_vals=vals, g_var=grads[0], g_ell=grads[1],
                g_p=grads[2], g_b=grads[3], g_big=grads[4],
            )
            return jax.tree.map(np.asarray, jax.block_until_ready(out))

    print("CPU f64 scan reference (matern core)...", flush=True)
    ref = run(cpu, "scan", None)
    print("TPU tangent-fused DS (twisted, production default)...", flush=True)
    got_tw = run(tpu, "pallas_ds", True)
    print("TPU tangent-fused DS (untwisted)...", flush=True)
    got_un = run(tpu, "pallas_ds", False)
    for name in ref:
        results[f"matern_core/{name}"] = _rel(got_tw[name], ref[name])
        results[f"matern_core_untwisted/{name}"] = _rel(
            got_un[name], ref[name]
        )
        print(
            f"  {name:12s} twist {results[f'matern_core/{name}']:.3e}"
            f"  untwist {results[f'matern_core_untwisted/{name}']:.3e}",
            flush=True,
        )


def block_checks(results):
    from asvgp_tpu.banded import block

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    W, NB, B = 4, 25, 100
    rng = np.random.RandomState(3)
    blocks = np.zeros((W + 1, NB, B, B))
    blocks[0] = rng.randn(NB, B, B) * 0.1
    blocks[0] = 0.5 * (blocks[0] + blocks[0].transpose(0, 2, 1))
    blocks[0] += (B * 0.5 + 4.0) * np.eye(B)
    for pp in range(1, W + 1):
        blocks[pp] = rng.randn(NB, B, B) * 0.1
        blocks[pp, NB - pp:] = 0.0
    blocks = jnp.asarray(blocks)
    rhs = jnp.asarray(rng.randn(NB * B))

    def run(device):
        with jax.default_device(device):
            l = jax.jit(block.cholesky_block_banded)(blocks)
            s = jax.jit(block.takahashi_inverse_block_banded)(l)
            x = jax.jit(block.cholesky_solve_block_banded)(l, rhs)

            def f(a):
                ll = block.cholesky_block_banded(a)
                c = block.solve_lower_block_banded(ll, rhs)
                return block.log_det_from_block_cholesky(ll) + jnp.sum(
                    jnp.square(c)
                )

            g = jax.jit(jax.grad(f))(blocks)
            out = dict(l=l, s=s, x=x, g=g)
            return jax.tree.map(np.asarray, jax.block_until_ready(out))

    print("CPU f64 block reference...", flush=True)
    ref = run(cpu)
    print("TPU DS block ops...", flush=True)
    got = run(tpu)
    for name in ref:
        results[f"block/{name}"] = _rel(got[name], ref[name])
        print(f"  {name:12s} rel err {results[f'block/{name}']:.3e}",
              flush=True)


def kron_stats_checks(results):
    """Round-4 batched pair-product Kronecker stats build (stats/kron.py)
    vs the CPU f64 oracle at an eNATL-ish shape (VERDICT r4 weak #5).
    The build is sorted-cumsum + gather assembly (no recursions), so TPU
    f64 emulation should hold ~1e-13."""
    from asvgp_tpu.basis import BSplineBasis
    from asvgp_tpu.stats.kron import compute_kron_stats

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    n, m = 200_000, 60
    rng = np.random.RandomState(7)
    X = jnp.asarray(rng.uniform(0.02, 0.98, (n, 2)))
    y = jnp.asarray(rng.randn(n))
    bases = [BSplineBasis(0.0, 1.0, m, 4)] * 2

    def run(device):
        with jax.default_device(device):
            s = jax.jit(lambda xx, yy: compute_kron_stats(bases, xx, yy))(
                X, y)
            return jax.tree.map(np.asarray, jax.block_until_ready(s))

    print("CPU f64 kron-stats reference...", flush=True)
    ref = run(cpu)
    print("TPU kron-stats build...", flush=True)
    got = run(tpu)
    for name in ("kuf_y", "t_band", "yty"):
        results[f"kron_stats/{name}"] = _rel(
            getattr(got, name), getattr(ref, name))
        print(f"  {name:12s} rel err {results[f'kron_stats/{name}']:.3e}",
              flush=True)


def svgp_checks(results):
    """Round-4 prior-anchored banded-precision SVGP path (models/svgp.py):
    ELBO value+grad and predict mean/var vs the CPU f64 oracle
    (VERDICT r4 weak #5)."""
    from asvgp_tpu.basis import B3Spline
    from asvgp_tpu.models import Matern32
    from asvgp_tpu.models.svgp import SVGP1D

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    n, m = 5000, 200
    rng = np.random.RandomState(11)
    X = jnp.asarray(np.sort(rng.uniform(0.01, 0.99, n)))
    y = jnp.asarray(np.sin(40 * np.asarray(X)) + 0.3 * rng.randn(n))
    model = SVGP1D(Matern32(variance=1.0, lengthscales=0.05),
                   B3Spline(0.0, 1.0, m), noise_variance=0.1)
    params0 = model.init_params()
    # move off the C=0 stationary point so the banded-precision terms are
    # genuinely exercised
    params0 = jax.tree.map(
        lambda a: a + 0.01 * jnp.asarray(
            np.random.RandomState(13).randn(*a.shape)), params0)
    xq = jnp.asarray(rng.uniform(0.05, 0.95, 512))

    def run(device):
        with jax.default_device(device):
            val, grad = jax.jit(
                jax.value_and_grad(lambda p: model.training_loss(p, X, y))
            )(params0)
            mean, var = jax.jit(model.predict_f)(params0, xq)
            out = dict(val=val, mean=mean, var=var,
                       grad=jnp.concatenate([
                           jnp.ravel(g) for g in jax.tree.leaves(grad)]))
            return jax.tree.map(np.asarray, jax.block_until_ready(out))

    print("CPU f64 SVGP reference...", flush=True)
    ref = run(cpu)
    print("TPU SVGP banded-precision path...", flush=True)
    got = run(tpu)
    for name in ref:
        results[f"svgp/{name}"] = _rel(got[name], ref[name])
        print(f"  {name:12s} rel err {results[f'svgp/{name}']:.3e}",
              flush=True)


def main():
    results = {"m": M, "k": K, "device": str(jax.devices()[0])}
    banded_checks(results)
    matern_core_checks(results)
    block_checks(results)
    kron_stats_checks(results)
    svgp_checks(results)
    worst = max(
        v for kk, v in results.items() if isinstance(v, float)
    )
    results["worst_rel_err"] = worst
    results["pass"] = bool(worst < 1e-8)
    path = os.path.join(os.path.dirname(__file__), "..", "KERNELCHECK.json")
    with open(os.path.abspath(path), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"worst_rel_err": worst, "pass": results["pass"]}))


if __name__ == "__main__":
    main()
