"""Per-phase timing of the DS kernel suite at the north-star size (m=10k, k=3).

Times each banded DS phase amortized inside one jit (CLAUDE.md: ~27ms
dispatch round-trip through the relay; block_until_ready may lie — force a
scalar to host).  Run on the TPU:  python tools/phase_bench.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)
import os

os.makedirs("/tmp/asvgp_jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/asvgp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp  # noqa: E402

M = 10_000
K = 3
ITERS = 20
REPS = 3


def make_spd_band(m, k, seed=0, diag=4.0):
    rng = np.random.RandomState(seed)
    band = rng.randn(k + 1, m) * 0.3
    band[0] = diag + np.abs(band[0])
    for j in range(1, k + 1):
        band[j, m - j:] = 0.0
    return jnp.asarray(band, jnp.float64)


def chain(fn, *args):
    """Chain ITERS dependent applications of fn inside one jit; returns
    (callable, representative output) — perturb input per iter via tiny
    data-dependent shift so nothing is CSE'd."""

    @jax.jit
    def run(a0, rest):
        def body(carry, i):
            out = fn(carry, *rest)
            # feed a scalar of the output back into the input
            s = 1e-300 * jnp.sum(out[0] if isinstance(out, tuple) else out)
            return a0 + s, 0.0

        c, _ = jax.lax.scan(body, a0, jnp.arange(ITERS))
        return jnp.sum(c)

    return run


def time_one(name, fn, a0, rest, results):
    run = chain(fn)
    t0 = time.time()
    float(run(a0, rest))
    compile_s = time.time() - t0
    ts = []
    for r in range(REPS):
        t0 = time.time()
        float(run(a0 + 1e-12 * r, rest))
        ts.append(time.time() - t0)
    per = float(np.median(ts)) / ITERS * 1000
    results[name] = round(per, 3)
    print(f"{name:28s} {per:8.3f} ms  (compile {compile_s:.1f}s)", flush=True)


def main():
    from asvgp_tpu.banded import pallas_ds as pd
    from asvgp_tpu.banded import pallas_ds_pair as pdp

    dev = jax.devices()[0]
    print("device:", dev, flush=True)

    a = jax.device_put(make_spd_band(M, K, 0), dev)
    b = jax.device_put(make_spd_band(M, K, 1, diag=6.0), dev)
    rhs = jax.device_put(jnp.asarray(np.random.RandomState(2).randn(M)), dev)

    l_a = jax.jit(pd.cholesky_band_fwd_ds)(a)
    s_a = jax.jit(pd.takahashi_fwd_ds)(l_a)
    cot = a * 0.5
    jax.block_until_ready((l_a, s_a))

    results = {}
    time_one("chol_fwd_single", lambda x: pd.cholesky_band_fwd_ds(x), a, (), results)
    time_one(
        "chol_fwd_pair",
        lambda x, y: pdp.cholesky_band_pair_fwd_ds(x, y)[0],
        a, (b,), results,
    )
    time_one(
        "chol_bwd_pair",
        lambda x, y, c1, c2: pdp.cholesky_band_pair_bwd_ds(x, y, c1, c2)[0],
        l_a, (l_a, cot, cot), results,
    )
    time_one("takahashi_fwd", lambda x: pd.takahashi_fwd_ds(x), l_a, (), results)
    time_one(
        "takahashi_bwd",
        lambda x, s, c: pd.takahashi_bwd_ds(x, s, c),
        l_a, (s_a, cot), results,
    )
    time_one("solve_lower", lambda x, v: pd.solve_lower_ds(x, v)[None, :], l_a, (rhs,), results)
    time_one("solve_upper_t", lambda x, v: pd.solve_upper_t_ds(x, v)[None, :], l_a, (rhs,), results)

    # --- new collapsed-core path (pallas_ds_core) --------------------------
    from asvgp_tpu.banded import pallas_ds_core as pdc

    time_one(
        "coreA+B_factor_tak_solve",
        lambda x, y, v: pdc.factor_takahashi_solve_ds(x, y, v)[2],
        a, (b, rhs), results,
    )
    time_one(
        "chol_bwd_single",
        lambda x, c: pd.cholesky_band_bwd_ds(x, c), l_a, (cot,), results,
    )
    iv = 1.0 / l_a[0]
    time_one(
        "tak_bwd_vec(v2)",
        lambda x, s, c, v: pdc.takahashi_bwd_vec_ds(x, s, c, v),
        l_a, (s_a, cot, iv), results,
    )

    def core_vg(x, y, v, bb):
        out = pdc.collapsed_core_ds(x, y, v, bb)
        val = out[0] - out[1] + out[2] + out[3]
        return val

    time_one(
        "collapsed_core_value_grad",
        lambda x, y, v, bb: jax.grad(core_vg)(x, y, v, bb),
        a, (b, rhs, a * 0.5), results,
    )

    print(json.dumps(results))


if __name__ == "__main__":
    main()
