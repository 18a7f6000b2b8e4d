"""Per-phase timing of the DS block-banded ops at the eNATL shape.

(W, nb, B) = (4, 100, 100) — the m=100x100 B4 Kronecker coupling system.
Decides the round-2 kernel design: if the matmul-only scan steps
(takahashi / solves given linv) are cheap and only the panel sweeps
(cholesky / tri-inv) are slow, a hybrid XLA-scan + Pallas-panel design
suffices; if every scan step is expensive, the sweeps must be fused into
single whole-matrix Pallas kernels.

Run on the TPU (relay free):  python tools/block_phase_probe.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import os
import time

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)
os.makedirs("/tmp/asvgp_jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/asvgp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp  # noqa: E402

W, NB, B = 4, 100, 100
ITERS = 3
REPS = 2


def make_spd_blocks(w, nb, b, seed=0):
    rng = np.random.RandomState(seed)
    blocks = np.zeros((w + 1, nb, b, b))
    blocks[0] = rng.randn(nb, b, b) * 0.1
    blocks[0] = 0.5 * (blocks[0] + blocks[0].transpose(0, 2, 1))
    blocks[0] += (b * 0.5 + 4.0) * np.eye(b)
    for p in range(1, w + 1):
        blocks[p] = rng.randn(nb, b, b) * 0.1
        blocks[p, nb - p:] = 0.0
    return jnp.asarray(blocks)


def time_one(name, fn, args, results):
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
    from asvgp_tpu.banded import block, block_ds, ds

    dev = jax.devices()[0]
    print("device:", dev, flush=True)

    blocks = jax.device_put(make_spd_blocks(W, NB, B), dev)
    rhs = jax.device_put(
        jnp.asarray(np.random.RandomState(3).randn(NB * B)), dev
    )

    l_blocks = jax.jit(block_ds.cholesky_block_banded_ds)(blocks)
    lh, ll = ds.split_f64(l_blocks[0])
    linv = jax.jit(block_ds.tri_inv_diag_blocks_ds)(lh, ll)
    jax.block_until_ready((l_blocks, linv))
    print("setup done", flush=True)

    results = {}
    time_one(
        "chol_fwd", lambda a: block_ds.cholesky_block_banded_ds(a[0]),
        (blocks,), results,
    )
    time_one(
        "tri_inv_diag",
        lambda a: block_ds.tri_inv_diag_blocks_ds(a[0], a[1]),
        (lh, ll), results,
    )
    time_one(
        "takahashi(linv)",
        lambda a: block_ds.takahashi_inverse_block_banded_ds(
            a[0], linv=(a[1], a[2])
        ),
        (l_blocks, linv[0], linv[1]), results,
    )
    time_one(
        "solve_lower(linv)",
        lambda a: block_ds.solve_lower_block_banded_ds(
            a[0], a[3], linv=(a[1], a[2])
        ),
        (l_blocks, linv[0], linv[1], rhs), results,
    )

    def chol_scalar(a):
        l = block.cholesky_block_banded(a)
        return block.log_det_from_block_cholesky(l)

    time_one(
        "chol_value_grad(adjoint)",
        lambda a: jax.grad(chol_scalar)(a[0]),
        (blocks,), results,
    )

    print(json.dumps(results))


if __name__ == "__main__":
    main()
