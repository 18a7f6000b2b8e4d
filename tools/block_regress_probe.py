"""Bisect the round-3 eNATL exec regression (32.5 -> 213 s / 100 iters).

Round-2 phase baselines at eNATL shape (tools/kron_elbo_phase_probe.py,
CLAUDE.md): perdim 10.4 ms, block_chol_solve_grad 96.9 ms, full
value+grad 90 ms.  The round-3 ENATL run shows a ~6.5x exec regression
with IDENTICAL ELBO/iters, so it's a pure per-step slowdown.  Suspects
between b75cd5f..HEAD that touch the Kron TPU exec path:

  1. the panel rewrite (d996b8e): diag-only sweep + fused factor<=>inverse
     chain + MXU off-blocks, replacing the round-2 full-panel sweep;
  2. the jnp.pad -> zero-concat change inside the 1-D Mosaic kernels
     (84c00b6), which the per-dim ops run at m=100.

This probe times the phases separately under each panel variant
(ASVGP_PANEL / ASVGP_PANEL_FUSE) and scan-unroll factor
(ASVGP_BLOCK_UNROLL), all in one process (env is read at trace time).

Run on the TPU (relay free): python tools/block_regress_probe.py
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

M, W, NB, B = 100, 4, 100, 100
ITERS = 3
REPS = 2


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
    print(f"{name:44s} {per:10.3f} ms  (compile {compile_s:.1f}s)", flush=True)


def main():
    from asvgp_tpu import banded
    from asvgp_tpu.banded import block
    from asvgp_tpu.basis import B4Spline
    from asvgp_tpu.features.spline_features import make_kuu
    from asvgp_tpu.models import Matern32

    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    rng = np.random.RandomState(0)
    with jax.default_device(dev):
        kuu_band = make_kuu(Matern32(variance=1.0, lengthscales=0.2),
                            B4Spline(0.0, 1.0, M))
        # synthetic well-conditioned block-banded SPD operand (timing only)
        p = np.zeros((W + 1, NB, B, B))
        d = rng.randn(NB, B, B) * 0.05
        p[0] = 10.0 * np.eye(B)[None] + d + np.swapaxes(d, -1, -2)
        for q in range(1, W + 1):
            p[q, : NB - q] = rng.randn(NB - q, B, B) * (0.2 / W)
        p_blocks = jnp.asarray(p)
        b_vec = jnp.asarray(rng.randn(NB * B))
        jax.block_until_ready((kuu_band, p_blocks, b_vec))
        print("setup done", flush=True)

        results = {}

        # 1-D per-dim suspect (pad->concat in the Mosaic kernels)
        def perdim(a):
            lb = banded.cholesky_band(a[0])
            sb = banded.takahashi_inverse_band(lb)
            return banded.log_det_from_cholesky(lb) + jnp.sum(sb)

        time_one("perdim_grad[m=100] (r2: 10.4)",
                 lambda a: jax.grad(perdim)(a), (kuu_band,), results)

        def blockf(a):
            l_p = block.cholesky_block_banded(a[0])
            c = block.solve_lower_block_banded(l_p, a[1])
            return block.log_det_from_block_cholesky(l_p) + jnp.sum(jnp.square(c))

        def cholfwd(a):
            return block.cholesky_block_banded(a[0])

        configs = [
            ("new_fused", {"ASVGP_BLOCK_UNROLL": "1"}),
            ("new_fused_u4", {"ASVGP_BLOCK_UNROLL": "4"}),
            ("new_nofuse", {"ASVGP_BLOCK_UNROLL": "1", "ASVGP_PANEL_FUSE": "0"}),
            ("r2_full", {"ASVGP_BLOCK_UNROLL": "1", "ASVGP_PANEL": "full"}),
            ("r2_full_u4", {"ASVGP_BLOCK_UNROLL": "4", "ASVGP_PANEL": "full"}),
        ]
        values = {}
        for tag, env in configs:
            saved = {}
            for k in ("ASVGP_BLOCK_UNROLL", "ASVGP_PANEL", "ASVGP_PANEL_FUSE"):
                saved[k] = os.environ.pop(k, None)
            os.environ.update(env)
            try:
                time_one(f"block_chol_fwd[{tag}]",
                         lambda a: cholfwd(a), (p_blocks,), results)
                time_one(f"block_chol_solve_grad[{tag}] (r2: 96.9)",
                         lambda a: jax.grad(blockf)(a), (p_blocks, b_vec), results)
                values[tag] = float(jax.jit(blockf)((p_blocks, b_vec)))
            finally:
                for k, v in saved.items():
                    if v is None:
                        os.environ.pop(k, None)
                    else:
                        os.environ[k] = v

        ref = values[configs[0][0]]
        for tag, v in values.items():
            rel = abs(v - ref) / abs(ref)
            print(f"value[{tag}] = {v:.12e}  rel_vs_{configs[0][0]} = {rel:.2e}",
                  flush=True)
        results["values"] = values
        print(json.dumps(results))


if __name__ == "__main__":
    main()
