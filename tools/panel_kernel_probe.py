"""TPU validation + timing of the dense-block DS Pallas kernel.

The eNATL block Cholesky is latency-bound in the per-block-column diagonal
sweep (tools/block_regress_probe.py: fwd 58.4 ms at nb=100, B=100, W=4 with
the XLA-level fused sweep).  pallas_ds_block.chol_inv_dense_ds moves the
whole B-step fused factor⊗inverse recursion into ONE Mosaic program.

This probe (a) checks kernel output vs the XLA fused sweep on an
ill-conditioned SPD block (values must agree to DS accuracy), (b) times
the block-banded Cholesky forward and the chol+solve+grad composite under
ASVGP_PANEL=kernel vs fused at eNATL shape.

Run on the TPU (relay free): python tools/panel_kernel_probe.py
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
    from asvgp_tpu.banded import block, block_ds, ds
    from asvgp_tpu.banded.pallas_ds_block import chol_inv_dense_ds

    from asvgp_tpu.utils.relay import ensure_tpu_ready

    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    print(f"relay ready in {ensure_tpu_ready(dev):.1f}s", flush=True)
    rng = np.random.RandomState(0)
    results = {}
    with jax.default_device(dev):
        # (a) correctness: ill-conditioned dense block, kernel vs XLA fused
        q, _ = np.linalg.qr(rng.randn(B, B))
        ev = np.logspace(0.0, -10.0, B)  # kappa 1e10
        m = jnp.asarray(q @ np.diag(ev) @ q.T)
        mh, ml = ds.split_f64(m)
        lh, ll, ivh, ivl = jax.jit(chol_inv_dense_ds)(mh, ml)
        l_kern = np.asarray(ds.merge_f64(lh, ll))
        iv_kern = np.asarray(ds.merge_f64(ivh, ivl))
        fl = jax.jit(block_ds._fused_sweep_ds)(mh, ml)
        tril = np.tril(np.ones((B, B), bool))
        l_ref = np.where(tril, np.asarray(ds.merge_f64(fl[0], fl[1])), 0.0)
        iv_ref = np.where(tril, np.asarray(ds.merge_f64(fl[2], fl[3])), 0.0)
        scale_l = np.abs(l_ref).max()
        scale_iv = np.abs(iv_ref).max()
        err_l = float(np.abs(l_kern - l_ref).max() / scale_l)
        err_iv = float(np.abs(iv_kern - iv_ref).max() / scale_iv)
        results["rel_err_l_vs_fused"] = err_l
        results["rel_err_inv_vs_fused"] = err_iv
        print(f"kernel vs fused: L {err_l:.2e}  Linv {err_iv:.2e}", flush=True)
        # vs CPU f64 oracle
        cpu = jax.devices("cpu")[0]
        l64 = np.linalg.cholesky(np.asarray(jax.device_put(m, cpu), np.float64))
        err64 = float(np.abs(l_kern - l64).max() / np.abs(l64).max())
        results["rel_err_l_vs_f64"] = err64
        print(f"kernel vs f64 oracle: L {err64:.2e}", flush=True)

        # (b) timing at eNATL shape
        p = np.zeros((W + 1, NB, B, B))
        d = rng.randn(NB, B, B) * 0.05
        p[0] = 10.0 * np.eye(B)[None] + d + np.swapaxes(d, -1, -2)
        for qq in range(1, W + 1):
            p[qq, : NB - qq] = rng.randn(NB - qq, B, B) * (0.2 / W)
        p_blocks = jnp.asarray(p)
        b_vec = jnp.asarray(rng.randn(NB * B))
        jax.block_until_ready((p_blocks, b_vec))

        def blockf(a):
            l_p = block.cholesky_block_banded(a[0])
            c = block.solve_lower_block_banded(l_p, a[1])
            return block.log_det_from_block_cholesky(l_p) + jnp.sum(jnp.square(c))

        values = {}
        for tag in ("kernel", "fused"):
            os.environ["ASVGP_PANEL"] = tag
            try:
                time_one(f"block_chol_fwd[{tag}]",
                         lambda a: block.cholesky_block_banded(a[0]),
                         (p_blocks,), results)
                time_one(f"block_chol_solve_grad[{tag}]",
                         lambda a: jax.grad(blockf)(a), (p_blocks, b_vec),
                         results)
                values[tag] = float(jax.jit(blockf)((p_blocks, b_vec)))
            finally:
                os.environ.pop("ASVGP_PANEL", None)
        rel = abs(values["kernel"] - values["fused"]) / abs(values["fused"])
        results["blockf_rel_diff"] = rel
        print(f"blockf kernel vs fused rel diff = {rel:.2e}", flush=True)
        print(json.dumps(results))


if __name__ == "__main__":
    main()
