"""DS block-banded ops (banded/block.py _ds variants over banded/dsx.py):
forced on CPU via the impl flag and compared against the plain f64 path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asvgp_tpu.banded import block
from asvgp_tpu.banded import ops as bops


@pytest.fixture
def ds_impl():
    bops.set_impl("pallas_ds")
    yield
    bops.set_impl("auto")


def make_block_banded(key, W, nb, B, diag=None):
    rng = np.random.RandomState(key)
    n = nb * B
    dense = rng.randn(n, n) * 0.2
    dense = dense @ dense.T + (diag or (2.0 * B)) * np.eye(n)
    # restrict to the block band
    out = np.zeros((W + 1, nb, B, B))
    for p in range(W + 1):
        for j in range(nb - p):
            out[p, j] = dense[(j + p) * B:(j + p + 1) * B, j * B:(j + 1) * B]
    return jnp.asarray(out)


@pytest.mark.parametrize("W,nb,B", [(1, 4, 6), (2, 5, 3)])
def test_block_cholesky_and_solves_ds(ds_impl, W, nb, B):
    blocks = make_block_banded(0, W, nb, B)
    got_l = block.cholesky_block_banded(blocks)
    bops.set_impl("auto")
    want_l = block.cholesky_block_banded(blocks)
    bops.set_impl("pallas_ds")
    np.testing.assert_allclose(np.asarray(got_l), np.asarray(want_l),
                               rtol=1e-11, atol=1e-11)

    b = jnp.asarray(np.random.RandomState(1).randn(nb * B))
    got_x = block.solve_lower_block_banded(got_l, b)
    got_y = block.solve_upper_block_banded_transpose(got_l, b)
    got_s = block.takahashi_inverse_block_banded(got_l)
    bops.set_impl("auto")
    want_x = block.solve_lower_block_banded(want_l, b)
    want_y = block.solve_upper_block_banded_transpose(want_l, b)
    want_s = block.takahashi_inverse_block_banded(want_l)
    bops.set_impl("pallas_ds")
    np.testing.assert_allclose(np.asarray(got_x), np.asarray(want_x),
                               rtol=1e-10, atol=1e-11)
    np.testing.assert_allclose(np.asarray(got_y), np.asarray(want_y),
                               rtol=1e-10, atol=1e-11)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                               rtol=1e-9, atol=1e-11)


def test_fused_sweep_matches_split_path():
    """The TPU-only fused Cholesky⊗inverse sweep (block_ds._fused_sweep_ds)
    must agree with the portable split path (diag sweep + tri-inv) that the
    CPU tests exercise everywhere else.  Outputs stay a raw tuple: stacking
    the hi/lo trees into one array is exactly the consumer shape that sends
    XLA:CPU's fusion into the superlinear-codegen hole this test guards."""
    from asvgp_tpu.banded import block_ds, ds

    B = 6
    rng = np.random.RandomState(7)
    dense = rng.randn(B, B) * 0.2
    a0 = dense @ dense.T + 2.0 * B * np.eye(B)
    mh, ml = ds.split_f64(jnp.asarray(a0))

    fh, fl, rih, ril = jax.jit(block_ds._fused_sweep_ds)(mh, ml)
    dh, dl = jax.jit(block_ds._diag_sweep_ds)(mh, ml)
    tril = np.tril(np.ones((B, B), bool))
    np.testing.assert_allclose(
        np.where(tril, np.asarray(fh) + np.asarray(fl), 0.0),
        np.where(tril, np.asarray(dh) + np.asarray(dl), 0.0),
        rtol=1e-13, atol=1e-15,
    )
    l0h = jnp.where(jnp.asarray(tril), dh, 0.0)
    l0l = jnp.where(jnp.asarray(tril), dl, 0.0)
    sih, sil = jax.jit(block_ds._tri_inv_one_ds)(l0h, l0l)
    got_iv = np.where(tril, np.asarray(rih) + np.asarray(ril), 0.0)
    want_iv = np.asarray(sih) + np.asarray(sil)
    np.testing.assert_allclose(got_iv, want_iv, rtol=1e-11, atol=1e-13)
    # and both must invert the factor
    lmat = np.where(tril, np.asarray(dh) + np.asarray(dl), 0.0)
    # (merged-f64 product of the DS pairs: expect ~1e-9, not full DS level)
    np.testing.assert_allclose(got_iv @ lmat, np.eye(B), atol=1e-7)


@pytest.mark.parametrize("W,nb,B", [(1, 3, 4), (2, 5, 3)])
def test_block_ds_gradients(ds_impl, W, nb, B):
    """Gradient of a logdet+solve scalar through the DS block ops must match
    the f64 autodiff path (exercises dsx custom VJPs through lax.scan).
    W>=2 exercises the broadcast-cotangent path in matmul_ds's VJP
    (_matmul_ds_batched against a (1,B,B) operand)."""
    blocks = make_block_banded(2, W, nb, B)
    b = jnp.asarray(np.random.RandomState(3).randn(nb * B))

    def loss(blk):
        l = block.cholesky_block_banded(blk)
        c = block.solve_lower_block_banded(l, b)
        return block.log_det_from_block_cholesky(l) + jnp.sum(c ** 2)

    got = jax.grad(loss)(blocks)
    bops.set_impl("auto")
    want = jax.grad(loss)(blocks)
    bops.set_impl("pallas_ds")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-7, atol=1e-9)
