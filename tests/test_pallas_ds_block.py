"""Dense-block DS Pallas kernel tests (interpret mode): the fused
Cholesky ⊗ triangular-inverse block kernel (banded/pallas_ds_block.py)
must match f64 and drop into panel_chol_ds unchanged."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asvgp_tpu.banded import ds
from asvgp_tpu.banded import block_ds
from asvgp_tpu.banded import pallas_ds_block as pdb
from asvgp_tpu.banded import pallas_kernels as pk


@pytest.fixture(autouse=True)
def _interp():
    pk.set_interpret(True)
    yield
    pk.set_interpret(False)


def random_spd(key, b, kappa=1.0):
    rng = np.random.RandomState(key)
    q, _ = np.linalg.qr(rng.randn(b, b))
    ev = np.logspace(0.0, -np.log10(max(kappa, 1.0)), b)
    return jnp.asarray(q @ np.diag(ev) @ q.T, jnp.float64)


@pytest.mark.parametrize("b", [4, 16, 24])
def test_dense_chol_inv_matches_f64(b):
    m = random_spd(0, b)
    mh, ml = ds.split_f64(m)
    lh, ll, ivh, ivl = pdb.chol_inv_dense_ds(mh, ml)
    l = np.asarray(ds.merge_f64(lh, ll))
    iv = np.asarray(ds.merge_f64(ivh, ivl))
    want_l = np.linalg.cholesky(np.asarray(m))
    np.testing.assert_allclose(l, want_l, rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(iv, np.linalg.inv(want_l), rtol=1e-11, atol=1e-12)
    # exactly lower-triangular (strict upper == 0, not just small)
    assert np.all(np.triu(l, 1) == 0.0)
    assert np.all(np.triu(iv, 1) == 0.0)


def test_dense_chol_inv_ill_conditioned():
    """DS must hold f64-like accuracy through κ ~ 1e10."""
    m = random_spd(1, 16, kappa=1e10)
    mh, ml = ds.split_f64(m)
    lh, ll, ivh, ivl = pdb.chol_inv_dense_ds(mh, ml)
    l = np.asarray(ds.merge_f64(lh, ll))
    want_l = np.linalg.cholesky(np.asarray(m))
    err = np.abs(l - want_l)
    scale = np.abs(want_l).max()
    assert float(err.max() / scale) < 1e-9


def test_panel_kernel_variant_matches_nofuse():
    """panel_chol_ds(variant='kernel') == variant='nofuse' to DS accuracy."""
    W, B = 2, 8
    rng = np.random.RandomState(2)
    s = np.zeros((W + 1, B, B))
    d = rng.randn(B, B)
    s[0] = 5.0 * np.eye(B) + d + d.T
    s[1:] = rng.randn(W, B, B) * 0.3
    sh, sl = ds.split_f64(jnp.asarray(s))
    got = block_ds.panel_chol_ds(sh, sl, variant="kernel")
    want = block_ds.panel_chol_ds(sh, sl, variant="nofuse")
    np.testing.assert_allclose(
        np.asarray(ds.merge_f64(*got)),
        np.asarray(ds.merge_f64(*want)),
        rtol=1e-11, atol=1e-12,
    )


@pytest.mark.slow
def test_dense_chol_inv_b100():
    """eNATL block size (B=100) through the kernel in interpret mode."""
    m = random_spd(3, 100, kappa=1e6)
    mh, ml = ds.split_f64(m)
    lh, ll, ivh, ivl = pdb.chol_inv_dense_ds(mh, ml)
    l = np.asarray(ds.merge_f64(lh, ll))
    want_l = np.linalg.cholesky(np.asarray(m))
    err = np.abs(l - want_l)
    assert float(err.max() / np.abs(want_l).max()) < 1e-10
