"""Double-single Pallas kernel tests: f64-equivalent accuracy (interpret mode),
including the genuinely ill-conditioned spline Kuu where plain float32
recursions diverge (the motivating case — see banded/pallas_ds.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asvgp_tpu import banded
from asvgp_tpu.banded import ops as bops
from asvgp_tpu.banded import pallas_ds as pd
from asvgp_tpu.banded import pallas_kernels as pk


@pytest.fixture(autouse=True)
def _interp():
    pk.set_interpret(True)
    yield
    pk.set_interpret(False)


def random_band(key, m, k):
    kl, kd = jax.random.split(jax.random.PRNGKey(key))
    l0 = jax.random.normal(kl, (k + 1, m), jnp.float64) * 0.3
    l0 = l0.at[0].set(2.0 + jax.random.uniform(kd, (m,), jnp.float64))
    l0 = banded.mask_lower_band(l0)
    L0 = banded.lower_band_to_dense(l0)
    return banded.dense_to_lower_band(L0 @ L0.T, k)


def ill_conditioned_kuu(m=384):
    from asvgp_tpu.basis import B3Spline
    from asvgp_tpu.features.spline_features import make_kuu
    from asvgp_tpu.models import Matern32

    return make_kuu(Matern32(), B3Spline(0.0, 1.0, m))


@pytest.mark.parametrize("m,k", [(40, 1)])
def test_ds_cholesky_matches_f64(m, k):
    a = random_band(0, m, k)
    got = pd.cholesky_band_ds(a)
    want = bops.cholesky_band(a)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-11, atol=1e-12)


@pytest.mark.slow
def test_ds_cholesky_on_ill_conditioned_kuu():
    """f32 diverges/NaNs on this matrix; DS must match f64 tightly."""
    kuu = ill_conditioned_kuu()
    got = pd.cholesky_band_ds(kuu)
    want = bops.cholesky_band(kuu)
    assert np.all(np.isfinite(np.asarray(got)))
    # row-scaled error: interior is ~1e-12; the last boundary columns have
    # collapsing pivots where cancellation legitimately costs DS a few digits
    err = np.abs(np.asarray(got) - np.asarray(want))
    scale = np.abs(np.asarray(want)).max(axis=1, keepdims=True)
    assert float((err / scale).max()) < 1e-6
    # the quantities the ELBO consumes: logdet to ~1e-9, Takahashi band /
    # trace contractions to ~1e-4 (boundary-column cancellation; the f32
    # recursion diverges to NaN on this matrix, so this is the win)
    np.testing.assert_allclose(
        2 * np.sum(np.log(np.asarray(got)[0])),
        2 * np.sum(np.log(np.asarray(want)[0])),
        rtol=1e-8,
    )
    s = pd.takahashi_inverse_band_ds(got)
    s_want = bops.takahashi_inverse_band(want)
    rel = np.max(np.abs(np.asarray(s) - np.asarray(s_want))) / np.max(
        np.abs(np.asarray(s_want))
    )
    assert rel < 1e-4


@pytest.mark.slow
def test_ds_pair_cholesky_matches_two_singles():
    from asvgp_tpu.banded import pallas_ds_pair as pdp

    a = random_band(10, 40, 3)
    b = random_band(11, 40, 3)
    la, lb = pdp.cholesky_band_pair_ds(a, b)
    np.testing.assert_allclose(
        np.asarray(la), np.asarray(bops.cholesky_band(a)), rtol=1e-11, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(lb), np.asarray(bops.cholesky_band(b)), rtol=1e-11, atol=1e-12
    )
    # pair VJP against scan autodiff
    ca = banded.mask_lower_band(jax.random.normal(jax.random.PRNGKey(12), a.shape))
    cb = banded.mask_lower_band(jax.random.normal(jax.random.PRNGKey(13), b.shape))
    ga, gb = jax.grad(
        lambda x, y: jnp.vdot(pdp.cholesky_band_pair_ds(x, y)[0], ca)
        + jnp.vdot(pdp.cholesky_band_pair_ds(x, y)[1], cb),
        argnums=(0, 1),
    )(a, b)
    bops.set_impl("scan")
    try:
        wga, wgb = jax.grad(
            lambda x, y: jnp.vdot(bops.cholesky_band(x), ca)
            + jnp.vdot(bops.cholesky_band(y), cb),
            argnums=(0, 1),
        )(a, b)
    finally:
        bops.set_impl("auto")
    np.testing.assert_allclose(np.asarray(ga), np.asarray(wga), rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(wgb), rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("m,k", [(40, 1)])
def test_ds_takahashi_and_solves_match_f64(m, k):
    a = random_band(1, m, k)
    l = bops.cholesky_band(a)
    got = pd.takahashi_inverse_band_ds(l)
    want = bops.takahashi_inverse_band(l)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-10, atol=1e-12)

    b = jax.random.normal(jax.random.PRNGKey(3), (m,), jnp.float64)
    np.testing.assert_allclose(
        np.asarray(pd.solve_lower_band_ds(l, b)),
        np.asarray(bops.solve_lower_band(l, b)),
        rtol=1e-11, atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(pd.solve_upper_band_transpose_ds(l, b)),
        np.asarray(bops.solve_upper_band_transpose(l, b)),
        rtol=1e-11, atol=1e-12,
    )


@pytest.mark.slow
@pytest.mark.parametrize("m,k", [(20, 2), (18, 3)])
def test_ds_vjps_match_autodiff(m, k):
    a = random_band(2, m, k)
    cot = banded.mask_lower_band(
        jax.random.normal(jax.random.PRNGKey(7), a.shape, jnp.float64)
    )
    got = jax.grad(lambda x: jnp.vdot(pd.cholesky_band_ds(x), cot))(a)
    bops.set_impl("scan")
    try:
        want = jax.grad(lambda x: jnp.vdot(bops.cholesky_band(x), cot))(a)
    finally:
        bops.set_impl("auto")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-9)

    l = bops.cholesky_band(a)
    got_t = jax.grad(lambda x: jnp.vdot(pd.takahashi_inverse_band_ds(x), cot))(l)
    bops.set_impl("scan")
    try:
        want_t = jax.grad(lambda x: jnp.vdot(bops.takahashi_inverse_band(x), cot))(l)
    finally:
        bops.set_impl("auto")
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(want_t), rtol=1e-6, atol=1e-9)
