"""Fused collapsed-core DS kernels (pallas_ds_core.py): interpret-mode
value and gradient checks against the float64 scan path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asvgp_tpu import banded
from asvgp_tpu.banded import ds
from asvgp_tpu.banded import ops as bops
from asvgp_tpu.banded import pallas_ds_core as pdc
from asvgp_tpu.banded import pallas_kernels as pk


@pytest.fixture(autouse=True)
def _interp():
    pk.set_interpret(True)
    yield
    pk.set_interpret(False)


def random_band(key, m, k, diag=2.0):
    kl, kd = jax.random.split(jax.random.PRNGKey(key))
    l0 = jax.random.normal(kl, (k + 1, m), jnp.float64) * 0.3
    l0 = l0.at[0].set(diag + jax.random.uniform(kd, (m,), jnp.float64))
    l0 = banded.mask_lower_band(l0)
    L0 = banded.lower_band_to_dense(l0)
    return banded.dense_to_lower_band(L0 @ L0.T, k)


def test_ds_rsqrt():
    x = jnp.asarray(
        np.abs(np.random.RandomState(0).lognormal(0, 8, 256)), jnp.float64
    )
    h, l = ds.split_f64(x)
    rh, rl = ds.rsqrt(h, l)
    got = ds.merge_f64(rh, rl)
    np.testing.assert_allclose(np.asarray(got), 1.0 / np.sqrt(np.asarray(x)),
                               rtol=1e-13)


@pytest.mark.slow
@pytest.mark.parametrize("m,k", [(40, 2)])
def test_core_sweeps_match_f64(m, k):
    # NOTE: interpret-mode on this 1-core host takes tens of minutes for the
    # fused pair kernels; tools/core_check.py runs the same comparison on
    # the real TPU in seconds (after compile) and is the primary check.
    kuu = random_band(0, m, k)
    p = random_band(1, m, k, diag=4.0)
    b = jax.random.normal(jax.random.PRNGKey(2), (m,), jnp.float64)
    l_kuu, l_p, s_kuu, s_p, c0, u, iv_kuu = pdc.factor_takahashi_solve_ds(
        kuu, p, b
    )
    np.testing.assert_allclose(
        np.asarray(iv_kuu), 1.0 / np.asarray(l_kuu[0]), rtol=1e-12
    )
    bops.set_impl("scan")
    try:
        w_lk = bops.cholesky_band(kuu)
        w_lp = bops.cholesky_band(p)
        w_sk = bops.takahashi_inverse_band(w_lk)
        w_sp = bops.takahashi_inverse_band(w_lp)
        w_c0 = bops.solve_lower_band(w_lp, b)
        w_u = bops.cholesky_solve_band(w_lp, b)
    finally:
        bops.set_impl("auto")
    for got, want, name in [
        (l_kuu, w_lk, "l_kuu"), (l_p, w_lp, "l_p"),
        (s_kuu, w_sk, "s_kuu"), (s_p, w_sp, "s_p"),
        (c0, w_c0, "c0"), (u, w_u, "u"),
    ]:
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-10, atol=1e-12,
            err_msg=name,
        )


@pytest.mark.slow
@pytest.mark.parametrize("m,k", [(300, 3)])
def test_collapsed_core_value_and_grad(m, k):
    """Multi-tile collapsed core: the 4 scalars and ALL input gradients must
    match the scan composition (closed-form band gradients + the
    tak/chol-adjoint chain for the trace term)."""
    kuu = random_band(10, m, k)
    p_extra = random_band(11, m, k, diag=4.0)
    b = jax.random.normal(jax.random.PRNGKey(12), (m,), jnp.float64)
    big = random_band(13, m, k, diag=3.0)

    def scan_core(kuu_, p_, b_, big_):
        bops.set_impl("scan")
        try:
            l_kuu = bops.cholesky_band(kuu_)
            l_p = bops.cholesky_band(p_)
            s_kuu = bops.takahashi_inverse_band(l_kuu)
            c0 = bops.solve_lower_band(l_p, b_)
            return (
                bops.log_det_from_cholesky(l_kuu),
                bops.log_det_from_cholesky(l_p),
                jnp.sum(jnp.square(c0)),
                bops.band_frobenius(s_kuu, big_),
            )
        finally:
            bops.set_impl("auto")

    got = pdc.collapsed_core_ds(kuu, p_extra, b, big)
    want = scan_core(kuu, p_extra, b, big)
    for g, w_, name in zip(got, want, ["ld_kuu", "ld_p", "quad", "trace"]):
        np.testing.assert_allclose(
            float(g), float(w_), rtol=1e-11, err_msg=name
        )

    # gradient: random linear combination of the 4 outputs
    coef = jnp.asarray([0.7, -1.3, 0.11, 0.37], jnp.float64)

    def loss_ds(kuu_, p_, b_, big_):
        out = pdc.collapsed_core_ds(kuu_, p_, b_, big_)
        return sum(c * o for c, o in zip(coef, out))

    def loss_scan(kuu_, p_, b_, big_):
        out = scan_core(kuu_, p_, b_, big_)
        return sum(c * o for c, o in zip(coef, out))

    g_ds = jax.grad(loss_ds, argnums=(0, 1, 2, 3))(kuu, p_extra, b, big)
    g_sc = jax.grad(loss_scan, argnums=(0, 1, 2, 3))(kuu, p_extra, b, big)
    for g, w_, name in zip(g_ds, g_sc, ["kuu", "p", "b", "big"]):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w_), rtol=1e-7, atol=1e-9, err_msg=name
        )
