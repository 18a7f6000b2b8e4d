"""Pallas kernel tests (interpreter mode on CPU, SURVEY.md §5 sanitizers row).

Each kernel is checked against the float64 scan implementation (values) and
against JAX autodiff through the scan (hand-derived VJPs).  Comparisons are
done in float32-vs-float32 (tight: same math, same order) and
float32-vs-float64 (loose: dtype-limited).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asvgp_tpu import banded
from asvgp_tpu.banded import ops as bops
from asvgp_tpu.banded import pallas_kernels as pk


@pytest.fixture(autouse=True)
def _pallas_interpret():
    pk.set_interpret(True)
    yield
    pk.set_interpret(False)


def random_band(key, m, k, dtype=jnp.float64):
    kl, kd = jax.random.split(jax.random.PRNGKey(key))
    l0 = jax.random.normal(kl, (k + 1, m), dtype) * 0.3
    l0 = l0.at[0].set(2.0 + jax.random.uniform(kd, (m,), dtype))
    l0 = banded.mask_lower_band(l0)
    L0 = banded.lower_band_to_dense(l0)
    return banded.dense_to_lower_band(L0 @ L0.T, k)


@pytest.mark.parametrize("m,k", [(16, 1), (33, 3)])
def test_pallas_cholesky_matches_scan(m, k):
    a64 = random_band(0, m, k)
    a32 = a64.astype(jnp.float32)
    want64 = bops.cholesky_band(a64)
    got = pk.cholesky_band_p(a32)
    # same-math f32 comparison
    bops.set_impl("scan")
    try:
        want32 = bops.cholesky_band(a32)
    finally:
        bops.set_impl("auto")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want32), rtol=2e-6, atol=2e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want64), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("m,k", [(16, 1)])
def test_pallas_takahashi_matches_scan(m, k):
    a64 = random_band(1, m, k)
    l64 = bops.cholesky_band(a64)
    l32 = l64.astype(jnp.float32)
    got = pk.takahashi_inverse_band_p(l32)
    want = bops.takahashi_inverse_band(l64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("m,k", [(16, 1)])
def test_pallas_solves_match_scan(m, k):
    a64 = random_band(2, m, k)
    l64 = bops.cholesky_band(a64)
    l32 = l64.astype(jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(5), (m,), jnp.float64)
    b32 = b.astype(jnp.float32)

    got = pk.solve_lower_band_p(l32, b32)
    want = bops.solve_lower_band(l64, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-3, atol=1e-4)

    got_t = pk.solve_upper_band_transpose_p(l32, b32)
    want_t = bops.solve_upper_band_transpose(l64, b)
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(want_t), rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("m,k", [(14, 3)])
def test_pallas_cholesky_vjp_matches_autodiff(m, k):
    """Hand-derived backward kernel vs JAX autodiff through the f32 scan."""
    a64 = random_band(3, m, k)
    a32 = a64.astype(jnp.float32)
    cot = jax.random.normal(jax.random.PRNGKey(7), a32.shape, jnp.float32)
    cot = banded.mask_lower_band(cot)

    got = jax.grad(lambda a: jnp.vdot(pk.cholesky_band_p(a), cot))(a32)

    bops.set_impl("scan")
    try:
        want = jax.grad(lambda a: jnp.vdot(bops.cholesky_band(a), cot))(a32)
    finally:
        bops.set_impl("auto")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("m,k", [(14, 3)])
def test_pallas_takahashi_vjp_matches_autodiff(m, k):
    a64 = random_band(4, m, k)
    l32 = bops.cholesky_band(a64).astype(jnp.float32)
    cot = banded.mask_lower_band(
        jax.random.normal(jax.random.PRNGKey(8), l32.shape, jnp.float32)
    )
    got = jax.grad(lambda l: jnp.vdot(pk.takahashi_inverse_band_p(l), cot))(l32)
    bops.set_impl("scan")
    try:
        want = jax.grad(lambda l: jnp.vdot(bops.takahashi_inverse_band(l), cot))(l32)
    finally:
        bops.set_impl("auto")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-3, atol=1e-3)


@pytest.mark.slow
@pytest.mark.parametrize("m,k", [(14, 3)])
def test_pallas_solve_vjps_match_autodiff(m, k):
    a64 = random_band(5, m, k)
    l32 = bops.cholesky_band(a64).astype(jnp.float32)
    b32 = jax.random.normal(jax.random.PRNGKey(9), (m,), jnp.float32)
    cot = jax.random.normal(jax.random.PRNGKey(10), (m,), jnp.float32)

    bops.set_impl("scan")
    try:
        want_l, want_b = jax.grad(
            lambda l, b: jnp.vdot(bops.solve_lower_band(l, b), cot), argnums=(0, 1)
        )(l32, b32)
        want_lt, want_bt = jax.grad(
            lambda l, b: jnp.vdot(bops.solve_upper_band_transpose(l, b), cot),
            argnums=(0, 1),
        )(l32, b32)
    finally:
        bops.set_impl("auto")

    got_l, got_b = jax.grad(
        lambda l, b: jnp.vdot(pk.solve_lower_band_p(l, b), cot), argnums=(0, 1)
    )(l32, b32)
    np.testing.assert_allclose(np.asarray(got_l), np.asarray(want_l), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(want_b), rtol=1e-3, atol=1e-3)

    got_lt, got_bt = jax.grad(
        lambda l, b: jnp.vdot(pk.solve_upper_band_transpose_p(l, b), cot),
        argnums=(0, 1),
    )(l32, b32)
    np.testing.assert_allclose(np.asarray(got_lt), np.asarray(want_lt), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got_bt), np.asarray(want_bt), rtol=1e-3, atol=1e-3)


def test_dispatch_respects_set_impl():
    a = random_band(6, 20, 3).astype(jnp.float32)
    bops.set_impl("pallas")
    try:
        l1 = bops.cholesky_band(a)
    finally:
        bops.set_impl("scan")
    try:
        l2 = bops.cholesky_band(a)
    finally:
        bops.set_impl("auto")
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=2e-6, atol=2e-6)
