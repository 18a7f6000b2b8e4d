"""XLA-level double-single dense algebra (banded/dsx.py): exactness of the
sliced MXU matmul and the scan Cholesky/solves, plus their algebraic VJPs,
against plain float64."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asvgp_tpu.banded import dsx


def _spd(key, n, scale=1.0):
    a = jax.random.normal(jax.random.PRNGKey(key), (n, n), jnp.float64)
    return a @ a.T * scale + n * jnp.eye(n)


def test_matmul_ds_exactness():
    rng = np.random.RandomState(0)
    # wide dynamic range entries — the slicing must stay exact per row/col
    a = jnp.asarray(rng.randn(48, 64) * np.exp(rng.uniform(-20, 20, (48, 64))))
    b = jnp.asarray(rng.randn(64, 32) * np.exp(rng.uniform(-20, 20, (64, 32))))
    got = dsx.matmul_ds(a, b)
    want = a @ b
    denom = jnp.max(jnp.abs(a), axis=1, keepdims=True) * jnp.max(
        jnp.abs(b), axis=0, keepdims=True
    )
    rel = np.asarray(jnp.abs(got - want) / denom)
    assert rel.max() < 1e-13


def test_matmul_ds_vjp():
    a = jax.random.normal(jax.random.PRNGKey(1), (8, 12), jnp.float64)
    b = jax.random.normal(jax.random.PRNGKey(2), (12, 6), jnp.float64)
    cot = jax.random.normal(jax.random.PRNGKey(3), (8, 6), jnp.float64)
    ga, gb = jax.grad(
        lambda x, y: jnp.vdot(dsx.matmul_ds(x, y), cot), argnums=(0, 1)
    )(a, b)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(cot @ b.T),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(a.T @ cot),
                               rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("n", [5, 33])
def test_cholesky_ds(n):
    a = _spd(10, n)
    got = dsx.cholesky_ds(a)
    want = jnp.linalg.cholesky(a)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-12,
                               atol=1e-12)


def test_cholesky_ds_vjp():
    n = 7
    a = _spd(11, n)
    cot = jnp.tril(jax.random.normal(jax.random.PRNGKey(4), (n, n), jnp.float64))
    got = jax.grad(lambda x: jnp.vdot(dsx.cholesky_ds(x), cot))(a)
    want = jax.grad(lambda x: jnp.vdot(jnp.linalg.cholesky(x), cot))(a)
    # jnp cholesky reads only the lower triangle; ours reads the full
    # symmetric matrix — compare after symmetrizing the reference cotangent
    want_sym = 0.5 * (want + want.T)
    got_sym = 0.5 * (got + got.T)
    np.testing.assert_allclose(np.asarray(got_sym), np.asarray(want_sym),
                               rtol=1e-9, atol=1e-11)


@pytest.mark.parametrize("trans", [False, True])
@pytest.mark.parametrize("ndim", [1, 2])
def test_solve_triangular_ds(trans, ndim):
    n = 19
    l = jnp.linalg.cholesky(_spd(12, n))
    shape = (n,) if ndim == 1 else (n, 4)
    b = jax.random.normal(jax.random.PRNGKey(5), shape, jnp.float64)
    got = dsx.solve_triangular_ds(l, b, True, trans)
    want = jax.scipy.linalg.solve_triangular(l, b, lower=True,
                                             trans=1 if trans else 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-11,
                               atol=1e-12)


@pytest.mark.parametrize("trans", [False, True])
def test_solve_triangular_ds_vjp(trans):
    n = 9
    l = jnp.linalg.cholesky(_spd(13, n))
    b = jax.random.normal(jax.random.PRNGKey(6), (n, 3), jnp.float64)
    cot = jax.random.normal(jax.random.PRNGKey(7), (n, 3), jnp.float64)

    def loss_ds(l_, b_):
        return jnp.vdot(dsx.solve_triangular_ds(l_, b_, True, trans), cot)

    def loss_ref(l_, b_):
        x = jax.scipy.linalg.solve_triangular(l_, b_, lower=True,
                                              trans=1 if trans else 0)
        return jnp.vdot(x, cot)

    g_ds = jax.grad(loss_ds, argnums=(0, 1))(l, b)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(l, b)
    for g, w in zip(g_ds, g_ref):
        # reference grads may populate the untouched triangle; ours masks it
        np.testing.assert_allclose(
            np.asarray(jnp.tril(g) if g.ndim == 2 and g.shape == l.shape else g),
            np.asarray(jnp.tril(w) if w.ndim == 2 and w.shape == l.shape else w),
            rtol=1e-9, atol=1e-11,
        )


def test_matmul_ds_vjp_broadcast_batch():
    """grad wrt a broadcast (1,B,B) operand of a batched matmul_ds must have
    the primal's shape (cotangents summed over the broadcast batch dim)."""
    a = jax.random.normal(jax.random.PRNGKey(8), (1, 4, 4), jnp.float64)
    b = jax.random.normal(jax.random.PRNGKey(9), (5, 4, 3), jnp.float64)
    cot = jax.random.normal(jax.random.PRNGKey(10), (5, 4, 3), jnp.float64)
    ga, gb = jax.grad(
        lambda x, y: jnp.vdot(dsx.matmul_ds(x, y), cot), argnums=(0, 1)
    )(a, b)
    assert ga.shape == a.shape and gb.shape == b.shape
    want_a = jnp.sum(jnp.matmul(cot, jnp.swapaxes(b, -1, -2)),
                     axis=0, keepdims=True)
    want_b = jnp.matmul(jnp.swapaxes(jnp.broadcast_to(a, (5, 4, 4)), -1, -2),
                        cot)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(want_a),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(want_b),
                               rtol=1e-9, atol=1e-12)


def test_matmul_ds_wide_inner_chunked():
    """K > 1024 contractions must stay f64-accurate (chunked accumulation)."""
    rng = np.random.RandomState(20)
    k_inner = 1500
    a = jnp.asarray(rng.randn(4, k_inner))
    b = jnp.asarray(rng.randn(k_inner, 4))
    got = dsx.matmul_ds(a, b)
    want = a @ b
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-12, atol=1e-12)
