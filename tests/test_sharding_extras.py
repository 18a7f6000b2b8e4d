"""Sharded-statistics edge cases: padding/masking and the additive path."""

import jax
import jax.numpy as jnp
import numpy as np

from asvgp_tpu.basis import B3Spline, BSplineBasis
from asvgp_tpu.stats.additive import (
    compute_additive_stats,
    compute_additive_stats_sharded,
)
from asvgp_tpu.stats.sufficient import (
    compute_stats,
    compute_stats_sharded_masked,
    pad_for_sharding,
)


def test_padded_masked_stats_match_unpadded():
    """N not divisible by the mesh: pad with zero-weight points."""
    rng = np.random.RandomState(0)
    n = 203  # not divisible by 8
    x = rng.uniform(0.02, 0.98, n)
    y = np.sin(6 * x) + 0.1 * rng.randn(n)
    basis = B3Spline(0.0, 1.0, 24)

    want = jax.jit(lambda a, b: compute_stats(basis, a, b))(
        jnp.asarray(x), jnp.asarray(y)
    )
    xp, yp, w = pad_for_sharding(jnp.asarray(x), jnp.asarray(y), 8)
    assert xp.shape[0] % 8 == 0
    mesh = jax.make_mesh((8,), ("data",))
    got = compute_stats_sharded_masked(basis, xp, yp, w, mesh)
    np.testing.assert_allclose(np.asarray(got.kuf_y), np.asarray(want.kuf_y), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(got.kufkfu_band), np.asarray(want.kufkfu_band), atol=1e-12
    )
    np.testing.assert_allclose(float(got.yty), float(want.yty), rtol=1e-14)
    assert float(got.n) == n


def test_additive_sharded_stats_match():
    rng = np.random.RandomState(1)
    n = 160
    X = rng.uniform(0.02, 0.98, (n, 2))
    y = np.sin(5 * X[:, 0]) + np.cos(3 * X[:, 1]) + 0.1 * rng.randn(n)
    bases = [BSplineBasis(0.0, 1.0, 16, 3), BSplineBasis(0.0, 1.0, 20, 3)]

    want = jax.jit(lambda a, b: compute_additive_stats(bases, a, b))(
        jnp.asarray(X), jnp.asarray(y)
    )
    mesh = jax.make_mesh((8,), ("data",))
    got = compute_additive_stats_sharded(bases, jnp.asarray(X), jnp.asarray(y), mesh)
    np.testing.assert_allclose(np.asarray(got.kuf_y), np.asarray(want.kuf_y), atol=1e-12)
    np.testing.assert_allclose(np.asarray(got.kufkfu), np.asarray(want.kufkfu), atol=1e-12)
