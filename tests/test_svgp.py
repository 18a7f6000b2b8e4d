"""SVGP1D tests.

The killer test: the banded-precision family contains the Titsias-optimal
posterior (precision_ν = P, bandwidth k), so plugging the optimal
(mu, R) into the uncollapsed ELBO must reproduce the collapsed GPR1D ELBO
*exactly* — a sharp joint check of the KL, the expected likelihood, the
gap term and the parameterization.
"""

import jax
import jax.numpy as jnp
import numpy as np

from asvgp_tpu import banded
from asvgp_tpu.basis import B3Spline
from asvgp_tpu.features.spline_features import make_kuu
from asvgp_tpu.models import GPR1D, Matern32
from asvgp_tpu.models.parameters import positive_inverse
from asvgp_tpu.models.svgp import SVGP1D, fit_svgp


def make_data(n=400, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.uniform(0.02, 0.98, n)
    y = np.sin(8 * x) + 0.1 * rng.randn(n)
    return x, y


def test_optimal_q_recovers_collapsed_elbo():
    x, y = make_data()
    basis = B3Spline(0.0, 1.0, 28)
    kernel = Matern32(0.8, 0.3)
    noise = 0.15
    gpr = GPR1D((x, y), kernel, basis, noise_variance=noise)
    p = gpr.init_params()
    collapsed = float(gpr.elbo(p))

    # build the optimal (mu_ν, R) from the collapsed sufficient statistics
    kuu = make_kuu(kernel, basis)
    p_band = gpr.stats.kufkfu_band / noise + kuu
    l_p = banded.cholesky_band(p_band)
    mu = banded.cholesky_solve_band(l_p, gpr.stats.kuf_y) / noise

    svgp = SVGP1D(kernel, basis, noise_variance=noise, num_data=x.shape[0])
    sp = svgp.init_params()
    raw = jnp.concatenate([positive_inverse(l_p[:1]), l_p[1:]], axis=0)
    sp = {**sp, "q_mu": mu, "q_prec_band": raw}

    uncollapsed = float(svgp.elbo(sp, x, y))
    np.testing.assert_allclose(uncollapsed, collapsed, rtol=1e-9)

    # any other q must not beat the collapsed bound
    sp_bad = {**sp, "q_mu": mu * 1.1}
    assert float(svgp.elbo(sp_bad, x, y)) < collapsed


def test_svgp_predict_matches_gpr_at_optimum():
    x, y = make_data()
    basis = B3Spline(0.0, 1.0, 24)
    kernel = Matern32(0.9, 0.25)
    noise = 0.2
    gpr = GPR1D((x, y), kernel, basis, noise_variance=noise)
    mean_g, var_g = gpr.predict_f(gpr.init_params(), x[:50])

    kuu = make_kuu(kernel, basis)
    p_band = gpr.stats.kufkfu_band / noise + kuu
    l_p = banded.cholesky_band(p_band)
    mu = banded.cholesky_solve_band(l_p, gpr.stats.kuf_y) / noise
    svgp = SVGP1D(kernel, basis, noise_variance=noise, num_data=x.shape[0])
    sp = svgp.init_params()
    sp = {
        **sp,
        "q_mu": mu,
        "q_prec_band": jnp.concatenate(
            [positive_inverse(l_p[:1]), l_p[1:]], axis=0
        ),
    }
    mean_s, var_s = svgp.predict_f(sp, x[:50])
    np.testing.assert_allclose(np.asarray(mean_s), np.asarray(mean_g), atol=1e-10)
    np.testing.assert_allclose(np.asarray(var_s), np.asarray(var_g), atol=1e-10)


import pytest


@pytest.mark.slow
def test_svgp_minibatch_training_improves_and_approaches_collapsed():
    x, y = make_data(n=1500, seed=3)
    basis = B3Spline(0.0, 1.0, 24)
    kernel = Matern32(1.0, 0.2)
    svgp = SVGP1D(kernel, basis, noise_variance=0.2, num_data=1500)
    p0 = svgp.init_params()
    e0 = float(svgp.elbo(p0, x, y))
    params, losses = fit_svgp(
        svgp, x, y, p0, batch_size=256, steps=800, learning_rate=0.03
    )
    e1 = float(svgp.elbo(params, x, y))
    assert np.isfinite(e1) and e1 > e0 + 10.0
    # the trained predictive mean must explain the signal
    mean, _ = svgp.predict_f(params, x)
    mse_model = float(np.mean((np.asarray(mean)[:, 0] - y) ** 2))
    assert mse_model < 0.5 * float(np.mean(y**2))
