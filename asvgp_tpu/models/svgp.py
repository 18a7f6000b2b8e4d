"""SVGP1D — uncollapsed sparse variational GP with banded precision q.

The reference uses gpflow's SVGP (dense (m, m) q_sqrt) as its minibatch
baseline (experiments/large_regression/electricity.py:115-116, SURVEY.md
§2.3).  This model is the TPU-native equivalent, built on the banded
structure of spline features.

Parameterization.  Instead of q(u) directly, we parameterize
ν = Kuu⁻¹ u (the "information" transform).  Under the prior,
ν ~ N(0, Kuu⁻¹), and the conditional of f simplifies because
cov(f(x), u) = φ(x) (reproducing property):

    E[f(x) | ν]   = φ(x)ᵀ ν                       (no Kuu solve per point!)
    var[f(x) | ν] = k(x,x) − φᵀ Kuu⁻¹ φ           (prior gap)

We take q(ν) = N(mu, (R Rᵀ)⁻¹) with R *lower-banded* with bandwidth k.
The Titsias-optimal posterior is q*(u) = N(σ⁻²Kuu P⁻¹Kuf y, Kuu P⁻¹Kuu)
with P = Kuu + KufKfuᵀ/σ², so in ν-space precision*_ν = P — banded with
bandwidth exactly k.  The banded family therefore CONTAINS the exact
optimum while costing O(m·k) parameters instead of gpflow's O(m²).
Every ELBO term is banded:

    KL(q(ν) ‖ p(ν)) = ½[ tr(Kuu Σ) + muᵀ Kuu mu − m − log|Kuu| − log|Σ| ]
      tr(Kuu Σ)  = band-Frobenius(Kuu, Takahashi band of R)   (exact: Kuu
                   is banded, so only Σ's band enters)
      muᵀ Kuu mu = banded matvec, log|Σ| = −2 Σ log R_ii,
      log|Kuu|   = banded Cholesky
    var_q[f_i]   = φ_iᵀ Σ φ_i                    (Takahashi window of R)

Each training step is an unbiased minibatch estimate — true SVGP-style
stochastic training (the BASELINE.md minibatch-ELBO capability).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import optax

from asvgp_tpu import banded
from asvgp_tpu.basis.splines import BSplineBasis
from asvgp_tpu.features.spline_features import make_kuf, make_kuu
from asvgp_tpu.models.gpr1d import (
    params_to_kernel,
    params_to_likelihood,
    window_dot,
    window_quadratic_form,
)
from asvgp_tpu.models.kernels import Matern
from asvgp_tpu.models.parameters import positive_inverse

_LOG2PI = math.log(2.0 * math.pi)


class SVGP1D:
    """1-D spline-feature SVGP with banded-precision variational posterior."""

    def __init__(self, kernel: Matern, basis: BSplineBasis, *,
                 noise_variance=1.0, num_data=None, q_bandwidth=None):
        self.basis = basis
        self.nu2 = kernel.nu2
        self.kernel_init = kernel
        self.noise_variance_init = noise_variance
        self.num_data = num_data
        # bandwidth k contains the exact optimal posterior (precision_ν = P)
        self.q_bandwidth = basis.order if q_bandwidth is None else q_bandwidth

    def init_params(self):
        """Initialize q(ν) at the PRIOR p(ν) = N(0, Kuu⁻¹): R = chol(Kuu),
        KL = 0, predictive variance = prior variance.  Matches gpflow's
        q_sqrt-at-prior convention and starts the log-scale diagonal at the
        right order of magnitude."""
        m = self.basis.m
        kuu = make_kuu(self.kernel_init, self.basis)
        l0 = banded.cholesky_band(kuu)  # bandwidth = basis.order
        raw = jnp.zeros((self.q_bandwidth + 1, m), jnp.result_type(float))
        raw = raw.at[0].set(jnp.log(l0[0]))
        rows = min(self.q_bandwidth, l0.shape[0] - 1)
        raw = raw.at[1 : 1 + rows].set(l0[1 : 1 + rows] / l0[0])
        return {
            "kernel": {
                "raw_variance": positive_inverse(self.kernel_init.variance),
                "raw_lengthscales": positive_inverse(self.kernel_init.lengthscales),
            },
            "likelihood": {"raw_variance": positive_inverse(self.noise_variance_init)},
            "q_mu": jnp.zeros((m,), jnp.result_type(float)),
            "q_prec_band": raw,
        }

    def _build(self, params):
        return params_to_kernel(params, self.nu2), params_to_likelihood(params)

    def _r_band(self, params):
        """Banded Cholesky factor R of the variational precision.

        Parameterization chosen for OPTIMIZER REACHABILITY, not just
        positivity: the optimal precision is P = Kuu + KufKfu/σ², whose
        Cholesky diagonal is O(√(N/m)/σ) — 10²–10⁴ at production scale.
        Adam moves a raw parameter by ≲ lr·steps, so a softplus/linear raw
        diagonal can NEVER reach the optimum in a realistic step budget
        (this exact failure produced a ×4 NLPD miscalibration at N=10⁶:
        variance stuck at its init while the mean trained fine).  Hence:
          diag     R[0] = exp(raw[0])          (log scale: multiplicative)
          off-diag R[q] = raw[q] · R[0]        (relative to the column diag,
                                                 O(1) at the optimum)
        """
        raw = params["q_prec_band"]
        d = jnp.exp(raw[:1])
        r = jnp.concatenate([d, raw[1:] * d], axis=0)
        return banded.mask_lower_band(r)

    # ---- KL(q(ν) || p(ν)), p(ν) = N(0, Kuu⁻¹) ------------------------------
    def kl(self, params):
        kernel, _ = self._build(params)
        kuu = make_kuu(kernel, self.basis)
        m = self.basis.m
        R = self._r_band(params)
        mu = params["q_mu"]

        l_kuu = banded.cholesky_band(kuu)
        log_det_kuu = banded.log_det_from_cholesky(l_kuu)
        log_det_sigma = -2.0 * jnp.sum(jnp.log(R[0]))
        sigma_band = banded.takahashi_inverse_band(R)
        trace = banded.band_frobenius(kuu, sigma_band[: kuu.shape[0]])
        quad = jnp.sum(mu * banded.matvec_symmetric_band(kuu, mu))
        return 0.5 * (trace + quad - m - log_det_kuu - log_det_sigma)

    # ---- stochastic ELBO ---------------------------------------------------
    def elbo(self, params, X, y):
        """Unbiased minibatch ELBO estimate (scaled by num_data/batch)."""
        kernel, lik = self._build(params)
        sigma2 = lik.variance
        yf = jnp.reshape(jnp.asarray(y), (-1,))
        b = yf.shape[0]
        scale = (
            jnp.asarray(self.num_data, yf.dtype) / b
            if self.num_data is not None
            else jnp.asarray(1.0, yf.dtype)
        )

        R = self._r_band(params)
        sigma_band = banded.takahashi_inverse_band(R)

        kuu = make_kuu(kernel, self.basis)
        l_kuu = banded.cholesky_band(kuu)
        kuu_inv_band = banded.takahashi_inverse_band(l_kuu)

        vals, start = make_kuf(self.basis, X)
        f_mean = window_dot(params["q_mu"], vals, start)
        f_var = window_quadratic_form(sigma_band, vals, start)
        gap = kernel.variance - window_quadratic_form(kuu_inv_band, vals, start)

        exp_ll = (
            -0.5 * (_LOG2PI + jnp.log(sigma2)) * b
            - 0.5 * jnp.sum(jnp.square(yf - f_mean) + f_var + gap) / sigma2
        )
        return scale * exp_ll - self.kl(params)

    def training_loss(self, params, X, y):
        return -self.elbo(params, X, y)

    # ---- prediction ---------------------------------------------------------
    def predict_f(self, params, Xnew, full_cov: bool = False):
        if full_cov:
            raise NotImplementedError("full_cov prediction is not implemented")
        if not hasattr(self, "_predict_jit"):
            self._predict_jit = jax.jit(self._predict_f_arrays)
        return self._predict_jit(
            params, jnp.reshape(jnp.asarray(Xnew), (-1,))
        )

    def _predict_f_arrays(self, params, Xnew):
        kernel, _ = self._build(params)
        R = self._r_band(params)
        sigma_band = banded.takahashi_inverse_band(R)
        kuu = make_kuu(kernel, self.basis)
        l_kuu = banded.cholesky_band(kuu)
        kuu_inv_band = banded.takahashi_inverse_band(l_kuu)

        vals, start = make_kuf(self.basis, jnp.reshape(jnp.asarray(Xnew), (-1,)))
        mean = window_dot(params["q_mu"], vals, start)
        var = (
            kernel.variance
            - window_quadratic_form(kuu_inv_band, vals, start)
            + window_quadratic_form(sigma_band, vals, start)
        )
        return mean[:, None], var[:, None]

    def predict_log_density(self, params, data):
        Xnew, ynew = data
        _, lik = self._build(params)
        mean, var = self.predict_f(params, Xnew)
        return lik.predict_log_density(
            mean, var, jnp.reshape(jnp.asarray(ynew), mean.shape)
        )


def fit_svgp(model: SVGP1D, X, y, params, *, batch_size=1024, steps=2000,
             learning_rate=1e-3, seed=0, chunk=2000):
    """Minibatch Adam training of the SVGP (jitted lax.scan loop).

    ``learning_rate`` defaults to 1e-3 = the reference baseline's
    ``tf.optimizers.Adam()`` default (electricity.py:57); at the reference
    protocol's batch of 100, 1e-2 diverges (NaN within 2000 steps on the
    log-scale precision diagonal — tools/svgp_fault_probe.py).

    ``chunk``: maximum scan length per executable call.  The full 10k-step
    protocol is ~19 min of continuous device time in ONE call at m=1000,
    which this image's TPU relay kills ("UNAVAILABLE: TPU device error");
    chunking bounds each call at a few minutes with identical math (the
    optimizer state and PRNG key are carried across calls).
    """
    x = jnp.reshape(jnp.asarray(X), (-1,))
    yf = jnp.reshape(jnp.asarray(y), (-1,))
    n = x.shape[0]
    if model.num_data is None:
        model.num_data = int(n)
    opt = optax.adam(learning_rate)

    def step(carry, _):
        params, state, key = carry
        key, sub = jax.random.split(key)
        idx = jax.random.randint(sub, (batch_size,), 0, n)
        loss, grads = jax.value_and_grad(model.training_loss)(
            params, x[idx], yf[idx]
        )
        updates, state = opt.update(grads, state, params)
        params = optax.apply_updates(params, updates)
        return (params, state, key), loss

    @partial(jax.jit, static_argnames=("length",))
    def run_chunk(carry, length):
        return jax.lax.scan(step, carry, None, length=length)

    carry = (params, opt.init(params), jax.random.PRNGKey(seed))
    chunks = []
    done = 0
    while done < steps:
        length = min(chunk, steps - done)
        carry, losses = run_chunk(carry, length)
        chunks.append(losses)
        done += length
    return carry[0], jnp.concatenate(chunks)
