"""GPRAdditive — sum of 1-D Matérn GPs over D input dimensions.

TPU-native equivalent of the reference ``GPR_additive``
(asvgp/gpr.py:139-236).  Improvements over the reference's implementation:

  * log|Kuu| and the trace term use the *banded* structure of the per-dim
    Kuu blocks (the reference densifies the block-diagonal, gpr.py:185-188);
    only the genuinely dense coupling matrix P is factorized densely.
  * prediction gathers (k+1)-windows of P⁻¹ and the per-dim Takahashi bands
    of Kuu_d⁻¹, O(D² k²) per test point, instead of dense (M, n_test)
    triangular solves (gpr.py:226-232).

The reference's constructor bug of passing the loop-leaked ``kernel`` to
``super().__init__`` (gpr.py:155, SURVEY.md §7.3 item 6) is fixed by
construction: every kernel is carried explicitly.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from asvgp_tpu import banded
from asvgp_tpu.banded import dsx
from asvgp_tpu.features.spline_features import make_kuu
from asvgp_tpu.models.kernels import Matern
from asvgp_tpu.models.likelihoods import Gaussian
from asvgp_tpu.models.parameters import positive, positive_inverse
from asvgp_tpu.models.gpr1d import window_dot, window_quadratic_form
from asvgp_tpu.stats.additive import (
    compute_additive_stats,
    compute_additive_stats_sharded,
)

_LOG2PI = math.log(2.0 * math.pi)

# panel width for the block route of the dense coupling factorization; the
# Mosaic panel kernel (banded/pallas_ds_block.py) handles B <= 128
_BLOCK_B = 128


def _use_block_route(P) -> bool:
    """Route the dense M×M coupling factorization through the block-banded
    DS ops (banded/block.py, full block bandwidth) on accelerators.

    dsx's scan Cholesky/solves advance ONE column per lax.scan iteration —
    M sequential steps of rank-1 work, latency-bound on this platform
    (ADDITIVE_PROBE r5 first capture: TPU value+grad 34 ms vs CPU-f64
    18.6 ms at M=1000).  The block route factors 128-wide panels with the
    hardware-validated panel sweep and does every trailing update as one
    Ozaki exact-bf16 MXU matmul — the same machinery as the Kron coupling
    (PANELCHECK.json), reused here with W = nb-1 (a dense matrix is a
    block-banded matrix of full bandwidth).  CPU keeps plain f64 dsx."""
    from asvgp_tpu.banded.block import _use_ds

    return _use_ds(P) and P.shape[0] > _BLOCK_B


def _to_blocks(P, rhs):
    """Pad the SPD (M, M) matrix to a multiple of _BLOCK_B (identity on the
    padded diagonal: unit pivots contribute 0 to log|P|; padded rhs rows are
    zero so padded solution entries are zero) and extract full-bandwidth
    block-lower storage."""
    from asvgp_tpu.banded import block as _block

    M = P.shape[0]
    n_pad = (-M) % _BLOCK_B
    if n_pad:
        P = jnp.pad(P, ((0, n_pad), (0, n_pad)))
        r = jnp.arange(M, M + n_pad)
        P = P.at[r, r].set(1.0)
        rhs = jnp.pad(rhs, (0, n_pad))
    nb = P.shape[0] // _BLOCK_B
    return _block.dense_to_block_band(P, nb - 1, _BLOCK_B), rhs, M


def _logdet_halfsolve_block(P, rhs):
    """(log|P|, L⁻¹ rhs) of the dense coupling via the block-banded ops
    (value AND gradient: banded/block.py custom VJPs)."""
    from asvgp_tpu.banded import block as _block

    blocks, rhs_p, M = _to_blocks(P, rhs)
    L = _block.cholesky_block_banded(blocks)
    log_det = _block.log_det_from_block_cholesky(L)
    c = _block.solve_lower_block_banded(L, rhs_p)
    return log_det, c[:M]


def _solve_and_inverse_block(P, rhs):
    """(P⁻¹ rhs, dense P⁻¹) via block Cholesky + solves + block Takahashi
    (full bandwidth ⇒ the Takahashi recursion yields the exact full
    inverse).  Posterior/prediction path — no gradients required."""
    from asvgp_tpu.banded import block as _block

    blocks, rhs_p, M = _to_blocks(P, rhs)
    L = _block.cholesky_block_banded(blocks)
    w = _block.solve_upper_block_banded_transpose(
        L, _block.solve_lower_block_banded(L, rhs_p)
    )
    S = _block.takahashi_inverse_block_banded(L)
    Pinv = _block.block_band_to_dense(S)
    return w[:M], Pinv[:M, :M]


def _dense_p(bases, stats, kuu_bands, sigma2):
    P = stats.kufkfu / sigma2
    for d, kb in enumerate(kuu_bands):
        kd = banded.band_to_dense(
            banded.symmetrise_lower_band(kb), bases[d].order, bases[d].order
        )
        o = sum(b.m for b in bases[:d])
        P = P.at[o:o + bases[d].m, o:o + bases[d].m].add(kd)
    return P


def additive_collapsed_elbo(bases, nu2s, params, stats):
    """Collapsed ELBO of the additive model from its sufficient statistics
    (stats-parameterized so the data-parallel step in parallel/dp.py can
    psum sharded statistics before calling it).  Mirrors the reference
    GPR_additive objective (asvgp/gpr.py:139-236): per-dim banded
    logdet/trace terms, dense only for the genuinely dense coupling P."""
    kernels = [
        Matern(
            variance=positive(p["raw_variance"]),
            lengthscales=positive(p["raw_lengthscales"]),
            nu2=nu2,
        )
        for p, nu2 in zip(params["kernels"], nu2s)
    ]
    lik = Gaussian(variance=positive(params["likelihood"]["raw_variance"]))
    sigma2 = lik.variance
    kuu_bands = [make_kuu(k, b) for k, b in zip(kernels, bases)]
    l_bands = [banded.cholesky_band(kb) for kb in kuu_bands]
    log_det_kuu = sum(banded.log_det_from_cholesky(lb) for lb in l_bands)

    # trace(Kuu⁻¹ KufKfu): Kuu is block-diag ⇒ only the banded diagonal
    # blocks of KufKfu enter, via per-dim Takahashi bands
    trace_term = 0.0
    for d, lb in enumerate(l_bands):
        s_band = banded.takahashi_inverse_band(lb)
        o = sum(b.m for b in bases[:d])
        blk = jax.lax.dynamic_slice(
            stats.kufkfu, (o, o), (bases[d].m, bases[d].m)
        )
        blk_band = banded.dense_to_lower_band(blk, bases[d].order)
        trace_term = trace_term + banded.band_frobenius(s_band, blk_band)

    P = _dense_p(bases, stats, kuu_bands, sigma2)
    # dense coupling factorization: block-banded DS ops at full block
    # bandwidth on accelerators (panel sweeps + Ozaki MXU trailing
    # updates), plain-f64 column scans elsewhere
    if _use_block_route(P):
        log_det_p, c = _logdet_halfsolve_block(P, stats.kuf_y)
        c = c / sigma2
    else:
        L = dsx.cholesky_auto(P)
        log_det_p = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
        c = dsx.solve_triangular_auto(L, stats.kuf_y) / sigma2
    total_variance = sum(k.variance for k in kernels)

    elbo = -0.5 * stats.n * (_LOG2PI + jnp.log(sigma2))
    elbo -= 0.5 * log_det_p
    elbo += 0.5 * log_det_kuu
    elbo -= 0.5 * stats.yty / sigma2
    elbo += 0.5 * jnp.sum(jnp.square(c))
    elbo -= 0.5 * stats.n * total_variance / sigma2
    elbo += 0.5 * trace_term / sigma2
    return elbo


class GPRAdditive:
    def __init__(self, data, kernels, bases, *, noise_variance=1.0,
                 mesh=None, axis="data", backend=None):
        import numpy as _np

        X_in, y = data
        X = jnp.asarray(X_in)
        y = jnp.asarray(y)
        if X.ndim != 2 or X.shape[1] != len(bases) or len(kernels) != len(bases):
            raise ValueError(
                "need X of shape (n, D) with one kernel and one basis per dim"
            )
        # host-side domain validation (see gpr1d.py)
        xv = X_in if isinstance(X_in, _np.ndarray) else _np.asarray(X)
        for d, basis in enumerate(bases):
            lo, hi = float(xv[:, d].min()), float(xv[:, d].max())
            if not (lo > basis.a and hi < basis.b):
                raise ValueError(
                    f"dim {d}: inputs must lie strictly inside "
                    f"[{basis.a}, {basis.b}], got [{lo}, {hi}]"
                )
        from asvgp_tpu.features.spline_features import validate_kernel_basis

        for k, b in zip(kernels, bases):
            validate_kernel_basis(k, b)
        self.bases = list(bases)
        self.nu2s = [k.nu2 for k in kernels]
        self.kernels_init = list(kernels)
        self.noise_variance_init = noise_variance
        from asvgp_tpu.banded import ops as _bops

        _bops.impl_scope(backend)  # validates the name eagerly
        self.backend = backend
        self.D = len(bases)
        self._offsets = [0]
        for b in bases:
            self._offsets.append(self._offsets[-1] + b.m)
        yf = jnp.reshape(y, (-1,))
        if mesh is not None:
            self.stats = compute_additive_stats_sharded(self.bases, X, yf, mesh, axis)
        else:
            self.stats = jax.jit(
                lambda xx, yy: compute_additive_stats(self.bases, xx, yy)
            )(X, yf)

    def init_params(self):
        # host-side softplus-inverse + one batched device_put (eager relay
        # ops cost ~27 ms each on this image; see models/parameters.py)
        from asvgp_tpu.models.parameters import positive_inverse_host as inv
        from asvgp_tpu.utils import exec_cache as _ec

        params = {
            "kernels": [
                {
                    "raw_variance": inv(k.variance),
                    "raw_lengthscales": inv(k.lengthscales),
                }
                for k in self.kernels_init
            ],
            "likelihood": {"raw_variance": inv(self.noise_variance_init)},
        }
        dev = _ec.init_device(self.stats)
        return jax.device_put(params, dev) if dev is not None else params

    def _build(self, params):
        kernels = [
            Matern(
                variance=positive(p["raw_variance"]),
                lengthscales=positive(p["raw_lengthscales"]),
                nu2=nu2,
            )
            for p, nu2 in zip(params["kernels"], self.nu2s)
        ]
        lik = Gaussian(variance=positive(params["likelihood"]["raw_variance"]))
        return kernels, lik

    def _dense_p(self, kuu_bands, sigma2):
        return _dense_p(self.bases, self.stats, kuu_bands, sigma2)

    def elbo(self, params):
        from asvgp_tpu.banded import ops as _bops

        with _bops.impl_scope(self.backend):
            return additive_collapsed_elbo(
                self.bases, self.nu2s, params, self.stats
            )

    def _elbo_inner(self, params):
        return additive_collapsed_elbo(
            self.bases, self.nu2s, params, self.stats
        )

    def maximum_log_likelihood_objective(self, params):
        return self.elbo(params)

    def training_loss(self, params):
        return -self.elbo(params)

    def predict_f(self, params, Xnew, full_cov: bool = False):
        if full_cov:
            raise NotImplementedError("full_cov prediction is not implemented")
        from asvgp_tpu.banded import ops as _bops

        with _bops.impl_scope(self.backend):
            if not hasattr(self, "_predict_jit"):
                self._predict_jit = jax.jit(self._predict_f_inner)
            return self._predict_jit(params, jnp.asarray(Xnew))

    def _predict_f_inner(self, params, Xnew):
        kernels, lik = self._build(params)
        sigma2 = lik.variance
        kuu_bands = [make_kuu(k, b) for k, b in zip(kernels, self.bases)]
        l_bands = [banded.cholesky_band(kb) for kb in kuu_bands]
        s_bands = [banded.takahashi_inverse_band(lb) for lb in l_bands]

        P = self._dense_p(kuu_bands, sigma2)
        if _use_block_route(P):
            w, Pinv = _solve_and_inverse_block(P, self.stats.kuf_y)
            w = w / sigma2
        else:
            L = dsx.cholesky_auto(P)
            w = dsx.cho_solve_auto(L, self.stats.kuf_y) / sigma2
            Pinv = dsx.cho_solve_auto(L, jnp.eye(P.shape[0], dtype=P.dtype))

        x = jnp.asarray(Xnew)
        evals = [b.evaluate_basis(x[:, d], dx=0) for d, b in enumerate(self.bases)]
        n = x.shape[0]

        mean = jnp.zeros((n,), P.dtype)
        quad_p = jnp.zeros((n,), P.dtype)
        quad_kuu = jnp.zeros((n,), P.dtype)
        idxs = []
        for d, (v, c) in enumerate(evals):
            kp1 = v.shape[1]
            idx = self._offsets[d] + c[:, None] + jnp.arange(kp1, dtype=c.dtype)
            idxs.append(idx)
            mean = mean + jnp.sum(v * w[idx], axis=1)
            quad_kuu = quad_kuu + window_quadratic_form(s_bands[d], v, c)
        for d in range(self.D):
            vd, _ = evals[d]
            for e in range(self.D):
                ve, _ = evals[e]
                win = Pinv[idxs[d][:, :, None], idxs[e][:, None, :]]
                quad_p = quad_p + jnp.einsum("na,nab,nb->n", vd, win, ve)

        kdiag = sum(k.variance for k in kernels)
        var = kdiag + quad_p - quad_kuu
        return mean[:, None], var[:, None]

    def predict_y(self, params, Xnew):
        _, lik = self._build(params)
        mean, var = self.predict_f(params, Xnew)
        return lik.predict_mean_and_var(mean, var)

    def predict_log_density(self, params, data):
        Xnew, ynew = data
        _, lik = self._build(params)
        mean, var = self.predict_f(params, Xnew)
        return lik.predict_log_density(
            mean, var, jnp.reshape(jnp.asarray(ynew), mean.shape)
        )
