"""Variational Fourier Features (VFF) on an interval — baseline parity.

The reference's large-regression experiment compares ASVGP against a VFF
baseline (reference experiments/large_regression/electricity.py:12-13,
76-79) from the external ``VFF`` package (Hensman, Durrande, Solin, JMLR
2017).  Here VFF drops out of the SAME inter-domain machinery as the
spline features: inducing features u_m = <φ_m, f>_H where φ_m are the
truncated Fourier basis on [a, b]

    φ_0 = 1,  φ_{2i-1} = cos(ω_i (x - a)),  φ_{2i} = sin(ω_i (x - a)),
    ω_i = 2π i / (b - a),

and <·,·>_H is the Matérn interval RKHS inner product — the identical
coefficient formulas used for the spline Kuu
(features/spline_features.py:11-15).  Because the basis is L²-orthogonal
on full periods and periodic at the boundary (φ(a) = φ(b), likewise the
derivatives), every ∫φ⁽ᵈ⁾φ⁽ᵈ⁾ Gram is DIAGONAL and every boundary term is
an outer product of one boundary-value vector — reproducing the paper's
"diagonal + low rank" Kuu structure in closed form.

Unlike the spline features, Kuf is dense ((m, n): Fourier features are
global), so the model built on these (models/vff.py) is O(m²) per point
in precompute and O(m³) per ELBO step — the trade-off ASVGP exists to
beat; this is the honest baseline.
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
import numpy as np

_SQRT3 = math.sqrt(3.0)
_SQRT5 = math.sqrt(5.0)


@dataclasses.dataclass(frozen=True)
class FourierBasis1D:
    """Truncated Fourier basis on [a, b] with n_frequencies harmonics.

    Feature order: [1, cos_1..cos_F, sin_1..sin_F]; m = 2F + 1.
    """

    a: float
    b: float
    n_frequencies: int

    @property
    def m(self) -> int:
        return 2 * self.n_frequencies + 1

    @property
    def omegas(self) -> np.ndarray:
        i = np.arange(1, self.n_frequencies + 1, dtype=np.float64)
        return 2.0 * np.pi * i / (self.b - self.a)

    # ---- L² inner-product diagonals (orthogonality on full periods) ------
    def l2_diag(self, dx: int) -> np.ndarray:
        """diag of ∫ φ⁽ᵈˣ⁾ φ⁽ᵈˣ⁾ over [a, b] (off-diagonals are zero)."""
        T = self.b - self.a
        w = self.omegas
        harm = 0.5 * T * w ** (2 * dx)
        const = T if dx == 0 else 0.0
        return np.concatenate([[const], harm, harm])

    # ---- boundary value vectors (φ(a) = φ(b), full periods) ---------------
    def boundary_value(self, dx: int) -> np.ndarray:
        """φ⁽ᵈˣ⁾(a) (= φ⁽ᵈˣ⁾(b)) for dx in 0..2."""
        F = self.n_frequencies
        w = self.omegas
        zeros = np.zeros(F)
        if dx == 0:
            return np.concatenate([[1.0], np.ones(F), zeros])
        if dx == 1:
            return np.concatenate([[0.0], zeros, w])
        if dx == 2:
            return np.concatenate([[0.0], -w**2, zeros])
        raise ValueError(f"dx={dx} not supported")

    def evaluate(self, X) -> jnp.ndarray:
        """Dense (n, m) feature matrix Φ with Φ[p, j] = φ_j(x_p)."""
        x = jnp.reshape(jnp.asarray(X), (-1,))[:, None] - self.a
        w = jnp.asarray(self.omegas, x.dtype)[None, :]
        ones = jnp.ones((x.shape[0], 1), x.dtype)
        return jnp.concatenate([ones, jnp.cos(w * x), jnp.sin(w * x)], axis=1)


def make_kuu_vff(kernel, fb: FourierBasis1D) -> jnp.ndarray:
    """Dense (m, m) VFF Gram Kuu[i,j] = <φ_i, φ_j>_H for a Matérn kernel.

    Same interval-norm coefficient combinations as the spline features
    (features/spline_features.py:63-95, reference
    asvgp/inducing_features.py:16-44); the basis-dependent ingredients are
    the diagonal L² Grams and rank-1 boundary outer products.
    """
    var = kernel.variance
    ell = kernel.lengthscales
    dtype = jnp.result_type(var, ell)
    A = jnp.asarray(fb.l2_diag(0), dtype)
    B = jnp.asarray(fb.l2_diag(1), dtype)
    v = jnp.asarray(fb.boundary_value(0), dtype)
    vv2 = 2.0 * jnp.outer(v, v)  # φ(a)φ(a)ᵀ + φ(b)φ(b)ᵀ

    name = kernel.name
    if name == "matern12":
        diag = A / (2.0 * ell * var) + ell * B / (2.0 * var)
        return jnp.diag(diag) + vv2 / (2.0 * var)

    C = jnp.asarray(fb.l2_diag(2), dtype)
    g = jnp.asarray(fb.boundary_value(1), dtype)
    gg2 = 2.0 * jnp.outer(g, g)

    if name == "matern32":
        diag = (
            _SQRT3 / (4.0 * ell * var) * A
            + ell / (2.0 * _SQRT3 * var) * B
            + ell**3 / (12.0 * _SQRT3 * var) * C
        )
        return jnp.diag(diag) + vv2 / (2.0 * var) + ell**2 / (2.0 * var) * gg2

    if name != "matern52":
        raise TypeError(f"unsupported kernel for Fourier features: {name}")

    D = jnp.asarray(fb.l2_diag(3), dtype)
    h = jnp.asarray(fb.boundary_value(2), dtype)
    hh2 = 2.0 * jnp.outer(h, h)
    cross2 = 2.0 * (jnp.outer(h, v) + jnp.outer(v, h))
    diag = (
        (3.0 * _SQRT5) / (16.0 * ell * var) * A
        + (9.0 * ell) / (16.0 * _SQRT5 * var) * B
        + (9.0 * ell**3) / (80.0 * _SQRT5 * var) * C
        + (3.0 * ell**5) / (400.0 * _SQRT5 * var) * D
    )
    return (
        jnp.diag(diag)
        + 9.0 / (16.0 * var) * vv2
        + (3.0 * ell**2) / (10.0 * var) * gg2
        + (9.0 * ell**4) / (400.0 * var) * hh2
        + (3.0 * ell**2) / (80.0 * var) * cross2
    )
