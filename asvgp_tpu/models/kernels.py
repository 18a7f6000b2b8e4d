"""Matérn kernels (1/2, 3/2, 5/2) as plain pytrees.

Pure-JAX equivalents of ``gpflow.kernels.Matern{12,32,52}`` as consumed by
the reference (SURVEY.md §2.3): trainable ``variance`` and ``lengthscales``,
``K``/``K_diag`` for dense oracles and baselines, and a ``name`` tag that
dispatches the RKHS-norm formula in features/spline_features.py (the
reference dispatches on the gpflow class, asvgp/inducing_features.py:16-44).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

_SQRT3 = math.sqrt(3.0)
_SQRT5 = math.sqrt(5.0)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Matern:
    variance: jnp.ndarray
    lengthscales: jnp.ndarray
    nu2: int  # 2*nu: 1, 3 or 5 (static)

    def __init__(self, variance=1.0, lengthscales=1.0, *, nu2=3):
        if nu2 not in (1, 3, 5):
            raise ValueError("nu2 must be 1, 3 or 5")
        object.__setattr__(self, "variance", jnp.asarray(variance, jnp.result_type(float)))
        object.__setattr__(self, "lengthscales", jnp.asarray(lengthscales, jnp.result_type(float)))
        object.__setattr__(self, "nu2", nu2)

    @property
    def name(self) -> str:
        return {1: "matern12", 3: "matern32", 5: "matern52"}[self.nu2]

    def K_diag(self, X):
        n = jnp.shape(jnp.reshape(X, (-1,)))[0]
        return self.variance * jnp.ones((n,), dtype=self.variance.dtype)

    def K(self, X, X2=None):
        x = jnp.reshape(X, (-1, 1))
        x2 = x if X2 is None else jnp.reshape(X2, (-1, 1))
        r = jnp.abs(x - x2.T) / self.lengthscales
        if self.nu2 == 1:
            return self.variance * jnp.exp(-r)
        if self.nu2 == 3:
            s = _SQRT3 * r
            return self.variance * (1.0 + s) * jnp.exp(-s)
        s = _SQRT5 * r
        return self.variance * (1.0 + s + s * s / 3.0) * jnp.exp(-s)

    def tree_flatten(self):
        return (self.variance, self.lengthscales), (self.nu2,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        object.__setattr__(obj, "variance", children[0])
        object.__setattr__(obj, "lengthscales", children[1])
        object.__setattr__(obj, "nu2", aux[0])
        return obj


def Matern12(variance=1.0, lengthscales=1.0):
    return Matern(variance, lengthscales, nu2=1)


def Matern32(variance=1.0, lengthscales=1.0):
    return Matern(variance, lengthscales, nu2=3)


def Matern52(variance=1.0, lengthscales=1.0):
    return Matern(variance, lengthscales, nu2=5)
