"""Gaussian likelihood (equivalent of gpflow.likelihoods.Gaussian)."""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Gaussian:
    variance: jnp.ndarray

    def __init__(self, variance=1.0):
        object.__setattr__(self, "variance", jnp.asarray(variance, jnp.result_type(float)))

    def predict_log_density(self, f_mean, f_var, y):
        """log N(y | f_mean, f_var + σ²) — the NLPD integrand (SURVEY.md §5)."""
        v = f_var + self.variance
        return -0.5 * (math.log(2.0 * math.pi) + jnp.log(v) + (y - f_mean) ** 2 / v)

    def predict_mean_and_var(self, f_mean, f_var):
        return f_mean, f_var + self.variance

    def tree_flatten(self):
        return (self.variance,), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        object.__setattr__(obj, "variance", children[0])
        return obj
