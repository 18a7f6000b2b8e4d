"""Benchmark metrics with the reference's definitions (SURVEY.md §5).

NLPD = mean negative predictive log density (reference electricity.py:122);
MSE = mean squared error of the predictive mean (electricity.py:123).
"""

from __future__ import annotations

import jax.numpy as jnp


def mse(y_true, y_pred):
    return jnp.mean(jnp.square(jnp.reshape(y_true, (-1,)) - jnp.reshape(y_pred, (-1,))))


def nlpd(log_densities):
    return -jnp.mean(log_densities)
