"""Model classes: GPR1D (flagship), additive / Kronecker variants, oracles."""

from asvgp_tpu.models.kernels import Matern, Matern12, Matern32, Matern52
from asvgp_tpu.models.likelihoods import Gaussian
from asvgp_tpu.models.gpr1d import GPR1D
from asvgp_tpu.models.exact_gp import ExactGPR

__all__ = [
    "Matern",
    "Matern12",
    "Matern32",
    "Matern52",
    "Gaussian",
    "GPR1D",
    "ExactGPR",
]
