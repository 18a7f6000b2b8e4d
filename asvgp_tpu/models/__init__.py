"""Model classes: GPR1D (flagship), GPRKron, GPRAdditive, oracles."""

from asvgp_tpu.models.kernels import Matern, Matern12, Matern32, Matern52
from asvgp_tpu.models.likelihoods import Gaussian
from asvgp_tpu.models.gpr1d import GPR1D, Posterior1D
from asvgp_tpu.models.kron import GPRKron
from asvgp_tpu.models.additive import GPRAdditive
from asvgp_tpu.models.exact_gp import ExactGPR
from asvgp_tpu.models.svgp import SVGP1D

__all__ = [
    "Matern",
    "Matern12",
    "Matern32",
    "Matern52",
    "Gaussian",
    "GPR1D",
    "Posterior1D",
    "GPRKron",
    "GPRAdditive",
    "ExactGPR",
    "SVGP1D",
]
