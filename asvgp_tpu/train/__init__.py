"""Training loops, metrics, checkpointing."""

from asvgp_tpu.train.lbfgs import fit_lbfgs
from asvgp_tpu.train.metrics import mse, nlpd

__all__ = ["fit_lbfgs", "mse", "nlpd"]
