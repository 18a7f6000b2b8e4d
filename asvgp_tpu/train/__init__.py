"""Training loops, metrics, checkpointing."""

from asvgp_tpu.train.lbfgs import fit_lbfgs
from asvgp_tpu.train.adam import fit_adam_minibatch
from asvgp_tpu.train.metrics import mse, nlpd
from asvgp_tpu.train.checkpoint import save_pytree, load_pytree

__all__ = [
    "fit_lbfgs",
    "fit_adam_minibatch",
    "mse",
    "nlpd",
    "save_pytree",
    "load_pytree",
]
