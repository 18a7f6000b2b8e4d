"""Checkpoint / resume for hyperparameters and optimizer state.

The reference has no parameter save/restore at all (SURVEY.md §5 — it
pickles end-of-run metric DataFrames only).  Models here are tiny pytrees
(a handful of scalars + static tables), so a simple msgpack-free pytree
dump suffices; deterministic resume of L-BFGS/Adam follows from saving the
optimizer state alongside.
"""

from __future__ import annotations

import pickle

import jax
import numpy as np


def save_pytree(path: str, tree) -> None:
    leaves, treedef = jax.tree.flatten(tree)
    payload = {
        "leaves": [np.asarray(l) for l in leaves],
        "treedef": str(treedef),
    }
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def load_pytree(path: str, like):
    """Load leaves saved by save_pytree into the structure of ``like``.

    The stored treedef string must match ``like``'s exactly — a silent
    positional restore into a structurally different pytree would scramble
    parameters."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    leaves, treedef = jax.tree.flatten(like)
    saved = payload["leaves"]
    if len(saved) != len(leaves):
        raise ValueError(
            f"checkpoint has {len(saved)} leaves, expected {len(leaves)}"
        )
    saved_def = payload.get("treedef")
    if saved_def is not None and saved_def != str(treedef):
        raise ValueError(
            "checkpoint pytree structure does not match the target:\n"
            f"  saved:  {saved_def}\n  target: {treedef}"
        )
    shapes = [(np.shape(s), np.shape(l)) for s, l in zip(saved, leaves)]
    bad = [i for i, (a, b) in enumerate(shapes) if a != b]
    if bad:
        raise ValueError(
            f"checkpoint leaf shapes differ at indices {bad}: "
            f"{[shapes[i] for i in bad]}"
        )
    import jax.numpy as jnp

    new_leaves = [jnp.asarray(s, dtype=l.dtype) for s, l in zip(saved, leaves)]
    return jax.tree.unflatten(treedef, new_leaves)
