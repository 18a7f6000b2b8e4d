"""Full-batch L-BFGS training (pure JAX, fully jitted).

Equivalent of ``gpflow.optimizers.Scipy`` (SciPy L-BFGS-B driving TF
autodiff) used by every reference experiment (e.g.
experiments/snelson/example.py:31-32).  Here the entire optimization loop —
line search included — runs on device via optax.lbfgs inside one
``lax.while_loop``, so hyperparameter training is a single XLA program with
no host round-trips per iteration.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax
import optax.tree_utils as otu


def fit_lbfgs(loss_fn, params, *, max_iters: int = 500, tol: float = 1e-8,
              memory_size: int = 20, timings: dict | None = None):
    """Minimize ``loss_fn`` over the ``params`` pytree with L-BFGS + zoom
    line search.  Returns (params, final_loss, num_iters).

    ``loss_fn``'s closed-over arrays (model sufficient statistics — MBs at
    the eNATL scale) are hoisted into runtime arguments with
    ``jax.closure_convert`` before jitting: otherwise they are embedded in
    the HLO as literal constants, which bloats the executable (176 MB
    observed), slows compilation, and makes the persistent-compile-cache
    key depend on the data values so no two runs ever share a cache entry.

    ``timings``: optional dict; if given, the trace / compile-or-load /
    execute phases are staged separately and their wall-times recorded
    under ``trace_s``, ``load_s``, ``exec_s`` (the north-star artifact
    reports this split: on the benching image the remote-compile relay
    makes load a large, hardware-independent constant).
    """
    opt = optax.lbfgs(
        memory_size=memory_size,
        linesearch=optax.scale_by_zoom_linesearch(max_linesearch_steps=30),
    )

    closed_fn, consts = jax.closure_convert(loss_fn, params)

    def run(params, consts):
        def loss(p):
            return closed_fn(p, *consts)

        value_and_grad = optax.value_and_grad_from_state(loss)

        def step(carry):
            params, state = carry
            value, grad = value_and_grad(params, state=state)
            updates, state = opt.update(
                grad, state, params, value=value, grad=grad, value_fn=loss
            )
            params = optax.apply_updates(params, updates)
            return params, state

        def continuing(carry):
            _, state = carry
            count = otu.tree_get(state, "count")
            grad = otu.tree_get(state, "grad")
            err = otu.tree_norm(grad)
            return (count == 0) | ((count < max_iters) & (err >= tol))

        state = opt.init(params)
        params, state = jax.lax.while_loop(continuing, step, (params, state))
        # the line search stored loss(params) for the accepted step — reuse
        # it instead of a third in-graph ELBO copy (smaller executable,
        # one less kernel trace)
        return (
            params,
            otu.tree_get(state, "count"),
            otu.tree_get(state, "value"),
        )

    if timings is None:
        params, iters, final_loss = jax.jit(run)(params, consts)
    else:
        import time as _time

        t0 = _time.time()
        lowered = jax.jit(run).lower(params, consts)
        timings["trace_s"] = round(_time.time() - t0, 2)
        t0 = _time.time()
        compiled = lowered.compile()
        timings["load_s"] = round(_time.time() - t0, 2)
        t0 = _time.time()
        params, iters, final_loss = jax.block_until_ready(
            compiled(params, consts)
        )
        float(final_loss)
        timings["exec_s"] = round(_time.time() - t0, 2)
    return params, final_loss, iters
