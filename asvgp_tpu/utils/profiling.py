"""Profiling helpers (SURVEY.md §5: tracing/profiling row).

The reference has only time.time() brackets; here we add
block_until_ready-accurate timers and a jax.profiler trace context for
per-kernel inspection on TPU.
"""

from __future__ import annotations

import contextlib
import time

import jax


def timed(fn, *args, reps: int = 5, warmup: int = 1, **kwargs):
    """Median wall time of a jitted callable with device sync.

    Returns (median_seconds, last_result).
    """
    import numpy as np

    result = None
    for _ in range(warmup):
        result = jax.block_until_ready(fn(*args, **kwargs))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        result = jax.block_until_ready(fn(*args, **kwargs))
        ts.append(time.time() - t0)
    return float(np.median(ts)), result


@contextlib.contextmanager
def trace_to(logdir: str):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
