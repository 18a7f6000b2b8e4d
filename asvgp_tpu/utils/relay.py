"""TPU relay health poll.

The TPU on this image is single-tenant behind a relay: a process that
crashes (or is killed) while holding the grant leaves the NEXT process's
first TPU op stalled ~250 s before it proceeds (claim_timeout_s=-1 means it
never errors, it just waits).  Any timing artifact captured without first
absorbing that wait silently folds a quarter-minute of relay bookkeeping
into whatever phase happened to issue the first device op (this polluted
the round-3 NORTHSTAR warm precompute: 256.8 s "warm" = ~250 s grant wait
+ ~6 s work).

``ensure_tpu_ready`` issues one tiny op on the device and blocks until it
completes, so every timed phase that follows starts with the grant already
held.  It runs the op in a daemon thread so a wedged relay (grant never
released) raises after ``timeout_s`` instead of hanging the tool forever.
The default timeout is a full hour: in degraded windows a HEALTHY grant
has been observed to take 1000-1300 s per fresh process (2026-08-21), and
a poll that gives up earlier turns a slow-but-working relay into a failed
artifact run.

Usage (before starting any timers):

    from asvgp_tpu.utils.relay import ensure_tpu_ready
    wait_s = ensure_tpu_ready()   # record separately, never inside a phase
"""

from __future__ import annotations

import threading
import time

import jax
import jax.numpy as jnp


def ensure_tpu_ready(device=None, timeout_s: float = 3600.0) -> float:
    """Block until a tiny op completes on ``device`` (default: the first
    device of the default backend).  Returns the wall-clock seconds the op
    took — the relay grant wait plus one tiny compile.  Raises
    ``TimeoutError`` if the relay does not grant within ``timeout_s``.

    On a CPU-only process this returns almost immediately.
    """
    if device is None:
        device = jax.devices()[0]
    t0 = time.time()
    done = threading.Event()
    err: list[BaseException] = []

    def probe():
        try:
            x = jax.device_put(jnp.float32(1.0), device)
            # force the result to HOST: on this relay block_until_ready can
            # acknowledge before the device-to-host path has produced
            # anything (CLAUDE.md), and the D2H path can degrade to
            # multi-minute stalls independently of the grant (observed
            # 2026-08-20: grant in 0.9 s, an 8-element sum never returned
            # within 500 s; every timed phase that day was polluted).  A
            # health poll that only checks the grant passes right through
            # that failure mode.
            if float(x + 1.0) != 2.0:
                raise RuntimeError("TPU relay returned a wrong value")
            done.set()
        except BaseException as e:  # surfaced to the caller below
            err.append(e)
            done.set()

    th = threading.Thread(target=probe, daemon=True)
    th.start()
    if not done.wait(timeout_s):
        raise TimeoutError(
            f"TPU relay did not grant within {timeout_s:.0f}s — another "
            "process is holding the single-tenant grant (or the relay is "
            "wedged); refusing to start timed work"
        )
    if err:
        raise err[0]
    return time.time() - t0
