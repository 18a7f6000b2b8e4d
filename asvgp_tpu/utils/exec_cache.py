"""Cross-process disk cache of COMPILED PjRt executables.

Round-3 cached the fit loop as a ``jax.export`` StableHLO blob — but the
export ROUND-TRIP changes what XLA compiles (extra call boundary / lost
layouts), which regressed the eNATL optimization exec 32.5 -> 213 s per
100 iters at identical ELBO (ENATL_RUN r3 vs r2; tools/export_ab_probe.py
discriminates).  ``jax.experimental.serialize_executable`` instead
round-trips the compiled executable BIT-EXACTLY on this platform
(tools/exec_serialize_probe.py: in-process and cross-process max abs diff
0.0; deserialize 0.1 s vs minutes of relay compile), so the disk cache can
store the executable itself:

  cold: compile the DIRECT jit lowering (no export round-trip — exec
        performance is structurally identical to no caching at all), then
        serialize the executable to disk;
  warm: deserialize (~0.1 s) — skips the trace AND the relay compile/load.

Keys must capture everything that affects the executable: the traced
computation (jaxpr digest), argument avals, static options, platform, and
the sources of code whose changes a jaxpr digest can miss (Pallas kernel
bodies live in eqn params as bare function objects).
"""

from __future__ import annotations

import hashlib
import os
import pickle

import jax

# bump to invalidate all cached executables on a semantic change to the
# caching layer itself
_SCHEMA = "pjrt1"


def digest_paths(root_subdirs=("banded", "train")) -> list[str]:
    """The package source files whose content keys cached executables:
    the Pallas/DS kernel modules (their bodies appear in jaxpr eqn params
    only as function objects, invisible to a structural jaxpr digest) and
    the training loop itself.  Deliberately NOT the whole package — a
    comment edit in e.g. models/vff.py must not invalidate the eNATL
    fit-loop blob (round-3 VERDICT weak #7)."""
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = []
    for sub in root_subdirs:
        d = os.path.join(pkg, sub)
        for dirpath, dirnames, filenames in sorted(os.walk(d)):
            dirnames.sort()
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    out.append(os.path.join(dirpath, fn))
    return out


_KERNEL_DIGEST = None


def kernel_source_digest() -> str:
    global _KERNEL_DIGEST
    if _KERNEL_DIGEST is None:
        h = hashlib.sha256()
        h.update(_SCHEMA.encode())
        h.update(jax.__version__.encode())
        import optax

        h.update(getattr(optax, "__version__", "?").encode())
        for p in digest_paths():
            h.update(p.encode())
            with open(p, "rb") as f:
                h.update(f.read())
        _KERNEL_DIGEST = h.hexdigest()[:16]
    return _KERNEL_DIGEST


def avals_digest(tree) -> str:
    avals = tuple(
        (a.shape, str(a.dtype)) if hasattr(a, "shape") else repr(a)
        for a in jax.tree.leaves(tree)
    )
    return hashlib.sha256(repr(avals).encode()).hexdigest()[:16]


def jaxpr_digest(closed) -> str:
    """Process-stable structural hash of a ClosedJaxpr (primitives, avals,
    simple params; sub-jaxprs recursively, memoized).  Deliberately skips
    non-serializable eqn params (functions/objects print memory addresses,
    which would make the key different in every process) — which is why
    kernel_source_digest() must accompany it in any cache key."""
    h = hashlib.sha256()
    seen = set()
    simple = (int, float, bool, str, bytes, type(None))

    def hp(name, val):
        if isinstance(val, simple):
            h.update(f"{name}={val!r};".encode())
        elif isinstance(val, (tuple, list)):
            h.update(f"{name}[".encode())
            for v in val:
                hp("", v)
            h.update(b"]")
        elif hasattr(val, "jaxpr"):
            visit(val.jaxpr)
        elif type(val).__name__ == "Jaxpr":
            visit(val)
        else:
            h.update(f"{name}:{type(val).__name__};".encode())

    def visit(jx):
        if id(jx) in seen:
            h.update(b"ref;")
            return
        seen.add(id(jx))
        for v in list(jx.constvars) + list(jx.invars):
            h.update(str(v.aval).encode())
        for eqn in jx.eqns:
            h.update(eqn.primitive.name.encode())
            for v in eqn.invars:
                h.update(str(v).encode() if not hasattr(v, "aval")
                         else str(v.aval).encode())
            for name in sorted(eqn.params):
                hp(name, eqn.params[name])

    visit(closed.jaxpr)
    return h.hexdigest()[:24]


def params_device(params):
    """The device the computation actually runs on: the params' committed
    device if any (e.g. a CPU-f64 leg under jax.default_device(cpu) while
    the process default is the TPU), else the default backend's first."""
    for leaf in jax.tree.leaves(params):
        devs = getattr(leaf, "devices", None)
        if callable(devs):
            ds = devs()
            if ds:
                return next(iter(ds))
    return jax.devices(jax.default_backend())[0]


def params_platform(params, default=None) -> str:
    return params_device(params).platform


def init_device(tree):
    """Device to commit freshly built params to: the single device the
    model's stats live on, or None when the stats are sharded over a mesh —
    committing params to one device makes mesh-jitted DP steps reject them
    ("Received incompatible devices"); uncommitted host values are placed
    by the consuming jit instead."""
    for leaf in jax.tree.leaves(tree):
        devs = getattr(leaf, "devices", None)
        if callable(devs):
            ds = devs()
            if len(ds) > 1:
                return None
            if ds:
                return next(iter(ds))
    return jax.devices(jax.default_backend())[0]


def load_executable(path, device=None):
    """Deserialize a compiled executable saved by save_executable.  Returns
    the loaded callable or None (missing/corrupt/incompatible blob — the
    caller falls back to a fresh compile).

    ``device``: the single device to load onto.  Must be passed for
    single-device executables: deserialize_and_load defaults to ALL the
    backend's devices, which mis-loads a 1-device program as 8-way sharded
    on the virtual CPU test mesh."""
    if not os.path.exists(path):
        return None
    try:
        from jax.experimental import serialize_executable as se

        with open(path, "rb") as f:
            payload, in_tree, out_tree = pickle.load(f)
        kw = {}
        if device is not None:
            kw = {"backend": device.client, "execution_devices": [device]}
        return se.deserialize_and_load(payload, in_tree, out_tree, **kw)
    except Exception:
        return None


def default_dir():
    """Process-wide disk-cache directory for cached_compile, from
    ASVGP_EXEC_CACHE_DIR.  None (the default) disables cross-process
    caching — in-process jit caching still applies as usual."""
    return os.environ.get("ASVGP_EXEC_CACHE_DIR") or None


_PKG_DIGEST = None


def package_source_digest() -> str:
    """Digest of ALL package sources.  Used to key executables of functions
    that close over model/basis code (posterior factorizations, predictors)
    where — unlike the hoisted fit loop — no jaxpr digest is computed, so
    any package edit must invalidate."""
    global _PKG_DIGEST
    if _PKG_DIGEST is None:
        pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        h = hashlib.sha256()
        h.update(_SCHEMA.encode())
        h.update(jax.__version__.encode())
        for dirpath, dirnames, filenames in sorted(os.walk(pkg)):
            dirnames.sort()
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    p = os.path.join(dirpath, fn)
                    h.update(p.encode())
                    with open(p, "rb") as f:
                        h.update(f.read())
        _PKG_DIGEST = h.hexdigest()[:16]
    return _PKG_DIGEST


_MEMO: dict = {}


def cached_compile(jitted, static_args, dyn_args, *, tag: str, device=None,
                   timings=None):
    """Compile ``jitted(*static_args, *dyn_args)`` (a jax.jit-wrapped
    callable with its static_argnames leading) with an in-process memo AND
    (if default_dir() is set) a cross-process disk cache of the compiled
    executable.  Returns the compiled object, to be invoked with the
    DYNAMIC arguments only (statics are baked in at compile time).

    ``tag`` must uniquely identify the computation AND every value in
    ``static_args`` or closed over that is not visible in the dyn avals
    (basis domain and tables, kernel order, backend choice...) — the caller
    owns this; static objects are deliberately NOT hashed here because
    their reprs are process-unstable.  The key adds the dynamic-argument
    avals, the platform, and the package source digest, so code edits
    invalidate.

    ``timings`` (optional dict) records trace_s / load_s like fit_lbfgs.
    """
    import time as _time

    if device is None:
        device = jax.devices(jax.default_backend())[0]
    key = "-".join([
        tag,
        avals_digest(dyn_args),
        device.platform,
        package_source_digest(),
    ])
    compiled = _MEMO.get(key)
    if compiled is not None:
        if timings is not None:
            timings.setdefault("trace_s", 0.0)
            timings.setdefault("load_s", 0.0)
        return compiled

    cache_dir = default_dir()
    t0 = _time.time()
    if cache_dir is not None:
        os.makedirs(cache_dir, exist_ok=True)
        path = os.path.join(
            cache_dir,
            "x-" + hashlib.sha256(key.encode()).hexdigest()[:24] + ".pjrt",
        )
        compiled = load_executable(path, device)
        if compiled is not None:
            if timings is not None:
                timings["trace_s"] = round(0.0, 2)
                timings["load_s"] = round(_time.time() - t0, 2)
            _MEMO[key] = compiled
            return compiled
    lowered = jitted.lower(*static_args, *dyn_args)
    if timings is not None:
        timings["trace_s"] = round(_time.time() - t0, 2)
    t0 = _time.time()
    compiled = lowered.compile()
    if cache_dir is not None:
        save_executable(path, compiled)
    if timings is not None:
        timings["load_s"] = round(_time.time() - t0, 2)
    _MEMO[key] = compiled
    return compiled


def save_executable(path, compiled) -> bool:
    """Serialize a compiled executable to ``path`` (atomic rename).  Returns
    False (and leaves no file) if this executable/platform can't serialize."""
    try:
        from jax.experimental import serialize_executable as se

        payload, in_tree, out_tree = se.serialize(compiled)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump((payload, in_tree, out_tree), f)
        os.replace(tmp, path)
        return True
    except Exception:
        return False
