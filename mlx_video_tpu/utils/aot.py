"""AOT executable cache: kill the per-process device-compile tax.

XLA:TPU through the axon tunnel defers the real device-side compile to the
first dispatch of an executable, and that deferred compile BYPASSES
``JAX_COMPILATION_CACHE_DIR`` — so every fresh process pays ~50 s of first
-dispatch compiles for the VAE decode stages alone, and minutes for the
48-layer DiT denoise scan, even with a warm persistent cache (measured,
PERF.md round 2: local ``jit(...).lower().compile()`` is 1.7 s while the
first execute is 55+ s).

``aot_jit`` is a drop-in for ``jax.jit`` that additionally persists the
COMPILED EXECUTABLE itself via ``jax.experimental.serialize_executable``
(PJRT ``serialize_executable`` — the device binary, not the HLO). A fresh
process ``deserialize_and_load``\\ s the binary and skips device compile
entirely. Keyed by function identity, static-argument values, input
shapes/dtypes/shardings, and a backend fingerprint; any failure on the
serialize/deserialize path falls back to plain ``jax.jit`` silently (the
cache is an optimization, never a correctness dependency).

The reference has no equivalent (mlx eagerly JIT-caches in-process only);
this is new-build infrastructure required by the tunnel's compile model.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import tempfile
import threading
import warnings
from functools import partial
from typing import Any, Callable, Optional

import jax

_LOCK = threading.Lock()
# (name, statics_key, avals_key) -> callable taking the dynamic args
_MEMORY: dict = {}
_WARNED: set = set()

_FORMAT_VERSION = 1


def aot_enabled() -> bool:
    """AOT executable caching is ON by default everywhere except pure-CPU
    runs (where jit compiles locally, the persistent cache works, and the
    deferred-device-compile pathology does not exist). ``MLX_VIDEO_AOT=1``
    forces it on (tests), ``MLX_VIDEO_AOT=0`` off."""
    env = os.environ.get("MLX_VIDEO_AOT")
    if env is not None:
        return env not in ("0", "false", "")
    try:
        return jax.default_backend() != "cpu"
    except Exception:
        return False


def aot_cache_dir() -> str:
    d = os.environ.get("MLX_VIDEO_AOT_CACHE")
    if not d:
        base = os.environ.get("JAX_COMPILATION_CACHE_DIR") or tempfile.gettempdir()
        d = os.path.join(base, "aot_exec")
    os.makedirs(d, exist_ok=True)
    return d


def clear_memory_cache() -> None:
    with _LOCK:
        _MEMORY.clear()


def _warn_once(key: str, msg: str) -> None:
    if key not in _WARNED:
        _WARNED.add(key)
        warnings.warn(msg, stacklevel=3)


def _backend_fingerprint() -> str:
    client = jax.devices()[0].client
    devs = jax.devices()
    return (
        f"jax={jax.__version__};platform={client.platform};"
        f"pv={client.platform_version};kind={devs[0].device_kind};n={len(devs)}"
    )


def _aval_key(args: tuple) -> str:
    import numpy as np

    parts = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(args)[0]:
        shape = np.shape(leaf)
        try:
            dtype = str(leaf.dtype)
        except AttributeError:
            dtype = np.result_type(leaf).name  # Python scalar
        # Python scalars trace as weak types; a weak- and a strong-typed
        # input need distinct executables.
        weak = int(bool(getattr(leaf, "weak_type", not hasattr(leaf, "dtype"))))
        shard = str(getattr(leaf, "sharding", ""))
        # preferred-layout placement (relayout_params) changes the executable
        # signature: two same-shaped args with different device layouts need
        # distinct cache entries
        try:
            fmt = str(leaf.format)
        except Exception:
            fmt = ""
        parts.append(
            f"{jax.tree_util.keystr(path)}:{dtype}{list(shape)}w{weak}:{shard}:{fmt}"
        )
    return "|".join(parts)


def _broken_marker() -> str:
    h = hashlib.sha256(_backend_fingerprint().encode()).hexdigest()[:12]
    return os.path.join(aot_cache_dir(), f"broken-{h}")


def _disk_ok() -> bool:
    """Some backends deserialize but fail at execution (XLA:CPU AOT rejects
    when compile-time machine features mismatch the host's). After one such
    failure we tombstone the backend fingerprint so later processes do not
    flip-flop between saving and failing to load."""
    return not os.path.exists(_broken_marker())


def _mark_broken(name: str, err: Exception) -> None:
    _warn_once(
        f"exec:{name}",
        f"aot: cached executable failed to execute for {name} ({err!r}); "
        "disabling disk cache for this backend",
    )
    try:
        with open(_broken_marker(), "w") as f:
            f.write(repr(err))
    except OSError:
        pass


def _disk_path(name: str, statics_key: str, avals_key: str) -> str:
    h = hashlib.sha256(
        "\x00".join(
            [str(_FORMAT_VERSION), _backend_fingerprint(), name, statics_key, avals_key]
        ).encode()
    ).hexdigest()[:20]
    return os.path.join(aot_cache_dir(), f"{name}-{h}.jaxexec")


def _try_load(path: str, name: str):
    """Disk -> jax.stages.Compiled, or None."""
    if not os.path.exists(path) or not _disk_ok():
        return None
    try:
        from jax.experimental import serialize_executable as se

        with open(path, "rb") as f:
            payload = pickle.load(f)
        if payload.get("version") != _FORMAT_VERSION:
            return None
        return se.deserialize_and_load(
            payload["bytes"], payload["in_tree"], payload["out_tree"]
        )
    except Exception as e:  # corrupt file, backend mismatch, plugin refusal
        _warn_once(f"load:{name}", f"aot: failed to load cached executable {path}: {e!r}")
        try:
            os.unlink(path)
        except OSError:
            pass
        return None


def _write_meta(path: str, fname: str, statics_key: str, avals_key: str) -> None:
    """Sidecar index entry so :func:`preload_disk_executables` can map a
    hashed ``.jaxexec`` file back to its memory-cache key."""
    meta = path + ".meta"
    if os.path.exists(meta):
        return
    try:
        import json

        tmp = f"{meta}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"fname": fname, "statics_key": statics_key,
                       "avals_key": avals_key}, f)
        os.replace(tmp, meta)
    except OSError:
        pass


def preload_disk_executables(
    names: tuple, max_bytes: int = 768 * 2**20, newest_first: bool = True
) -> int:
    """Deserialize-and-LOAD cached executables into the in-memory cache
    ahead of their first dispatch.

    On the axon tunnel the dominant first-dispatch cost of an AOT-cached
    stage is shipping the serialized program to the device (~2-3 s per
    decoder stage, PERF.md r3/r4) — pure host+tunnel work that can run on a
    side thread while the process does param synthesis/loading, leaving the
    decode phase only its actual chip work. Only entries with a ``.meta``
    sidecar can be preloaded (the sidecar is written on every save AND on
    every disk hit, so one prior run in an environment indexes the entries
    that environment uses); ``names`` filters by executable name,
    ``max_bytes`` bounds device program memory. Returns how many were
    loaded. Safe to call from a daemon thread; no arguments are
    materialized and nothing is dispatched."""
    import json

    if not aot_enabled() or not _disk_ok():
        return 0
    d = aot_cache_dir()
    try:
        entries = [
            os.path.join(d, f) for f in os.listdir(d) if f.endswith(".jaxexec")
        ]
    except OSError:
        return 0
    entries.sort(key=lambda p: os.path.getmtime(p), reverse=newest_first)
    loaded = 0
    budget = max_bytes
    for path in entries:
        meta_path = path + ".meta"
        if not os.path.exists(meta_path):
            continue
        try:
            with open(meta_path) as f:
                meta = json.load(f)
        except (OSError, ValueError):
            continue
        fname = meta.get("fname", "")
        if names and not any(fname.startswith(n) for n in names):
            continue
        size = os.path.getsize(path)
        if size > budget:
            continue
        mem_key = (fname, meta.get("statics_key", ""), meta.get("avals_key", ""))
        with _LOCK:
            if mem_key in _MEMORY:
                continue
        compiled = _try_load(path, fname)
        if compiled is None:
            continue
        with _LOCK:
            _MEMORY.setdefault(mem_key, compiled)
        budget -= size
        loaded += 1
    return loaded


def _try_save(path: str, compiled, name: str) -> None:
    if not _disk_ok():
        return
    try:
        from jax.experimental import serialize_executable as se

        data, in_tree, out_tree = se.serialize(compiled)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump(
                {
                    "version": _FORMAT_VERSION,
                    "bytes": data,
                    "in_tree": in_tree,
                    "out_tree": out_tree,
                },
                f,
            )
        os.replace(tmp, path)
    except Exception as e:  # plugin doesn't support serialization, const args…
        _warn_once(f"save:{name}", f"aot: executable not serializable for {name}: {e!r}")


def aot_jit(
    fn: Callable,
    *,
    static_argnames: tuple = (),
    name: Optional[str] = None,
    donate_argnames: tuple = (),
) -> Callable:
    """``jax.jit`` drop-in backed by an on-disk serialized-executable cache.

    Statics are split out by name and closed over (each distinct static
    combination is its own cache entry), so the compiled callable takes only
    the dynamic arguments — this sidesteps every static-handling subtlety in
    ``jax.stages.Compiled`` calling conventions. Dynamic args must be
    positional-or-keyword; we canonicalize to positional order.

    When AOT is disabled (CPU) this is EXACTLY ``jax.jit`` with the same
    statics — zero behavior change on the test path.
    """
    import inspect

    if isinstance(static_argnames, str):
        static_argnames = (static_argnames,)
    if isinstance(donate_argnames, str):
        donate_argnames = (donate_argnames,)
    fname = name or getattr(fn, "__name__", "fn")
    sig = inspect.signature(fn)
    param_names = tuple(sig.parameters)
    plain = jax.jit(
        fn, static_argnames=static_argnames or None, donate_argnames=donate_argnames or None
    )

    def wrapper(*args, **kwargs):
        if not aot_enabled():
            return plain(*args, **kwargs)
        # canonicalize: bind everything positionally in declaration order
        bound = sig.bind(*args, **kwargs)
        bound.apply_defaults()
        statics = {k: bound.arguments[k] for k in static_argnames}
        dynamic = tuple(
            bound.arguments[k] for k in param_names if k not in static_argnames
        )
        statics_key = repr(sorted(statics.items()))
        avals_key = _aval_key(dynamic)
        mem_key = (fname, statics_key, avals_key)
        with _LOCK:
            compiled = _MEMORY.get(mem_key)
        if compiled is not None:
            return _call(compiled, dynamic, mem_key, plain, args, kwargs)

        path = _disk_path(fname, statics_key, avals_key)
        compiled = _try_load(path, fname)
        if compiled is not None:
            _write_meta(path, fname, statics_key, avals_key)
            # First call of a DISK-loaded binary gets a broad guard: some
            # backends deserialize fine but refuse at execution (XLA:CPU
            # machine-feature mismatch). Donation is plumbed but our AOT'd
            # stages don't donate loaded-from-disk-and-failing buffers in
            # practice; a genuine numerical error reproduces in the plain
            # re-dispatch below.
            try:
                out = compiled(*dynamic)
                with _LOCK:
                    _MEMORY[mem_key] = compiled
                return out
            except Exception as e:
                _mark_broken(fname, e)
                try:
                    os.unlink(path)
                except OSError:
                    pass

        dyn_names = tuple(k for k in param_names if k not in static_argnames)

        def fn_dyn(*dyn):
            return fn(**dict(zip(dyn_names, dyn)), **statics)

        donate = tuple(i for i, k in enumerate(dyn_names) if k in donate_argnames)
        compiled = (
            jax.jit(fn_dyn, donate_argnums=donate or None).lower(*dynamic).compile()
        )
        _try_save(path, compiled, fname)
        _write_meta(path, fname, statics_key, avals_key)
        # Execute the RELOADED binary, not the locally-compiled object: the
        # serialized payload embeds the device program, so its first dispatch
        # skips XLA:TPU's deferred device-side compile (~2.5 s vs 332 s
        # measured on a decoder stage, PERF.md r3) — without this the SAVE
        # process pays the full per-stage tax the cache exists to kill.
        # Same broad first-execute guard as the disk-hit branch above: a
        # backend that deserializes but refuses to execute tombstones and
        # falls back to the locally-compiled object. CPU skips the swap:
        # XLA:CPU has no deferred device compile to dodge, and its AOT
        # binaries routinely refuse to execute (the tombstone case) — the
        # swap would burn the disk cache on the first save. Donating stages
        # also skip it: if the reloaded binary consumed (donated) the inputs
        # and THEN failed, the locally-compiled fallback would re-execute on
        # deleted buffers and raise a confusing secondary error.
        reloaded = (
            None
            if jax.default_backend() == "cpu" or donate
            else _try_load(path, fname)
        )
        if reloaded is not None:
            try:
                out = reloaded(*dynamic)
                with _LOCK:
                    _MEMORY[mem_key] = reloaded
                return out
            except Exception as e:
                _mark_broken(fname, e)
                try:
                    os.unlink(path)
                except OSError:
                    pass
        with _LOCK:
            _MEMORY[mem_key] = compiled
        return _call(compiled, dynamic, mem_key, plain, args, kwargs)

    def _call(compiled, dynamic, mem_key, plain, args, kwargs):
        try:
            return compiled(*dynamic)
        except (TypeError, ValueError) as e:
            # Input-signature/sharding mismatch with a cached executable —
            # raised during argument validation, BEFORE any buffer donation,
            # so re-dispatching through plain jit is safe.
            _warn_once(
                f"call:{mem_key[0]}",
                f"aot: cached executable rejected inputs for {mem_key[0]} "
                f"({e!r}); falling back to jit",
            )
            with _LOCK:
                _MEMORY.pop(mem_key, None)
            return plain(*args, **kwargs)

    wrapper.__name__ = f"aot_{fname}"
    wrapper.__wrapped__ = fn
    # jax.jit API parity used by cache-growth regression tests: entries in
    # the plain jit cache plus this function's AOT memory entries.
    wrapper._cache_size = lambda: plain._cache_size() + sum(
        1 for k in _MEMORY if k[0] == fname
    )
    return wrapper


def aot_partial(*, static_argnames: tuple = (), donate_argnames: tuple = ()):
    """Decorator form mirroring ``partial(jax.jit, static_argnames=...)``."""
    return partial(
        aot_jit, static_argnames=static_argnames, donate_argnames=donate_argnames
    )
