"""Disk cache for AUTO-layout discovery results.

Why: placing the 19B param stacks in XLA's preferred input layouts before
a scan compiles is what lets the batched-CFG dev scan fit one 16 GB chip
(pipelines/denoise.preferred_param_formats). But the discovery itself is
an AUTO-layout ``lower().compile()`` through the remote compile helper —
measured 8–20 s per geometry per process even with a warm persistent XLA
cache, and ``generate_video`` runs it once per stage: the warm config-4
drive spent 59 s (66 % of its on-chip phase total) in ``layout_opt``.

The discovered formats are tiny and fully serializable —
``(major_to_minor, tiling, sub_byte_element_size_in_bits)`` per leaf — so
they are cached on disk keyed by everything that determines them: leaf
paths/shapes/dtypes, the abstract scan operands, the static flags, the
jax version and the device kind. A hit skips the AUTO compile entirely;
layouts are a pure performance property, so a stale entry (key collision
aside) can only cost copies, never correctness.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile

import jax

_DIRNAME = "layout_formats"


def _cache_dir() -> str:
    base = os.environ.get("MLX_VIDEO_LAYOUT_CACHE")
    if not base:
        base = os.path.join(
            os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"), _DIRNAME
        )
    return base


def _enabled() -> bool:
    return os.environ.get("MLX_VIDEO_LAYOUT_CACHE_DISABLE") != "1"


def _leaf_sig(x) -> list:
    if hasattr(x, "shape"):
        return [list(map(int, x.shape)), str(x.dtype)]
    return [repr(x)]


def cache_key(tag: str, trees, statics) -> str:
    """Stable key over leaf avals + statics + backend identity.

    Trace-affecting env dials are salted in: they change the traced HLO,
    so layouts discovered under one setting must not be replayed under
    another."""
    import os

    dev = jax.local_devices()[0]
    ident = [
        tag,
        jax.__version__,
        jax.default_backend(),
        getattr(dev, "device_kind", str(dev)),
        os.environ.get("MLX_VIDEO_SCAN_WEIGHTS", "xs"),
        [
            [jax.tree_util.keystr(path), _leaf_sig(leaf)]
            for tree in trees
            for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
        ],
        repr(statics),
    ]
    return hashlib.sha256(json.dumps(ident, sort_keys=True).encode()).hexdigest()[:32]


def _format_leaf_to_json(f) -> list:
    l = f.layout
    return [
        list(map(int, l.major_to_minor)),
        # preserve the () vs None distinction exactly (None = backend
        # default tiling; () = explicitly untiled)
        None if l.tiling is None else [list(map(int, t)) for t in l.tiling],
        int(l._sub_byte_element_size_in_bits),
    ]


def load_formats(key: str, template_tree):
    """Return the cached Format pytree shaped like ``template_tree``, or
    None on miss/any error."""
    if not _enabled():
        return None
    path = os.path.join(_cache_dir(), f"{key}.json")
    try:
        with open(path) as fh:
            data = json.load(fh)
    except (OSError, ValueError):
        return None
    try:
        from jax.experimental.layout import Format, Layout
        from jax.sharding import SingleDeviceSharding

        dev = jax.local_devices()[0]
        leaves, treedef = jax.tree_util.tree_flatten(template_tree)
        if len(data) != len(leaves):
            return None
        fmts = [
            Format(
                Layout(
                    major_to_minor=tuple(mtm),
                    tiling=None if tiling is None else tuple(tuple(t) for t in tiling),
                    sub_byte_element_size_in_bits=sub,
                ),
                SingleDeviceSharding(dev),
            )
            for mtm, tiling, sub in data
        ]
        return jax.tree_util.tree_unflatten(treedef, fmts)
    except Exception:
        return None


def save_formats(key: str, formats) -> None:
    """Persist a Format pytree (atomic write; best-effort)."""
    if not _enabled():
        return
    try:
        data = [_format_leaf_to_json(f) for f in jax.tree_util.tree_leaves(formats)]
        d = _cache_dir()
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
        with os.fdopen(fd, "w") as fh:
            json.dump(data, fh)
        os.replace(tmp, os.path.join(d, f"{key}.json"))
    except Exception:
        pass
