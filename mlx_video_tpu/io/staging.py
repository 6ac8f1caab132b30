"""int8 transfer parking for low_memory aux-stage params.

Under ``low_memory`` the upsampler / VAE decoder / audio stacks shuttle
between host RAM and HBM around the 19B denoise stages (reference parity:
mlx_video/generate.py:3504-3506 serial load/free choreography). Each stack
is ~1 GB bf16, and the host<->device link — PCIe on a real host, the axon
tunnel here — is the entire phase cost now that compute is AOT-cached
(PERF.md r3: upsample 32.7 s ≈ one bf16 staging transfer).

This module halves the bytes on the wire: weights are parked host-side as
symmetric **per-group** int8 (groups of ``_GROUP_SIZE`` elements along the
flattened reduction axes, one fp32 scale per (group, output-channel)),
transferred in that form, and dequantized to the original dtype on device
in ONE jitted dispatch. Per-group scales bound the round-trip error by the
group's local amax instead of the whole reduction fan-in's (a 3x3x3x512
conv channel shares one scale across 13 824 elements per-channel, but only
64 per-group) — measured e2e drift is >40 dB PSNR vs bf16 staging
(tests/test_staging.py). Scale overhead is 4/_GROUP_SIZE of the int8
payload (~6% at 64). Opt-in via ``generate_video(aux_int8_staging=True)``
/ ``--aux-stage-int8``.

Only leaves with ndim >= 2 and size >= _MIN_QUANT_SIZE are quantized —
biases, norms, and per-channel statistics ride raw (they are a rounding
error of the transfer).

The ``unpark_begin`` / ``unpark_finish`` split exists for staging overlap:
``begin`` only *issues* the async host->device copies (int8 bytes on the
wire) and returns a handle; ``finish`` dispatches the dequant and blocks.
generate_video issues ``begin`` while the denoise scan is still executing
so the transfer rides the DMA engines under compute instead of serializing
after it.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

_MIN_QUANT_SIZE = 65536
_GROUP_SIZE = 64
_PARK_KEY = "__int8_parked__"


def _should_quantize(leaf) -> bool:
    if not hasattr(leaf, "dtype") or not jnp.issubdtype(leaf.dtype, jnp.floating):
        return False
    return leaf.ndim >= 2 and leaf.size >= _MIN_QUANT_SIZE


def _is_parked_leaf(x) -> bool:
    return isinstance(x, dict) and _PARK_KEY in x


def _quantize_np(w: np.ndarray) -> dict:
    """Host-side quantize: per-group symmetric int8 (see module docstring)."""
    f = w.astype(np.float32)
    cout = f.shape[-1]
    r = f.reshape(-1, cout)
    rows = r.shape[0]
    n_groups = -(-rows // _GROUP_SIZE)
    pad = n_groups * _GROUP_SIZE - rows
    if pad:
        r = np.concatenate([r, np.zeros((pad, cout), np.float32)], axis=0)
    g = r.reshape(n_groups, _GROUP_SIZE, cout)
    amax = np.max(np.abs(g), axis=1)
    scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.rint(g / scale[:, None, :]), -127, 127).astype(np.int8)
    q = q.reshape(n_groups * _GROUP_SIZE, cout)[:rows].reshape(w.shape)
    return {_PARK_KEY: True, "q": q, "scale": scale, "dtype": str(w.dtype)}


def _quantize_jnp(w: jax.Array):
    """Device-side quantize (jit-traceable) — halves the DOWNLOAD too when
    the params start on device (fresh load path). Returns ARRAYS ONLY
    (q, scale): strings are not JAX types, so the parked dict (which keeps
    the dtype as a string) is assembled by the Python caller."""
    f = w.astype(jnp.float32)
    cout = f.shape[-1]
    r = f.reshape(-1, cout)
    rows = r.shape[0]
    n_groups = -(-rows // _GROUP_SIZE)
    pad = n_groups * _GROUP_SIZE - rows
    if pad:
        r = jnp.concatenate([r, jnp.zeros((pad, cout), jnp.float32)], axis=0)
    g = r.reshape(n_groups, _GROUP_SIZE, cout)
    amax = jnp.max(jnp.abs(g), axis=1)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0).astype(jnp.float32)
    q = jnp.clip(jnp.rint(g / scale[:, None, :]), -127, 127).astype(jnp.int8)
    q = q.reshape(n_groups * _GROUP_SIZE, cout)[:rows].reshape(w.shape)
    return q, scale


def _leaf_on_accelerator(leaf) -> bool:
    devs = getattr(leaf, "devices", None)
    if devs is None:
        return False
    try:
        return all(d.platform != "cpu" for d in leaf.devices())
    except Exception:
        return False


def park_int8(tree, host_device) -> object:
    """Quantize the large float leaves of ``tree`` and commit everything to
    ``host_device``. Device-resident leaves are quantized ON device first so
    the download moves int8 bytes, not bf16. Idempotent: leaves parked by a
    previous run (bundle reuse — the supported serve pattern) pass through
    with their payload re-committed to the host, never re-quantized."""
    if tree is None:
        return None

    quant_on_device = jax.jit(_quantize_jnp)

    def park(leaf):
        if _is_parked_leaf(leaf):
            parked = dict(leaf)
            parked["q"] = jax.device_put(parked["q"], host_device)
            parked["scale"] = jax.device_put(parked["scale"], host_device)
            return parked
        if not _should_quantize(leaf):
            return jax.device_put(leaf, host_device)
        if _leaf_on_accelerator(leaf):
            q, scale = quant_on_device(leaf)
            parked = {_PARK_KEY: True, "q": q, "scale": scale, "dtype": str(leaf.dtype)}
        else:
            parked = _quantize_np(np.asarray(leaf))
        parked["q"] = jax.device_put(parked["q"], host_device)
        parked["scale"] = jax.device_put(parked["scale"], host_device)
        return parked

    out = jax.tree.map(park, tree, is_leaf=_is_parked_leaf)
    jax.block_until_ready(
        [l for l in jax.tree.leaves(out, is_leaf=_is_parked_leaf) if not isinstance(l, dict)]
        + [l["q"] for l in jax.tree.leaves(out, is_leaf=_is_parked_leaf) if isinstance(l, dict)]
    )
    return out


def is_parked(tree) -> bool:
    return any(
        _is_parked_leaf(l)
        for l in jax.tree.leaves(
            tree, is_leaf=_is_parked_leaf
        )
    )


def _dequant_leaves(qs, scales, dtypes):
    out = []
    for q, s, d in zip(qs, scales, dtypes):
        cout = q.shape[-1]
        r = q.astype(jnp.float32).reshape(-1, cout)
        rows = r.shape[0]
        n_groups = s.shape[0]
        pad = n_groups * _GROUP_SIZE - rows
        if pad:
            r = jnp.concatenate([r, jnp.zeros((pad, cout), jnp.float32)], axis=0)
        g = r.reshape(n_groups, _GROUP_SIZE, cout) * s[:, None, :]
        out.append(
            g.reshape(n_groups * _GROUP_SIZE, cout)[:rows].reshape(q.shape).astype(d)
        )
    return out


def unpark_begin(tree, device):
    """Issue the async host->device transfers for a parked (or plain) tree
    and return an opaque handle for ``unpark_finish``. Does NOT block and
    does NOT dispatch the dequant — call it while other device work is in
    flight to overlap the copies with compute."""
    if tree is None:
        return None
    leaves, treedef = jax.tree.flatten(tree, is_leaf=_is_parked_leaf)
    moved = []
    q_idx, qs, scales, dtypes = [], [], [], []
    for i, leaf in enumerate(leaves):
        if _is_parked_leaf(leaf):
            q_idx.append(i)
            qs.append(jax.device_put(leaf["q"], device))
            scales.append(jax.device_put(leaf["scale"], device))
            dtypes.append(jnp.dtype(leaf["dtype"]))
            moved.append(None)
        else:
            moved.append(jax.device_put(leaf, device))
    return (treedef, moved, q_idx, qs, scales, dtypes)


def unpark_finish(handle):
    """Dispatch the on-device dequant for ``unpark_begin``'s handle and
    block until the full tree is resident."""
    if handle is None:
        return None
    treedef, moved, q_idx, qs, scales, dtypes = handle
    if q_idx:
        from mlx_video_tpu.utils.aot import aot_jit

        deq = aot_jit(_dequant_leaves, static_argnames=("dtypes",),
                      name="aux_dequant")(qs, scales, tuple(str(d) for d in dtypes))
        for i, d in zip(q_idx, deq):
            moved[i] = d
    out = jax.tree.unflatten(treedef, moved)
    jax.block_until_ready([l for l in jax.tree.leaves(out)])
    return out


def unpark_int8(tree, device):
    """Transfer a parked tree to ``device`` (int8 on the wire) and dequantize
    the quantized leaves to their original dtype in one jitted dispatch."""
    return unpark_finish(unpark_begin(tree, device))
