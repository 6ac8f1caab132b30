"""int8 transfer parking for low_memory aux-stage params.

Under ``low_memory`` the upsampler / VAE decoder / audio stacks shuttle
between host RAM and HBM around the 19B denoise stages (reference parity:
mlx_video/generate.py:3504-3506 serial load/free choreography). Each stack
is ~1 GB bf16, and the host<->device link — PCIe on a real host, the axon
tunnel here — is the entire phase cost now that compute is AOT-cached
(PERF.md r3: upsample 32.7 s ≈ one bf16 staging transfer).

This module halves the bytes on the wire: weights are parked host-side as
symmetric per-output-channel int8 (+ one fp32 scale per output channel),
transferred in that form, and dequantized to bf16 on device in ONE jitted
dispatch. Weight-only int8 with per-channel scales keeps conv stacks
within ~0.4% relative weight error; the e2e drift is measured in
tests/test_staging.py. Opt-in via ``generate_video(aux_int8_staging=True)``
/ ``--aux-stage-int8``.

Only leaves with ndim >= 2 and size >= _MIN_QUANT_SIZE are quantized —
biases, norms, and per-channel statistics ride raw (they are a rounding
error of the transfer).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

_MIN_QUANT_SIZE = 65536
_PARK_KEY = "__int8_parked__"


def _should_quantize(leaf) -> bool:
    if not hasattr(leaf, "dtype") or not jnp.issubdtype(leaf.dtype, jnp.floating):
        return False
    return leaf.ndim >= 2 and leaf.size >= _MIN_QUANT_SIZE


def _is_parked_leaf(x) -> bool:
    return isinstance(x, dict) and _PARK_KEY in x


def _quantize_np(w: np.ndarray) -> dict:
    """Host-side quantize: per-last-axis-channel symmetric int8."""
    f = w.astype(np.float32)
    axes = tuple(range(f.ndim - 1))
    amax = np.max(np.abs(f), axis=axes)
    scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.rint(f / scale), -127, 127).astype(np.int8)
    return {_PARK_KEY: True, "q": q, "scale": scale, "dtype": str(w.dtype)}


def _quantize_jnp(w: jax.Array) -> dict:
    """Device-side quantize (jit-traceable) — halves the DOWNLOAD too when
    the params start on device (fresh load path)."""
    f = w.astype(jnp.float32)
    axes = tuple(range(f.ndim - 1))
    amax = jnp.max(jnp.abs(f), axis=axes)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0).astype(jnp.float32)
    q = jnp.clip(jnp.rint(f / scale), -127, 127).astype(jnp.int8)
    return {_PARK_KEY: True, "q": q, "scale": scale, "dtype": str(w.dtype)}


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
    the download moves int8 bytes, not bf16."""
    if tree is None:
        return None

    quant_on_device = jax.jit(_quantize_jnp)

    def park(leaf):
        if not _should_quantize(leaf):
            return jax.device_put(leaf, host_device)
        if _leaf_on_accelerator(leaf):
            parked = quant_on_device(leaf)
        else:
            parked = _quantize_np(np.asarray(leaf))
        parked = dict(parked)
        parked["q"] = jax.device_put(parked["q"], host_device)
        parked["scale"] = jax.device_put(parked["scale"], host_device)
        return parked

    out = jax.tree.map(park, tree)
    jax.block_until_ready([l for l in jax.tree.leaves(out)])
    return out


def is_parked(tree) -> bool:
    return any(
        _is_parked_leaf(l)
        for l in jax.tree.leaves(
            tree, is_leaf=_is_parked_leaf
        )
    )


def _dequant_leaves(qs, scales, dtypes):
    return [
        (q.astype(jnp.float32) * s).astype(d) for q, s, d in zip(qs, scales, dtypes)
    ]


def unpark_int8(tree, device):
    """Transfer a parked tree to ``device`` (int8 on the wire) and dequantize
    the quantized leaves to their original dtype in one jitted dispatch."""
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
    if q_idx:
        from mlx_video_tpu.utils.aot import aot_jit

        deq = aot_jit(_dequant_leaves, static_argnames=("dtypes",),
                      name="aux_dequant")(qs, scales, tuple(str(d) for d in dtypes))
        for i, d in zip(q_idx, deq):
            moved[i] = d
    out = jax.tree.unflatten(treedef, moved)
    jax.block_until_ready([l for l in jax.tree.leaves(out)])
    return out
