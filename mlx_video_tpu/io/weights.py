"""Checkpoint loading: key sanitization + pytree assembly for the DiT.

Behavioral spec: reference mlx_video/models/ltx/ltx.py:508-533 (key
sanitize), 535-885 (from_pretrained: streaming shard load, strict
missing-key validation, bf16 cast policy, quant-aux dtype preservation).

The TPU layout differs from the checkpoint layout in two ways, both handled
here once at load time:

- linear weights transpose from PyTorch ``(out, in)`` to ``(in, out)``;
- the 48 per-layer block trees are stacked along a leading layer axis for
  the ``lax.scan`` execution (models/ltx/model.py).
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np

from mlx_video_tpu.config import LTXModelConfig
from mlx_video_tpu.io.safetensors import SafetensorsReader, save_safetensors
from mlx_video_tpu.models.ltx.model import init_ltx_params

PT_PREFIX = "model.diffusion_model."

# Sanitized names that live at the model top level (everything else belongs
# to transformer_blocks.{i}).
_VIDEO_TOP = {
    "patchify_proj",
    "adaln_single",
    "caption_projection",
    "scale_shift_table",
    "proj_out",
}
_AV_ADALN = {
    "av_ca_video_scale_shift_adaln_single": "av_ca_video_scale_shift_adaln",
    "av_ca_audio_scale_shift_adaln_single": "av_ca_audio_scale_shift_adaln",
    "av_ca_a2v_gate_adaln_single": "av_ca_a2v_gate_adaln",
    "av_ca_v2a_gate_adaln_single": "av_ca_v2a_gate_adaln",
}


def sanitize_pt_key(key: str) -> Optional[str]:
    """PyTorch checkpoint key -> MLX-layout sanitized key
    (behavior of reference ltx.py:548-564). Returns None for non-DiT keys."""
    if not key.startswith(PT_PREFIX):
        return None
    if "audio_embeddings_connector" in key or "video_embeddings_connector" in key:
        return None
    k = key[len(PT_PREFIX) :]
    k = k.replace(".to_out.0.", ".to_out.")
    k = k.replace(".ff.net.0.proj.", ".ff.proj_in.")
    k = k.replace(".ff.net.2.", ".ff.proj_out.")
    k = k.replace(".audio_ff.net.0.proj.", ".audio_ff.proj_in.")
    k = k.replace(".audio_ff.net.2.", ".audio_ff.proj_out.")
    k = k.replace(".linear_1.", ".linear1.")
    k = k.replace(".linear_2.", ".linear2.")
    return k


def dit_tree_path(sanitized_key: str) -> Optional[Tuple[Optional[int], Tuple[str, ...]]]:
    """Sanitized key -> (layer_index_or_None, path tuple into our param tree).

    Returns None for keys we intentionally ignore (e.g. affine-free
    norm_out has no parameters).
    """
    parts = sanitized_key.split(".")

    if parts[0] == "transformer_blocks":
        layer = int(parts[1])
        return layer, ("blocks",) + tuple(parts[2:])

    name = parts[0]
    if name in _AV_ADALN:
        return None, ("av", _AV_ADALN[name]) + tuple(parts[1:])
    if name.startswith("audio_"):
        sub = name[len("audio_") :]
        if sub in _VIDEO_TOP:
            return None, ("audio", sub) + tuple(parts[1:])
        return None  # e.g. audio_norm_out (no params)
    if name in _VIDEO_TOP:
        return None, ("video", name) + tuple(parts[1:])
    return None


def _needs_transpose(path: Tuple[str, ...]) -> bool:
    """2D linear weights transpose (out, in) -> (in, out)."""
    return path[-1] == "weight" and path[-2] not in ("q_norm", "k_norm")


def _cast(arr: np.ndarray, dtype) -> np.ndarray:
    if arr.dtype == np.float32 or arr.dtype == np.float64:
        return arr.astype(dtype)
    return arr


def load_dit_params(
    paths: Union[str, Path, Sequence[Union[str, Path]]],
    config: LTXModelConfig,
    dtype=jnp.bfloat16,
    strict: bool = True,
    extra_weights: Optional[Dict[str, np.ndarray]] = None,
) -> dict:
    """Build the DiT parameter pytree from safetensors shard(s).

    Accepts PyTorch-layout ("model.diffusion_model.*") or sanitized
    MLX-layout keys; streams tensors lazily per shard; stacks
    transformer_blocks leaves along the layer axis; validates completeness
    when ``strict`` (reference: ltx.py:727-881).

    ``extra_weights``: in-memory overrides (e.g. LoRA-merged tensors) keyed
    by raw checkpoint key; applied after file shards.

    Native-format checkpoints (our own convert/trainer output, tagged with
    ``format: mlx_video_tpu`` metadata — save_dit_params) are loaded
    directly as the stored pytree with stored dtypes (which may include
    int8 W8A8 leaves); the key sanitizer below only handles PT/MLX layouts.
    """
    if isinstance(paths, (str, Path)):
        paths = [paths]
    if len(paths) == 1:
        from mlx_video_tpu.io.safetensors import read_metadata

        if read_metadata(paths[0]).get("format") == "mlx_video_tpu":
            return load_native_params(paths[0])

    # Expected structure from a shape-only init (no device memory).
    shape_tree = jax.eval_shape(lambda: init_ltx_params(jax.random.key(0), config, dtype=dtype))
    flat_expected = {
        _path_tuple(p): leaf for p, leaf in jax.tree_util.tree_flatten_with_path(shape_tree)[0]
    }

    np_dtype = ml_dtypes.bfloat16 if dtype == jnp.bfloat16 else np.dtype(dtype)

    # staging: per-path either array (top-level) or dict layer->array (blocks)
    staged: Dict[Tuple[str, ...], object] = {}
    # MLX pre-quantized checkpoints (nn.quantize output, README community
    # repos): uint32 bit-packed <name>.weight with sibling .scales/.biases.
    # Detected per-leaf by dtype; staged in MLX (out, in) orientation under
    # quant_weight/scales/biases (ops/linear.py dequantizes at the matmul;
    # bits derive from shapes, any of ops/quant.py SUPPORTED_BITS).
    quant_paths: set = set()

    def _ingest(raw_key: str, get_value) -> None:
        is_pt = raw_key.startswith(PT_PREFIX)
        sani = sanitize_pt_key(raw_key) if is_pt else raw_key
        if sani is None:
            return
        mapped = dit_tree_path(sani)
        if mapped is None:
            return
        layer, path = mapped
        quant_aux = (
            path[-1] in ("scales", "biases")
            and path[:-1] + ("weight",) in flat_expected
        )
        if path not in flat_expected and not quant_aux:
            return
        value = np.asarray(get_value())
        if value.dtype == np.uint32 and path[-1] == "weight":
            quant_paths.add(path)
            path = path[:-1] + ("quant_weight",)
        elif quant_aux:
            pass  # keep stored dtype and (out, groups) orientation
        else:
            if value.ndim == 2 and _needs_transpose(path):
                value = value.T
            value = _cast(value, np_dtype)
        if layer is None:
            staged[path] = value
        else:
            staged.setdefault(path, {})[layer] = value  # type: ignore[union-attr]

    for p in paths:
        with SafetensorsReader(p) as reader:
            for raw_key in reader.keys():
                _ingest(raw_key, lambda rk=raw_key, r=reader: r.get(rk))
    if extra_weights:
        for raw_key, val in extra_weights.items():
            _ingest(raw_key, lambda v=val: v)

    # Assemble: stack block leaves, validate shapes/completeness.
    num_layers = config.num_layers
    out_flat: Dict[Tuple[str, ...], jnp.ndarray] = {}
    missing: List[str] = []

    def _check_quant_shapes(path, packed, scales, expected) -> None:
        """Packed (out, words) + scales (out, groups) must be consistent
        with the dense expected (in, out) and a supported bit width."""
        from mlx_video_tpu.ops.quant import SUPPORTED_BITS

        in_dim, out_dim = expected.shape[-2], expected.shape[-1]
        words, groups = packed.shape[-1], scales.shape[-1]
        bits = words * 32 // in_dim
        if (
            packed.shape[-2] != out_dim
            or scales.shape[-2] != out_dim
            or words * 32 != bits * in_dim
            or bits not in SUPPORTED_BITS
            or in_dim % groups != 0
        ):
            raise ValueError(
                f"Inconsistent quantized shapes for {'.'.join(path)}: packed "
                f"{packed.shape}, scales {scales.shape} vs dense (in={in_dim}, "
                f"out={out_dim}) — bits would be {bits}"
            )

    for path, expected in flat_expected.items():
        if path in quant_paths:
            base = path[:-1]
            parts = {}
            for leaf in ("quant_weight", "scales", "biases"):
                layers = staged.get(base + (leaf,))
                if path[0] == "blocks":
                    if not isinstance(layers, dict) or len(layers) < num_layers:
                        got = 0 if not isinstance(layers, dict) else len(layers)
                        missing.append(f"{'.'.join(base + (leaf,))} ({got}/{num_layers} layers)")
                        break
                    parts[leaf] = np.stack([layers[i] for i in range(num_layers)], axis=0)
                else:
                    if layers is None:
                        missing.append(".".join(base + (leaf,)))
                        break
                    parts[leaf] = layers
            else:
                _check_quant_shapes(path, parts["quant_weight"], parts["scales"], expected)
                for leaf, arr in parts.items():
                    out_flat[base + (leaf,)] = jnp.asarray(arr)
            continue
        if path[0] == "blocks":
            layers = staged.get(path)
            if not isinstance(layers, dict) or len(layers) < num_layers:
                got = 0 if not isinstance(layers, dict) else len(layers)
                missing.append(f"{'.'.join(path)} ({got}/{num_layers} layers)")
                continue
            stacked = np.stack([layers[i] for i in range(num_layers)], axis=0)
            if stacked.shape != expected.shape:
                raise ValueError(
                    f"Shape mismatch for {'.'.join(path)}: checkpoint {stacked.shape} "
                    f"vs expected {expected.shape}"
                )
            out_flat[path] = jnp.asarray(stacked)
        else:
            value = staged.get(path)
            if value is None:
                missing.append(".".join(path))
                continue
            if value.shape != expected.shape:
                raise ValueError(
                    f"Shape mismatch for {'.'.join(path)}: checkpoint {value.shape} "
                    f"vs expected {expected.shape}"
                )
            out_flat[path] = jnp.asarray(value)

    if strict and missing:
        sample = sorted(missing)[:20]
        raise ValueError(f"Missing {len(missing)} parameters after load (sample: {sample}).")

    return _unflatten(out_flat)


def _path_tuple(path) -> Tuple[str, ...]:
    out = []
    for k in path:
        if hasattr(k, "key"):
            out.append(str(k.key))
        elif hasattr(k, "idx"):
            out.append(str(k.idx))
        else:
            out.append(str(k))
    return tuple(out)


def _unflatten(flat: Dict[Tuple[str, ...], jnp.ndarray]) -> dict:
    tree: dict = {}
    for path, leaf in flat.items():
        node = tree
        for key in path[:-1]:
            node = node.setdefault(key, {})
        node[path[-1]] = leaf
    return tree


def flatten_params(params: dict, prefix: str = "") -> Dict[str, jnp.ndarray]:
    """Flatten a param pytree to {'a.b.c': leaf} for serialization."""
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        flat[prefix + ".".join(_path_tuple(path))] = leaf
    return flat


def save_dit_params(path: Union[str, Path], params: dict, metadata: Optional[dict] = None) -> None:
    """Save the native (transposed, stacked) pytree; round-trips through
    :func:`load_native_params`."""
    tensors = {k: np.asarray(v) for k, v in flatten_params(params).items()}
    save_safetensors(path, tensors, metadata={"format": "mlx_video_tpu", **(metadata or {})})


def load_native_params(path: Union[str, Path], prefix: str = "") -> dict:
    """Load a pytree saved by :func:`save_dit_params`. With ``prefix``,
    read only that subset (e.g. ``"transformer."`` from a unified
    model.safetensors bundle)."""
    with SafetensorsReader(path) as reader:
        flat = {
            tuple(k[len(prefix) :].split(".")): jnp.asarray(reader.get(k))
            for k in reader.keys()
            if k.startswith(prefix)
        }
    return _unflatten(flat)
