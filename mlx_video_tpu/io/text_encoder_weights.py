"""Weight loading for the Gemma-3 text encoder and LTX connectors.

Behavioral spec: reference mlx_video/models/ltx/text_encoder.py:182-267
(Gemma shard selection + "language_model." prefix strip, fp32->bf16) and
709-906 (4-way connector weight layout resolution:
unified model.safetensors with "connector."/"text_embedding_projection."
keys, connectors/ltx_text_connectors.safetensors, base DiT shards with
"model.diffusion_model.{video,audio}_embeddings_connector." keys, and
connectors/diffusion_pytorch_model.safetensors with "video_connector."/
"audio_connector."/"text_proj_in." keys).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional

import jax.numpy as jnp
import ml_dtypes
import numpy as np

from mlx_video_tpu.io.safetensors import SafetensorsReader
from mlx_video_tpu.models.gemma3 import Gemma3TextConfig

_GEMMA_LIN = {
    "q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj",
}


def _gemma_weight_files(path: Path):
    """Canonical shard-set selection (reference: text_encoder.py:200-216)."""
    if (path / "diffusion_pytorch_model.safetensors.index.json").exists():
        return sorted(path.glob("diffusion_pytorch_model-*.safetensors"))
    if (path / "model.safetensors.index.json").exists():
        return sorted(path.glob("model-*.safetensors"))
    if (path / "diffusion_pytorch_model.safetensors").exists():
        return [path / "diffusion_pytorch_model.safetensors"]
    if (path / "model.safetensors").exists():
        return [path / "model.safetensors"]
    return sorted(path.glob("*.safetensors"))


def load_gemma_weights(path: Path, config: Gemma3TextConfig, dtype=jnp.bfloat16) -> dict:
    """Build the Gemma param pytree from HF-layout safetensors shards.

    Accepts keys with or without a "language_model." / "model." prefix;
    linear weights transpose from (out, in) to our (in, out); per-layer
    tensors stack along the scan axis.

    Quantized (MLX-format) repos are detected per-leaf by uint32-packed
    ``weight`` + sibling ``scales``/``biases`` tensors
    (reference: text_encoder.py:222-249 quantized-repo support). Quantized
    linears load as ``quant_weight``/``scales``/``biases`` (dequantized
    inside the matmul by ops/linear.py); the token embedding is dequantized
    at load (the lookup table is needed densely anyway).
    """
    np_dtype = ml_dtypes.bfloat16 if dtype == jnp.bfloat16 else np.dtype(dtype)
    files = _gemma_weight_files(Path(path))
    if not files:
        raise FileNotFoundError(f"No Gemma safetensors shards under {path}")

    L = config.num_hidden_layers
    staged_layers: Dict[tuple, dict] = {}
    top: dict = {}

    def ingest(key: str, get):
        k = key
        for prefix in ("language_model.", "model.language_model."):
            if k.startswith(prefix):
                k = k[len(prefix) :]
        if k.startswith("model."):
            k = k[len("model.") :]
        parts = k.split(".")
        if parts[0] == "embed_tokens" and parts[-1] in ("weight", "scales", "biases"):
            top[("embed_tokens", parts[-1])] = get()
        elif parts[0] == "norm" and parts[-1] == "weight":
            top[("norm", "weight")] = get()
        elif parts[0] == "layers":
            layer = int(parts[1])
            sub = tuple(parts[2:])
            staged_layers.setdefault(sub, {})[layer] = get()

    for f in files:
        with SafetensorsReader(f) as r:
            for key in r.keys():
                ingest(key, lambda rk=key, rr=r: rr.get(rk))

    def cast(arr):
        arr = np.asarray(arr)
        if arr.dtype in (np.float32, np.float64):
            arr = arr.astype(np_dtype)
        return arr

    embed = np.asarray(top[("embed_tokens", "weight")])
    if embed.dtype == np.uint32:  # quantized embedding -> dense lookup table
        from mlx_video_tpu.ops.quant import dequantize_affine

        embed = np.asarray(
            dequantize_affine(
                jnp.asarray(embed),
                jnp.asarray(np.asarray(top[("embed_tokens", "scales")])),
                jnp.asarray(np.asarray(top[("embed_tokens", "biases")])),
                dtype=dtype,
                in_dim=config.hidden_size,
            )
        )
    params: dict = {
        "embed_tokens": {"weight": jnp.asarray(cast(embed))},
        "norm": {"weight": jnp.asarray(cast(top[("norm", "weight")]))},
        "layers": {},
    }

    layers_tree: dict = {}
    for sub, by_layer in staged_layers.items():
        if len(by_layer) != L:
            raise ValueError(f"Gemma leaf {'.'.join(sub)} has {len(by_layer)}/{L} layers")
        quantized = sub[-1] == "weight" and np.asarray(by_layer[0]).dtype == np.uint32
        transpose = sub[-1] == "weight" and sub[-2] in _GEMMA_LIN and not quantized
        mats = []
        for i in range(L):
            arr = cast(by_layer[i])
            if transpose:
                arr = arr.T
            mats.append(arr)
        leaf = "quant_weight" if quantized else sub[-1]
        node = layers_tree
        for part in sub[:-1]:
            node = node.setdefault(part, {})
        node[leaf] = jnp.asarray(np.stack(mats, axis=0))
    params["layers"] = layers_tree
    return params


_CONNECTOR_PREFIXES = {
    "video_embeddings_connector": (
        "model.diffusion_model.video_embeddings_connector.",
        "connector.video_embeddings_connector.",
        "video_connector.",
    ),
    "audio_embeddings_connector": (
        "model.diffusion_model.audio_embeddings_connector.",
        "connector.audio_embeddings_connector.",
        "audio_connector.",
    ),
}
_FEATURE_KEYS = ("text_embedding_projection.aggregate_embed.weight", "text_proj_in.weight")


def _connector_files(model_path: Path):
    """Candidate files in priority order (reference: text_encoder.py:731-813)."""
    candidates = [
        model_path / "model.safetensors",
        model_path / "connectors" / "ltx_text_connectors.safetensors",
        model_path / "connectors" / "diffusion_pytorch_model.safetensors",
    ]
    candidates += sorted(model_path.glob("ltx-2-19*.safetensors"))
    return [c for c in candidates if c.exists()]


def _map_connector_key(key: str):
    """sanitized key -> path tuple into our connector pytree."""
    k = key.replace(".ff.net.0.proj.", ".ff.proj_in.")
    k = k.replace(".ff.net.2.", ".ff.proj_out.")
    k = k.replace(".to_out.0.", ".to_out.")
    parts = k.split(".")
    if parts[0] == "learnable_registers":
        return ("learnable_registers",)
    if parts[0] == "transformer_1d_blocks":
        return ("transformer_1d_blocks", parts[1]) + tuple(parts[2:])
    return None


def load_connector_weights(params: dict, model_path: Path, dtype=jnp.bfloat16) -> int:
    """Fill feature_extractor + both connectors from whichever layout exists.
    Returns the number of tensors loaded."""
    np_dtype = ml_dtypes.bfloat16 if dtype == jnp.bfloat16 else np.dtype(dtype)
    loaded = 0
    for file in _connector_files(Path(model_path)):
        with SafetensorsReader(file) as r:
            keys = set(r.keys())
            hit = False
            for fk in _FEATURE_KEYS:
                if fk in keys:
                    arr = np.asarray(r.get(fk))
                    params["feature_extractor"]["aggregate_embed"]["weight"] = jnp.asarray(
                        arr.T.astype(np_dtype)
                    )
                    loaded += 1
                    hit = True
            for target, prefixes in _CONNECTOR_PREFIXES.items():
                for key in keys:
                    for prefix in prefixes:
                        if not key.startswith(prefix):
                            continue
                        mapped = _map_connector_key(key[len(prefix) :])
                        if mapped is None:
                            continue
                        arr = np.asarray(r.get(key))
                        if arr.ndim == 2 and mapped[-1] == "weight" and "norm" not in mapped[-2]:
                            arr = arr.T
                        if arr.dtype in (np.float32, np.float64):
                            arr = arr.astype(np_dtype)
                        node = params[target]
                        for part in mapped[:-1]:
                            node = node.setdefault(part, {})
                        node[mapped[-1]] = jnp.asarray(arr)
                        loaded += 1
                        hit = True
            if hit and loaded > 2:
                break
    return loaded
