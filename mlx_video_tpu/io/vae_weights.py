"""Checkpoint loaders for VAE encoder/decoder, upsampler, audio VAE, vocoder.

Behavioral spec: reference loaders and sanitizers —
mlx_video/models/ltx/video_vae/decoder.py:534-741 (decoder key remap:
mid_block.resnets.i -> up_blocks.0.res_blocks.i, up_blocks.b.resnets.i ->
up_blocks.(2b+2).res_blocks.i, up_blocks.b.upsamplers.0 -> up_blocks.(2b+1),
stats key preferences), video_vae/encoder.py:18-187, upsampler.py:319-373,
and mlx_video/convert.py:249-471 (per-subsystem transposes).

Weight-layout conversions into our JAX layouts:
- conv3d PT (O, I, D, H, W)   -> (D, H, W, I, O)
- conv2d PT (O, I, H, W)      -> (H, W, I, O)
- conv1d PT (O, I, K)         -> (K, I, O)
- convtranspose1d PT (I, O, K)-> (K, I, O)
- linear PT (O, I)            -> (I, O)
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Dict, Iterable, Optional, Tuple, Union

import jax.numpy as jnp
import ml_dtypes
import numpy as np

from mlx_video_tpu.io.safetensors import SafetensorsReader


def _np_dtype(dtype):
    return ml_dtypes.bfloat16 if dtype == jnp.bfloat16 else np.dtype(dtype)


def _cast(arr: np.ndarray, np_dtype) -> np.ndarray:
    if arr.dtype in (np.float32, np.float64):
        return arr.astype(np_dtype)
    return arr


def _conv3d_t(a):
    return np.transpose(a, (2, 3, 4, 1, 0))


def _conv2d_t(a):
    return np.transpose(a, (2, 3, 1, 0))


def _leaf_candidates(parts) -> list:
    """Candidate tree paths for a checkpoint key: checkpoints may nest conv
    weights under an extra ``.conv`` module (CausalConv wrappers) while some
    of our nodes are legitimately named ``conv`` (pixel-shuffle blocks)."""
    parts = list(parts)
    cands = [tuple(parts)]
    if len(parts) >= 2 and parts[-2] == "conv":
        cands.append(tuple(parts[:-2] + parts[-1:]))  # strip one .conv
    if parts[-1] in ("weight", "bias"):
        cands.append(tuple(parts[:-1] + ["conv", parts[-1]]))  # add one .conv
    return cands


def _assign(params: dict, path: Tuple[str, ...], value: np.ndarray) -> bool:
    node = params
    for part in path[:-1]:
        if not isinstance(node, dict) or part not in node:
            return False
        node = node[part]
    if not isinstance(node, dict) or path[-1] not in node:
        return False
    expected = node[path[-1]]
    if tuple(np.shape(expected)) != tuple(value.shape):
        raise ValueError(
            f"Shape mismatch for {'.'.join(path)}: checkpoint {value.shape} vs "
            f"expected {np.shape(expected)}"
        )
    node[path[-1]] = jnp.asarray(value)
    return True


def _assign_any(params: dict, parts, value: np.ndarray) -> bool:
    for cand in _leaf_candidates(parts):
        if _assign(params, cand, value):
            return True
    return False


def _read_all(path: Union[str, Path], prefixes: Iterable[str]) -> Dict[str, np.ndarray]:
    """Read tensors whose key starts with one of the prefixes (stripped)."""
    out = {}
    with SafetensorsReader(path) as r:
        for key in r.keys():
            for prefix in prefixes:
                if key.startswith(prefix):
                    out[key[len(prefix) :]] = np.asarray(r.get(key))
                    break
    return out


def _read_stats(
    path: Union[str, Path], prefixes: Iterable[str], names: Iterable[str]
) -> Dict[str, np.ndarray]:
    """Read ONLY the small per-channel stats vectors: keys that are
    ``prefix + name`` for some prefix/name. The stats live next to the
    weights under their own prefix (or bare, in stats-only files); a
    catch-all ``_read_all(path, ("",))`` here would materialize the whole
    multi-GB checkpoint a second time just to find two vectors."""
    names = set(names)
    out: Dict[str, np.ndarray] = {}
    with SafetensorsReader(path) as r:
        for key in r.keys():
            for prefix in prefixes:
                if key.startswith(prefix) and key[len(prefix) :] in names:
                    out.setdefault(key[len(prefix) :], np.asarray(r.get(key)))
                    break
    return out


def _detect_prefixes(path: Union[str, Path], options) -> Tuple[str, ...]:
    with SafetensorsReader(path) as r:
        keys = r.keys()
    for opts in options:
        if any(k.startswith(opts[0]) for k in keys):
            return opts
    return ("",)


# ---------------------------------------------------------------------------
# Video VAE decoder  (reference: decoder.py:534-741)
# ---------------------------------------------------------------------------


def _remap_decoder_key(key: str) -> str:
    parts = key.split(".")
    if len(parts) >= 4 and parts[0] == "mid_block" and parts[1] == "resnets":
        return ".".join(["up_blocks", "0", "res_blocks", parts[2]] + parts[3:])
    if len(parts) >= 3 and parts[0] == "mid_block" and parts[1] == "time_embedder":
        return ".".join(["up_blocks", "0"] + parts[1:])
    if len(parts) >= 3 and parts[0] == "up_blocks" and parts[1].isdigit():
        b = int(parts[1])
        if len(parts) >= 4 and parts[2] == "resnets":
            return ".".join(["up_blocks", str(2 * b + 2), "res_blocks", parts[3]] + parts[4:])
        if len(parts) >= 5 and parts[2] == "upsamplers" and parts[3] == "0":
            return ".".join(["up_blocks", str(2 * b + 1)] + parts[4:])
        if parts[2] == "time_embedder":
            return ".".join(["up_blocks", str(2 * b + 2)] + parts[2:])
    return key


def load_video_decoder_weights(
    path: Union[str, Path], params: dict, dtype=jnp.bfloat16
) -> int:
    """Fill an init_video_decoder() pytree from a checkpoint. Returns the
    number of tensors loaded; raises on shape mismatch."""
    npd = _np_dtype(dtype)
    prefixes = _detect_prefixes(path, [("vae.decoder.",), ("decoder.",), ("vae_decoder.",)])
    weights = _read_all(path, prefixes)
    # stats live next to the decoder under their own prefix
    stats = _read_stats(
        path,
        ("vae.per_channel_statistics.", "vae_decoder.per_channel_statistics.",
         "per_channel_statistics.", ""),
        ("mean-of-means", "mean", "latents_mean", "std-of-means", "std", "latents_std"),
    )
    loaded = 0
    for mean_key in ("mean-of-means", "mean", "latents_mean"):
        if mean_key in stats:
            params["latents_mean"] = jnp.asarray(stats[mean_key].astype(np.float32))
            loaded += 1
            break
    for std_key in ("std-of-means", "std", "latents_std"):
        if std_key in stats:
            params["latents_std"] = jnp.asarray(stats[std_key].astype(np.float32))
            loaded += 1
            break

    # Res blocks are scan-stacked in the param tree (decoder.py): stage the
    # per-index checkpoint tensors, then stack along the layer axis.
    staged: Dict[tuple, Dict[int, np.ndarray]] = {}
    for key, value in weights.items():
        k = _remap_decoder_key(key.replace(".conv.conv.", ".conv."))
        parts = [p for p in k.split(".") if p != "timestep_embedder"]
        if parts[-1] == "weight" and value.ndim == 5:
            value = _conv3d_t(value)
        elif parts[-1] == "weight" and value.ndim == 2 and parts[-2].startswith("linear"):
            value = value.T
        value = _cast(value, npd)
        if "res_blocks" in parts:
            i = parts.index("res_blocks")
            if i + 1 < len(parts) and parts[i + 1].isdigit():
                j = int(parts[i + 1])
                path = tuple(parts[: i + 1] + parts[i + 2 :])
                staged.setdefault(path, {})[j] = value
                continue
        if _assign_any(params, parts, value):
            loaded += 1
    for path, by_j in staged.items():
        stacked = np.stack([by_j[j] for j in sorted(by_j)], axis=0)
        if _assign_any(params, list(path), stacked):
            loaded += len(by_j)
    return loaded


# ---------------------------------------------------------------------------
# Video VAE encoder  (reference: encoder.py:18-187)
# ---------------------------------------------------------------------------


def load_video_encoder_weights(
    path: Union[str, Path], params: dict, dtype=jnp.bfloat16
) -> int:
    npd = _np_dtype(dtype)
    prefixes = _detect_prefixes(path, [("vae.encoder.",), ("encoder.",), ("vae_encoder.",)])
    weights = _read_all(path, prefixes)
    stats = _read_stats(
        path,
        ("vae.per_channel_statistics.", "vae_encoder.per_channel_statistics.",
         "per_channel_statistics.", ""),
        ("mean-of-means", "mean", "std-of-means", "std"),
    )
    loaded = 0
    for mean_key in ("mean-of-means", "mean"):
        if mean_key in stats:
            params["per_channel_statistics"]["mean"] = jnp.asarray(stats[mean_key].astype(np.float32))
            loaded += 1
            break
    for std_key in ("std-of-means", "std"):
        if std_key in stats:
            params["per_channel_statistics"]["std"] = jnp.asarray(stats[std_key].astype(np.float32))
            loaded += 1
            break

    for key, value in weights.items():
        parts = key.split(".")
        if parts[-1] == "weight" and value.ndim == 5:
            value = _conv3d_t(value)
        value = _cast(value, npd)
        if _assign_any(params, parts, value):
            loaded += 1
    return loaded


# ---------------------------------------------------------------------------
# Latent upsampler  (reference: upsampler.py:319-373)
# ---------------------------------------------------------------------------


def load_upsampler_weights(path: Union[str, Path], params: dict, dtype=jnp.bfloat16) -> int:
    npd = _np_dtype(dtype)
    # A plain upsampler file has a legit top-level "upsampler." node
    # (upsampler.conv.weight), so only treat "upsampler." as a bundle
    # prefix when the bundle-nested keys are present.
    with SafetensorsReader(path) as r:
        keys = r.keys()
    bundled = any(
        k.startswith(("upsampler.initial_conv", "upsampler.res_blocks", "upsampler.upsampler."))
        for k in keys
    )
    weights = _read_all(path, ("upsampler.",) if bundled else ("",))
    loaded = 0
    staged: Dict[tuple, Dict[int, np.ndarray]] = {}
    for key, value in weights.items():
        parts = key.split(".")
        if parts[-1] == "weight" and value.ndim == 5:
            value = _conv3d_t(value)
        elif parts[-1] == "weight" and value.ndim == 4:
            value = _conv2d_t(value)
        value = _cast(value, npd)
        # res blocks are scan-stacked (upsampler.py): stage per index
        if parts[0].endswith("res_blocks") and len(parts) > 1 and parts[1].isdigit():
            staged.setdefault((parts[0], tuple(parts[2:])), {})[int(parts[1])] = value
            continue
        if _assign(params, tuple(parts), value):
            loaded += 1
    for (group, suffix), by_j in staged.items():
        stacked = np.stack([by_j[j] for j in sorted(by_j)], axis=0)
        if _assign(params, (group,) + suffix, stacked):
            loaded += len(by_j)
    return loaded


# ---------------------------------------------------------------------------
# Audio VAE + vocoder  (reference: convert.py:376-471)
# ---------------------------------------------------------------------------


def load_audio_vae_weights(
    path: Union[str, Path], encoder_params: Optional[dict], decoder_params: Optional[dict],
    dtype=jnp.bfloat16,
) -> int:
    npd = _np_dtype(dtype)
    loaded = 0
    stats = _read_stats(
        path,
        ("per_channel_statistics.", "audio_vae.per_channel_statistics."),
        ("std_of_means", "std-of-means", "_std_of_means",
         "mean_of_means", "mean-of-means", "_mean_of_means"),
    )
    for target, prefixes in ((encoder_params, ("encoder.", "audio_vae.encoder.")),
                             (decoder_params, ("decoder.", "audio_vae.decoder."))):
        if target is None:
            continue
        weights = _read_all(path, prefixes)
        for name in ("std_of_means", "std-of-means", "_std_of_means"):
            if name in stats:
                target["per_channel_statistics"]["std_of_means"] = jnp.asarray(
                    stats[name].astype(np.float32)
                )
                loaded += 1
                break
        for name in ("mean_of_means", "mean-of-means", "_mean_of_means"):
            if name in stats:
                target["per_channel_statistics"]["mean_of_means"] = jnp.asarray(
                    stats[name].astype(np.float32)
                )
                loaded += 1
                break
        for key, value in weights.items():
            # stage/block names match our pytree (down.{level}.block.{i}.conv1,
            # mid.block_1, ...); CausalConv2d wrappers add a .conv nesting that
            # _assign_any strips.
            parts = key.split(".")
            if parts[-1] == "weight" and value.ndim == 4:
                value = _conv2d_t(value)
            value = _cast(value, npd)
            if _assign_any(target, parts, value):
                loaded += 1
    return loaded


def load_vocoder_weights(path: Union[str, Path], params: dict, dtype=jnp.bfloat16) -> int:
    npd = _np_dtype(dtype)
    prefixes = _detect_prefixes(path, [("vocoder.",)])
    weights = _read_all(path, prefixes)
    loaded = 0
    for key, value in weights.items():
        parts = key.split(".")
        if parts[-1] == "weight" and value.ndim == 3:
            if parts[0] == "ups":
                value = np.transpose(value, (2, 0, 1))  # ConvTranspose1d (I,O,K)->(K,I,O)
            else:
                value = np.transpose(value, (2, 1, 0))  # Conv1d (O,I,K)->(K,I,O)
        value = _cast(value, npd)
        if _assign(params, tuple(parts), value):
            loaded += 1
    return loaded
