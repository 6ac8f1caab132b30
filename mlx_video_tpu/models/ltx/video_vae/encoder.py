"""Video VAE encoder, TPU-native.

Behavioral spec: reference mlx_video/models/ltx/video_vae/video_vae.py:220-372
(encoder stack) and encoder.py:18-221 (loader defaults). Block-spec-driven:
the encoder is built from the checkpoint's ``encoder_blocks`` list
(default at reference video_vae/encoder.py:95-105).

Public API takes pipeline-layout ``(B, C, F, H, W)`` video in [-1, 1] and
returns normalized latent means ``(B, latent_C, F', H', W')``; internally
everything is channels-last NDHWC.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from mlx_video_tpu.config import VideoVAEConfig
from mlx_video_tpu.models.ltx.video_vae import ops
from mlx_video_tpu.models.ltx.video_vae.blocks import (
    init_resnet_block,
    init_space_to_depth_downsample,
    pixel_norm,
    resnet_block,
    space_to_depth_downsample,
)
from mlx_video_tpu.models.ltx.video_vae.conv import causal_conv3d, init_conv3d

_STRIDES = {
    "compress_all_res": (2, 2, 2),
    "compress_space_res": (1, 2, 2),
    "compress_time_res": (2, 1, 1),
    "compress_all": (2, 2, 2),
    "compress_space": (1, 2, 2),
    "compress_time": (2, 1, 1),
    # compress_all with a channel multiplier (reference video_vae.py:108-118)
    "compress_all_x_y": (2, 2, 2),
}


def _block_channels(name: str, cfg: Dict[str, Any], in_ch: int) -> int:
    """Output channels for an encoder block (reference: video_vae.py:32-149)."""
    if name in ("compress_all_res", "compress_space_res", "compress_time_res", "compress_all_x_y", "res_x_y"):
        return in_ch * cfg.get("multiplier", 2)
    return in_ch


def init_video_encoder(
    key: jax.Array, config: VideoVAEConfig, dtype=jnp.float32
) -> dict:
    """Initialize encoder params; structure mirrors the block-spec list."""
    in_ch = config.in_channels * config.patch_size**2
    feat = config.out_channels
    keys = jax.random.split(key, len(config.encoder_blocks) + 2)

    params: dict = {
        "conv_in": init_conv3d(keys[0], in_ch, feat, 3, dtype=dtype),
        "per_channel_statistics": {
            "mean": jnp.zeros((config.out_channels,), dtype=jnp.float32),
            "std": jnp.ones((config.out_channels,), dtype=jnp.float32),
        },
        "down_blocks": {},
    }

    for i, (name, cfg) in enumerate(config.encoder_blocks):
        cfg = dict(cfg)
        out_ch = _block_channels(name, cfg, feat)
        if name == "res_x":
            bkeys = jax.random.split(keys[i + 1], cfg["num_layers"])
            params["down_blocks"][str(i)] = {
                "res_blocks": {
                    str(j): init_resnet_block(bkeys[j], feat, feat, dtype=dtype)
                    for j in range(cfg["num_layers"])
                }
            }
        elif name == "res_x_y":
            params["down_blocks"][str(i)] = init_resnet_block(keys[i + 1], feat, out_ch, dtype=dtype)
        elif name in ("compress_all_res", "compress_space_res", "compress_time_res"):
            params["down_blocks"][str(i)] = init_space_to_depth_downsample(
                keys[i + 1], feat, out_ch, _STRIDES[name], dtype=dtype
            )
        elif name in ("compress_all", "compress_space", "compress_time", "compress_all_x_y"):
            params["down_blocks"][str(i)] = init_conv3d(keys[i + 1], feat, out_ch, 3, dtype=dtype)
        else:
            raise ValueError(f"Unknown encoder block: {name}")
        feat = out_ch

    # UNIFORM log-var: one extra channel (reference: video_vae.py:304-319).
    params["conv_out"] = init_conv3d(keys[-1], feat, config.out_channels + 1, 3, dtype=dtype)
    return params


def video_encoder_apply(
    params: dict,
    config: VideoVAEConfig,
    sample: jax.Array,
    padding_mode: str = "zeros",
) -> jax.Array:
    """Encode (B, C, F, H, W) video in [-1, 1] to normalized latent means
    (B, latent_C, F', H', W') (reference: video_vae.py:321-372).

    Compatibility wrapper over :func:`video_encoder_apply_cl`; jit the
    ``_cl`` core with eager transposes outside when host-driving (channel
    transposes inside a jitted graph device-compile pathologically on TPU —
    PERF.md round 2).
    """
    means = video_encoder_apply_cl(
        params, config, ops.to_channels_last(sample), padding_mode
    )
    return ops.to_channels_first(means)


def video_encoder_apply_cl(
    params: dict,
    config: VideoVAEConfig,
    sample_cl: jax.Array,
    padding_mode: str = "zeros",
) -> jax.Array:
    """Channels-last core: (B, F, H, W, C) in [-1, 1] -> normalized latent
    means (B, F', H', W', latent_C)."""
    frames = sample_cl.shape[1]
    if (frames - 1) % 8 != 0:
        raise ValueError(
            f"Encode input must have 1 + 8*k frames (e.g. 1, 9, 17, ...); got {frames}."
        )

    x = ops.patchify(sample_cl, patch_size_hw=config.patch_size, patch_size_t=1)
    x = causal_conv3d(params["conv_in"], x, 3, 1, True, padding_mode)

    feat = config.out_channels
    for i, (name, cfg) in enumerate(config.encoder_blocks):
        cfg = dict(cfg)
        bparams = params["down_blocks"][str(i)]
        out_ch = _block_channels(name, cfg, feat)
        if name == "res_x":
            for j in range(cfg["num_layers"]):
                x = resnet_block(bparams["res_blocks"][str(j)], x, True, padding_mode)
        elif name == "res_x_y":
            x = resnet_block(bparams, x, True, padding_mode)
        elif name in ("compress_all_res", "compress_space_res", "compress_time_res"):
            x = space_to_depth_downsample(bparams, x, out_ch, _STRIDES[name], True, padding_mode)
        else:  # plain strided conv compress
            x = causal_conv3d(bparams, x, 3, _STRIDES[name], True, padding_mode)
        feat = out_ch

    x = jax.nn.silu(pixel_norm(x))
    x = causal_conv3d(params["conv_out"], x, 3, 1, True, padding_mode)

    # UNIFORM log-var: the last channel is a shared log-variance; only the
    # means are returned (reference: video_vae.py:356-372).
    means = x[..., : config.out_channels]
    stats = params["per_channel_statistics"]
    return ops.normalize_latents(means, stats["mean"], stats["std"])


from functools import partial

from mlx_video_tpu.utils.aot import aot_partial


@aot_partial(static_argnames=("config", "padding_mode"))
def _encoder_head(params, config: VideoVAEConfig, sample_cl, padding_mode):
    x = ops.patchify(sample_cl, patch_size_hw=config.patch_size, patch_size_t=1)
    return causal_conv3d(params["conv_in"], x, 3, 1, True, padding_mode)


@aot_partial(static_argnames=("padding_mode",))
def _encoder_res_block(bparams, x, padding_mode):
    return resnet_block(bparams, x, True, padding_mode)


@aot_partial(static_argnames=("out_ch", "strides", "padding_mode"))
def _encoder_downsample(bparams, x, out_ch, strides, padding_mode):
    return space_to_depth_downsample(bparams, x, out_ch, strides, True, padding_mode)


@aot_partial(static_argnames=("strides", "padding_mode"))
def _encoder_conv_compress(bparams, x, strides, padding_mode):
    return causal_conv3d(bparams, x, 3, strides, True, padding_mode)


@aot_partial(static_argnames=("config", "padding_mode"))
def _encoder_tail(params, config: VideoVAEConfig, x, padding_mode):
    x = jax.nn.silu(pixel_norm(x))
    x = causal_conv3d(params["conv_out"], x, 3, 1, True, padding_mode)
    means = x[..., : config.out_channels]
    stats = params["per_channel_statistics"]
    return ops.normalize_latents(means, stats["mean"], stats["std"])


def video_encoder_apply_cl_chunked(
    params: dict,
    config: VideoVAEConfig,
    sample_cl: jax.Array,
    padding_mode: str = "zeros",
) -> jax.Array:
    """Channels-last encode with PER-BLOCK jits.

    Numerically identical to :func:`video_encoder_apply_cl`, but each res
    block / downsample / head / tail compiles as its own bounded graph —
    same-shaped res blocks within a group share one compile — instead of
    one monolithic encoder graph whose full-geometry XLA:TPU device-side
    compile exceeds 25 minutes (PERF.md round 2; exactly the decoder's
    video_decoder_apply_chunked treatment). Host-driven paths
    (pipelines/generate i2v conditioning, trainer precompute) use this.
    """
    frames = sample_cl.shape[1]
    if (frames - 1) % 8 != 0:
        raise ValueError(
            f"Encode input must have 1 + 8*k frames (e.g. 1, 9, 17, ...); got {frames}."
        )
    x = _encoder_head(params, config, sample_cl, padding_mode)
    feat = config.out_channels
    for i, (name, cfg) in enumerate(config.encoder_blocks):
        cfg = dict(cfg)
        bparams = params["down_blocks"][str(i)]
        out_ch = _block_channels(name, cfg, feat)
        if name == "res_x":
            for j in range(cfg["num_layers"]):
                x = _encoder_res_block(bparams["res_blocks"][str(j)], x, padding_mode)
        elif name == "res_x_y":
            x = _encoder_res_block(bparams, x, padding_mode)
        elif name in ("compress_all_res", "compress_space_res", "compress_time_res"):
            x = _encoder_downsample(bparams, x, out_ch, _STRIDES[name], padding_mode)
        else:  # plain strided conv compress
            x = _encoder_conv_compress(bparams, x, _STRIDES[name], padding_mode)
        feat = out_ch
    return _encoder_tail(params, config, x, padding_mode)


def video_encoder_apply_chunked(
    params: dict,
    config: VideoVAEConfig,
    sample: jax.Array,
    padding_mode: str = "zeros",
) -> jax.Array:
    """Channels-first public API over :func:`video_encoder_apply_cl_chunked`
    (layout transposes eager, outside the jits)."""
    x = video_encoder_apply_cl_chunked(
        params, config, ops.to_channels_last(sample), padding_mode
    )
    return ops.to_channels_first(x)


def encode_image(
    params: dict, config: VideoVAEConfig, image: jax.Array, padding_mode: str = "zeros"
) -> jax.Array:
    """Encode an (H, W, 3) or (B, H, W, 3) image in [0, 1] to a 1-frame latent
    (reference: encoder.py:190-221)."""
    if image.ndim == 3:
        image = image[None]
    x = image * 2.0 - 1.0
    x = jnp.transpose(x, (0, 3, 1, 2))[:, :, None]  # (B, 3, 1, H, W)
    return video_encoder_apply(params, config, x, padding_mode)
