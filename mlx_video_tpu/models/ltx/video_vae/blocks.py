"""Resnet / down / up blocks for the video VAE, TPU-native (NDHWC).

Behavioral spec: reference mlx_video/models/ltx/video_vae/resnet.py:33-172
and sampling.py:11-275. Pure functions over param dicts; no temporal
chunking (XLA + tiling handle memory).
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from einops import rearrange

from mlx_video_tpu.models.ltx.video_vae.conv import causal_conv3d, init_conv3d


def pixel_norm(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Per-position channel RMS norm, channels-last, fp32 island
    (reference: mlx_video/utils.py:477-483)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(ms + eps)).astype(dtype)


def group_norm(params: dict, x: jax.Array, num_groups: int = 32, eps: float = 1e-6) -> jax.Array:
    """GroupNorm over channels-last tensors (reference: resnet.py:18-30)."""
    dtype = x.dtype
    b = x.shape[0]
    c = x.shape[-1]
    xf = x.astype(jnp.float32).reshape(b, -1, num_groups, c // num_groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.var(xf, axis=(1, 3), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(x.shape)
    out = xf * params["weight"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return out.astype(dtype)


# ---------------------------------------------------------------------------
# Encoder-style ResnetBlock3D  (reference: resnet.py:33-121)
# ---------------------------------------------------------------------------


def init_resnet_block(
    key: jax.Array, in_channels: int, out_channels: Optional[int] = None, dtype=jnp.float32
) -> dict:
    out_channels = out_channels or in_channels
    k1, k2, k3 = jax.random.split(key, 3)
    params = {
        "conv1": init_conv3d(k1, in_channels, out_channels, 3, dtype=dtype),
        "conv2": init_conv3d(k2, out_channels, out_channels, 3, dtype=dtype),
    }
    if in_channels != out_channels:
        params["shortcut"] = init_conv3d(k3, in_channels, out_channels, 1, dtype=dtype)
    return params


def resnet_block(
    params: dict,
    x: jax.Array,
    causal: bool = True,
    padding_mode: str = "zeros",
    eps: float = 1e-6,
) -> jax.Array:
    """PixelNorm -> SiLU -> conv x2 with 1x1 shortcut (reference: resnet.py:93-121)."""
    residual = x
    h = causal_conv3d(params["conv1"], jax.nn.silu(pixel_norm(x, eps)), 3, 1, causal, padding_mode)
    h = causal_conv3d(params["conv2"], jax.nn.silu(pixel_norm(h, eps)), 3, 1, causal, padding_mode)
    if "shortcut" in params:
        residual = causal_conv3d(params["shortcut"], residual, 1, 1, causal, padding_mode)
    return h + residual


# ---------------------------------------------------------------------------
# SpaceToDepthDownsample  (reference: sampling.py:11-103)
# ---------------------------------------------------------------------------


def init_space_to_depth_downsample(
    key: jax.Array, in_channels: int, out_channels: int, stride: Tuple[int, int, int], dtype=jnp.float32
) -> dict:
    mult = stride[0] * stride[1] * stride[2]
    return {"conv": init_conv3d(key, in_channels, out_channels // mult, 3, dtype=dtype)}


def _space_to_depth(x: jax.Array, stride: Tuple[int, int, int]) -> jax.Array:
    """b (d st) (h sh) (w sw) c -> b d h w (c st sh sw)."""
    st, sh, sw = stride
    return rearrange(x, "b (d st) (h sh) (w sw) c -> b d h w (c st sh sw)", st=st, sh=sh, sw=sw)


def _depth_to_space(x: jax.Array, stride: Tuple[int, int, int]) -> jax.Array:
    """b d h w (c st sh sw) -> b (d st) (h sh) (w sw) c."""
    st, sh, sw = stride
    return rearrange(x, "b d h w (c st sh sw) -> b (d st) (h sh) (w sw) c", st=st, sh=sh, sw=sw)


def space_to_depth_downsample(
    params: dict,
    x: jax.Array,
    out_channels: int,
    stride: Tuple[int, int, int],
    causal: bool = True,
    padding_mode: str = "zeros",
) -> jax.Array:
    """3x3 conv + space-to-depth with a group-mean skip (reference: sampling.py:73-103)."""
    st, sh, sw = stride
    b, d, h, w, c = x.shape
    mult = st * sh * sw
    group_size = c * mult // out_channels

    # Causal temporal alignment: duplicate first frame when downsampling time.
    if st == 2:
        x = jnp.concatenate([x[:, :1], x], axis=1)
        d = d + 1

    pad_d = (st - d % st) % st
    pad_h = (sh - h % sh) % sh
    pad_w = (sw - w % sw) % sw
    if pad_d or pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_d), (0, pad_h), (0, pad_w), (0, 0)))

    # Skip: space-to-depth then mean over contiguous channel groups.
    x_in = _space_to_depth(x, stride)
    x_in = x_in.reshape(*x_in.shape[:-1], out_channels, group_size).mean(axis=-1)

    x_conv = causal_conv3d(params["conv"], x, 3, 1, causal, padding_mode)
    x_conv = _space_to_depth(x_conv, stride)
    return x_conv + x_in


# ---------------------------------------------------------------------------
# DepthToSpaceUpsample  (reference: sampling.py:106-197)
# ---------------------------------------------------------------------------


def init_depth_to_space_upsample(
    key: jax.Array,
    in_channels: int,
    stride: Tuple[int, int, int],
    out_channels_reduction_factor: int = 1,
    dtype=jnp.float32,
) -> dict:
    mult = stride[0] * stride[1] * stride[2]
    out_channels = in_channels // out_channels_reduction_factor
    return {"conv": init_conv3d(key, in_channels, out_channels * mult, 3, dtype=dtype)}


def depth_to_space_upsample(
    params: dict,
    x: jax.Array,
    stride: Tuple[int, int, int],
    residual: bool = False,
    out_channels_reduction_factor: int = 1,
    causal: bool = True,
    padding_mode: str = "zeros",
) -> jax.Array:
    """conv to C*prod(stride) -> pixel-shuffle 3D; optional tiled residual;
    drop the first frame on temporal upsample (reference: sampling.py:159-197)."""
    st, sh, sw = stride

    x_residual = None
    if residual:
        x_residual = _depth_to_space(x, stride)
        num_repeat = (st * sh * sw) // out_channels_reduction_factor
        x_residual = jnp.tile(x_residual, (1, 1, 1, 1, num_repeat))
        if st > 1:
            x_residual = x_residual[:, 1:]

    h = causal_conv3d(params["conv"], x, 3, 1, causal, padding_mode)
    h = _depth_to_space(h, stride)
    if st > 1:
        h = h[:, 1:]
    if x_residual is not None:
        h = h + x_residual
    return h
