"""Patchify / per-channel statistics for the video VAE.

Behavioral spec: reference mlx_video/models/ltx/video_vae/ops.py:9-126.
All functions operate on channels-last ``(B, F, H, W, C)`` tensors (the
internal TPU layout); the channel packing order matches the reference's
einops pattern ``b c (f p) (h q) (w r) -> b (c p r q) f h w`` exactly:
within each source channel the packed index runs (p, r, q) = (temporal,
width, height) from slowest to fastest — the height-patch index q varies
fastest.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from einops import rearrange


def patchify(x: jax.Array, patch_size_hw: int = 4, patch_size_t: int = 1) -> jax.Array:
    """(B, F*pt, H*q, W*r, C) -> (B, F, H, W, C*pt*r*q), reference channel order."""
    return rearrange(
        x,
        "b (f p) (h q) (w r) c -> b f h w (c p r q)",
        p=patch_size_t,
        q=patch_size_hw,
        r=patch_size_hw,
    )


def unpatchify(x: jax.Array, patch_size_hw: int = 4, patch_size_t: int = 1) -> jax.Array:
    """Inverse of :func:`patchify` (reference: ops.py:47-80)."""
    return rearrange(
        x,
        "b f h w (c p r q) -> b (f p) (h q) (w r) c",
        p=patch_size_t,
        q=patch_size_hw,
        r=patch_size_hw,
    )


def normalize_latents(x: jax.Array, mean: jax.Array, std: jax.Array) -> jax.Array:
    """(x - mean) / std per channel, fp32 island (reference: ops.py:94-109).

    x: (..., C) channels-last.
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    return ((xf - mean.astype(jnp.float32)) / std.astype(jnp.float32)).astype(dtype)


def denormalize_latents(x: jax.Array, mean: jax.Array, std: jax.Array) -> jax.Array:
    """x * std + mean per channel, fp32 island (reference: ops.py:111-125)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    return (xf * std.astype(jnp.float32) + mean.astype(jnp.float32)).astype(dtype)


def to_channels_last(x: jax.Array) -> jax.Array:
    """Pipeline (B, C, F, H, W) -> internal (B, F, H, W, C)."""
    return jnp.transpose(x, (0, 2, 3, 4, 1))


def to_channels_first(x: jax.Array) -> jax.Array:
    """Internal (B, F, H, W, C) -> pipeline (B, C, F, H, W)."""
    return jnp.transpose(x, (0, 4, 1, 2, 3))
