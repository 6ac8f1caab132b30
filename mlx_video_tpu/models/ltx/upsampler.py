"""2x latent spatial upsampler, TPU-native.

Behavioral spec: reference mlx_video/models/ltx/upsampler.py:6-316.

Structure: conv3d 128->1024 + GroupNorm/SiLU, 4 ResBlock3D, per-frame 2D
conv + pixel-shuffle 2x, 4 post ResBlock3D, conv3d 1024->128. Applied on
*de-normalized* latents then re-normalized (``upsample_latents``).

ResBlock order matters: conv -> norm -> SiLU, conv -> norm, then SiLU AFTER
the residual add (reference: upsampler.py:177-199).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from einops import rearrange

from mlx_video_tpu.models.ltx.video_vae import ops
from mlx_video_tpu.models.ltx.video_vae.blocks import group_norm
from mlx_video_tpu.models.ltx.video_vae.conv import (
    conv2d,
    conv3d_via_2d,
    init_conv2d,
    init_conv3d,
)
from jax import lax


def _conv3d_same(params: dict, x: jax.Array) -> jax.Array:
    """3x3x3 conv with symmetric zero padding over (B, F, H, W, C).

    Lowered via conv3d_via_2d — XLA:TPU's 3D-conv compile is pathological
    at these channel counts (scripts/ab_conv3d.py)."""
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    out = conv3d_via_2d(x, params["weight"].astype(x.dtype), (1, 1, 1))
    return (out + params["bias"].astype(jnp.float32)).astype(x.dtype)


def _init_norm(channels: int, dtype) -> dict:
    return {"weight": jnp.ones((channels,), dtype=dtype), "bias": jnp.zeros((channels,), dtype=dtype)}


def init_res_block_3d(key: jax.Array, channels: int, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "conv1": init_conv3d(k1, channels, channels, 3, dtype=dtype),
        "norm1": _init_norm(channels, dtype),
        "conv2": init_conv3d(k2, channels, channels, 3, dtype=dtype),
        "norm2": _init_norm(channels, dtype),
    }


def res_block_3d(params: dict, x: jax.Array) -> jax.Array:
    """conv/norm/silu -> conv/norm -> silu(x + residual)
    (reference: upsampler.py:177-199). GroupNorm eps=1e-5."""
    residual = x
    h = jax.nn.silu(group_norm(params["norm1"], _conv3d_same(params["conv1"], x), 32, eps=1e-5))
    h = group_norm(params["norm2"], _conv3d_same(params["conv2"], h), 32, eps=1e-5)
    return jax.nn.silu(h + residual)


def pixel_shuffle_2d(x: jax.Array, r: int = 2) -> jax.Array:
    """(N, H, W, C*r*r) -> (N, H*r, W*r, C) with torch PixelShuffle channel
    order (reference: upsampler.py:117-139)."""
    return rearrange(x, "n h w (c rh rw) -> n (h rh) (w rw) c", rh=r, rw=r)


def blur_down(x: jax.Array, factor: int = 2) -> jax.Array:
    """Antialiased spatial downsample: 5x5 box blur then stride subsample.

    Reference: upsampler.py:152-154 defines exactly this ``blur_down_kernel``
    (ones(5,5)/25) on SpatialRationalResampler; the reference forward never
    applies it (its scale is pinned to 2.0), but it is the documented
    antialiasing path for rational scales. x: (N, H, W, C).
    """
    n, h, w, c = x.shape
    kernel = jnp.full((5, 5, 1, 1), 1.0 / 25.0, dtype=x.dtype)
    xc = jnp.transpose(x, (0, 3, 1, 2)).reshape(n * c, 1, h, w)
    blurred = jax.lax.conv_general_dilated(
        xc, kernel, window_strides=(factor, factor), padding=[(2, 2), (2, 2)],
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
    )
    _, _, h2, w2 = blurred.shape
    return jnp.transpose(blurred.reshape(n, c, h2, w2), (0, 2, 3, 1))


def spatial_rational_resample(params: dict, x: jax.Array, scale: float = 2.0) -> jax.Array:
    """SpatialRationalResampler: per-frame conv -> pixel-shuffle 2x, then an
    antialiased blur-downsample for rational scales 2/q
    (reference: upsampler.py:142-174; scale=2.0 reproduces the reference
    forward exactly). x: (B, F, H, W, C) channels-last."""
    b, f, h, w, c = x.shape
    x2 = x.reshape(b * f, h, w, c)
    x2 = conv2d(params["conv"], x2, stride=1, padding=1)
    x2 = pixel_shuffle_2d(x2, 2)
    if scale != 2.0:
        q = round(2.0 / scale)
        if abs(2.0 / q - scale) > 1e-6 or q < 1:
            raise ValueError(f"Unsupported rational scale {scale} (need 2/q)")
        if q > 1:
            x2 = blur_down(x2, factor=q)
    h2, w2 = x2.shape[1], x2.shape[2]
    return x2.reshape(b, f, h2, w2, c)


def init_latent_upsampler(
    key: jax.Array, in_channels: int = 128, mid_channels: int = 1024, num_blocks: int = 4, dtype=jnp.float32
) -> dict:
    keys = jax.random.split(key, 4 + 2 * num_blocks)

    def stacked_blocks(key_offset: int) -> dict:
        # scan-stacked along a leading layer axis (compile time; see decoder)
        blocks = [
            init_res_block_3d(keys[key_offset + i], mid_channels, dtype=dtype)
            for i in range(num_blocks)
        ]
        return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *blocks)

    return {
        "initial_conv": init_conv3d(keys[0], in_channels, mid_channels, 3, dtype=dtype),
        "initial_norm": _init_norm(mid_channels, dtype),
        "res_blocks": stacked_blocks(2),
        "upsampler": {"conv": init_conv2d(keys[1], mid_channels, 4 * mid_channels, 3, dtype=dtype)},
        "post_upsample_res_blocks": stacked_blocks(2 + num_blocks),
        "final_conv": init_conv3d(keys[-1], mid_channels, in_channels, 3, dtype=dtype),
    }


def latent_upsampler_apply(params: dict, latent: jax.Array) -> jax.Array:
    """(B, C, F, H, W) -> (B, C, F, 2H, 2W) (reference: upsampler.py:232-294).

    Compatibility wrapper over :func:`latent_upsampler_apply_cl`; jit the
    ``_cl`` core with eager transposes outside when host-driving (channel
    transposes inside a jitted graph device-compile pathologically on TPU —
    PERF.md round 2)."""
    return ops.to_channels_first(latent_upsampler_apply_cl(params, ops.to_channels_last(latent)))


def latent_upsampler_apply_cl(params: dict, x: jax.Array) -> jax.Array:
    """Channels-last core: (B, F, H, W, C) -> (B, F, 2H, 2W, C)."""
    x = jax.nn.silu(group_norm(params["initial_norm"], _conv3d_same(params["initial_conv"], x), 32, eps=1e-5))

    def res_body(h, bparams):
        return res_block_3d(bparams, h), None

    x, _ = jax.lax.scan(res_body, x, params["res_blocks"])

    # Per-frame 2D conv + pixel shuffle 2x (reference: upsampler.py:142-174).
    x = spatial_rational_resample(params["upsampler"], x, scale=2.0)

    x, _ = jax.lax.scan(res_body, x, params["post_upsample_res_blocks"])

    return _conv3d_same(params["final_conv"], x)


def upsample_latents(
    params: dict, latent: jax.Array, latent_mean: jax.Array, latent_std: jax.Array
) -> jax.Array:
    """Denormalize -> upsample -> renormalize (reference: upsampler.py:297-316)."""
    up_cl = upsample_latents_cl(params, ops.to_channels_last(latent), latent_mean, latent_std)
    return ops.to_channels_first(up_cl)


def upsample_latents_cl(
    params: dict, latent_cl: jax.Array, latent_mean: jax.Array, latent_std: jax.Array
) -> jax.Array:
    """Channels-last denormalize -> upsample -> renormalize core; see
    latent_upsampler_apply for why the layout transpose stays outside."""
    mean = latent_mean.reshape(1, 1, 1, 1, -1).astype(latent_cl.dtype)
    std = latent_std.reshape(1, 1, 1, 1, -1).astype(latent_cl.dtype)
    up = latent_upsampler_apply_cl(params, latent_cl * std + mean)
    return (up - mean) / std
