"""LTX-2 video VAE decoder with last-layer timestep modulation, TPU-native.

Behavioral spec: reference mlx_video/models/ltx/video_vae/decoder.py:237-531.

Architecture (128 latent ch -> RGB):
  conv_in 128->1024
  [5x ResBlock(1024, ts-mod)] -> up(2,2,2) ->512 -> [5x ResBlock(512)] ->
  up ->256 -> [5x ResBlock(256)] -> up ->128 -> [5x ResBlock(128)]
  pixel_norm -> last-layer timestep modulation -> SiLU -> conv_out 128->48
  unpatchify(4) -> (B, 3, F, H, W)

Noise injection (decode_noise_scale=0.025) and the decode timestep (0.05)
match reference decoder.py:267-269; the PRNG is an explicit JAX key.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from mlx_video_tpu.models.ltx.video_vae import ops
from mlx_video_tpu.models.ltx.video_vae.blocks import (
    depth_to_space_upsample,
    init_depth_to_space_upsample,
    pixel_norm,
)
from mlx_video_tpu.models.ltx.video_vae.conv import causal_conv3d, init_conv3d


class DecoderConfig(NamedTuple):
    """Geometry of the dedicated LTX-2 decoder (reference: decoder.py:237-322)."""

    in_channels: int = 128
    out_channels: int = 3
    patch_size: int = 4
    num_layers_per_block: int = 5
    base_channels: int = 1024
    num_upsamples: int = 3
    padding_mode: str = "reflect"
    timestep_conditioning: bool = True
    decode_noise_scale: float = 0.025
    decode_timestep: float = 0.05

    @property
    def channel_schedule(self):
        """[1024, 512, 256, 128] for the default geometry."""
        return [self.base_channels // (2**i) for i in range(self.num_upsamples + 1)]


def _timestep_embedding_256(t: jax.Array) -> jax.Array:
    """Sinusoidal 256-dim embedding, flip_sin_to_cos, fp32
    (reference: decoder.py:29-54)."""
    half = 128
    exponent = -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
    emb = t.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None, :]
    return jnp.concatenate([jnp.cos(emb), jnp.sin(emb)], axis=-1)


def init_time_embedder(key: jax.Array, embedding_dim: int, dtype=jnp.float32) -> dict:
    """PixArtAlphaTimestepEmbedder: 256 -> dim MLP (reference: decoder.py:57-91)."""
    k1, k2 = jax.random.split(key)
    s1, s2 = 256**-0.5, embedding_dim**-0.5
    return {
        "linear_1": {
            "weight": jax.random.uniform(k1, (256, embedding_dim), jnp.float32, -s1, s1).astype(dtype),
            "bias": jnp.zeros((embedding_dim,), dtype=dtype),
        },
        "linear_2": {
            "weight": jax.random.uniform(k2, (embedding_dim, embedding_dim), jnp.float32, -s2, s2).astype(dtype),
            "bias": jnp.zeros((embedding_dim,), dtype=dtype),
        },
    }


def time_embedder_apply(params: dict, t: jax.Array, dtype) -> jax.Array:
    proj = _timestep_embedding_256(t).astype(dtype)
    h = proj @ params["linear_1"]["weight"] + params["linear_1"]["bias"]
    h = jax.nn.silu(h)
    return h @ params["linear_2"]["weight"] + params["linear_2"]["bias"]


def _init_res_block(key: jax.Array, channels: int, ts_cond: bool, dtype) -> dict:
    k1, k2 = jax.random.split(key)
    params = {
        "conv1": init_conv3d(k1, channels, channels, 3, dtype=dtype),
        "conv2": init_conv3d(k2, channels, channels, 3, dtype=dtype),
    }
    if ts_cond:
        params["scale_shift_table"] = jnp.zeros((4, channels), dtype=dtype)
    return params


def _res_block(
    params: dict,
    x: jax.Array,
    causal: bool,
    padding_mode: str,
    timestep_embed: Optional[jax.Array],
) -> jax.Array:
    """Decoder resblock: pixel_norm(1e-8) -> ts-mod -> SiLU -> conv, x2
    (reference: decoder.py:94-180)."""
    residual = x
    if timestep_embed is not None:
        channels = params["scale_shift_table"].shape[1]
        b = x.shape[0]
        ada = params["scale_shift_table"][None] + timestep_embed.reshape(b, 4, channels)
        # (B, 4, C) -> four (B, 1, 1, 1, C) modulations for NDHWC broadcast.
        shift1, scale1, shift2, scale2 = (ada[:, i, None, None, None, :] for i in range(4))
    h = pixel_norm(x, eps=1e-8)
    if timestep_embed is not None:
        h = h * (1 + scale1) + shift1
    h = causal_conv3d(params["conv1"], jax.nn.silu(h), 3, 1, causal, padding_mode)
    h = pixel_norm(h, eps=1e-8)
    if timestep_embed is not None:
        h = h * (1 + scale2) + shift2
    h = causal_conv3d(params["conv2"], jax.nn.silu(h), 3, 1, causal, padding_mode)
    return h + residual


def init_video_decoder(key: jax.Array, config: DecoderConfig = DecoderConfig(), dtype=jnp.float32) -> dict:
    chans = config.channel_schedule
    n_groups = config.num_upsamples + 1
    keys = jax.random.split(key, 2 * n_groups + 4)
    params: dict = {
        "conv_in": init_conv3d(keys[0], config.in_channels, chans[0], 3, dtype=dtype),
        "latents_mean": jnp.zeros((config.in_channels,), dtype=jnp.float32),
        "latents_std": jnp.ones((config.in_channels,), dtype=jnp.float32),
        "up_blocks": {},
    }
    ki = 1
    for g, ch in enumerate(chans):
        # Res blocks are scan-stacked along a leading layer axis: one
        # compiled block body per group instead of num_layers_per_block
        # unrolled conv graphs — the full-geometry decoder's XLA compile
        # drops from >30 min (unrolled) to minutes (see DiT layer scan).
        blocks = [
            _init_res_block(
                jax.random.fold_in(keys[ki], j), ch, config.timestep_conditioning, dtype
            )
            for j in range(config.num_layers_per_block)
        ]
        group: dict = {
            "res_blocks": jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *blocks)
        }
        if config.timestep_conditioning:
            group["time_embedder"] = init_time_embedder(keys[ki + 1], ch * 4, dtype=dtype)
        params["up_blocks"][str(2 * g)] = group
        ki += 2
        if g < config.num_upsamples:
            params["up_blocks"][str(2 * g + 1)] = init_depth_to_space_upsample(
                jax.random.fold_in(keys[ki], g), ch, (2, 2, 2), 2, dtype=dtype
            )
    params["conv_out"] = init_conv3d(
        keys[-2], chans[-1], config.out_channels * config.patch_size**2, 3, dtype=dtype
    )
    if config.timestep_conditioning:
        params["last_time_embedder"] = init_time_embedder(keys[-1], chans[-1] * 2, dtype=dtype)
        params["last_scale_shift_table"] = jnp.zeros((2, chans[-1]), dtype=dtype)
    return params


from functools import partial

from mlx_video_tpu.utils.aot import aot_partial


@aot_partial(static_argnames=("config", "causal"))
def _decoder_head(params, config: DecoderConfig, sample_cl, noise, causal):
    """sample_cl is channels-LAST (B, F', H', W', C): the layout transpose
    stays OUTSIDE this jit — XLA:TPU's device-side compile of a channel
    transpose embedded in a jitted graph is pathological (200-450 s
    measured) while the same transpose as a standalone eager op costs ~40 ms
    (PERF.md round 2)."""
    x = sample_cl
    if noise is not None:
        x = noise * config.decode_noise_scale + (1.0 - config.decode_noise_scale) * x
    x = ops.denormalize_latents(x, params["latents_mean"], params["latents_std"])
    return causal_conv3d(params["conv_in"], x, 3, 1, causal, config.padding_mode)


@aot_partial(static_argnames=("config", "causal", "upsample"))
def _decoder_stage(group, ups, x, scaled_timestep, config: DecoderConfig, causal, upsample):
    """One res-block group (+ optional upsample) — jitted separately so the
    full-geometry decoder compiles as a handful of bounded stages instead of
    one monolithic conv graph (see video_decoder_apply_chunked)."""
    dtype = x.dtype
    ts_embed = None
    if scaled_timestep is not None:
        ts_embed = time_embedder_apply(group["time_embedder"], scaled_timestep, dtype)

    def res_body(h, bparams):
        return _res_block(bparams, h, causal, config.padding_mode, ts_embed), None

    x, _ = jax.lax.scan(res_body, x, group["res_blocks"])
    if upsample:
        x = depth_to_space_upsample(
            ups, x, (2, 2, 2),
            residual=True, out_channels_reduction_factor=2,
            causal=causal, padding_mode=config.padding_mode,
        )
    return x


@aot_partial(static_argnames=("config", "causal"))
def _decoder_tail(params, config: DecoderConfig, x, scaled_timestep, causal):
    b = x.shape[0]
    chans = config.channel_schedule
    x = pixel_norm(x, eps=1e-8)
    if scaled_timestep is not None:
        embedded = time_embedder_apply(params["last_time_embedder"], scaled_timestep, x.dtype)
        ada = params["last_scale_shift_table"][None] + embedded.reshape(b, 2, chans[-1])
        x = x * (1 + ada[:, 1, None, None, None, :]) + ada[:, 0, None, None, None, :]
    x = causal_conv3d(params["conv_out"], jax.nn.silu(x), 3, 1, causal, config.padding_mode)
    # Channels-LAST out; the caller transposes eagerly (see _decoder_head).
    return ops.unpatchify(x, patch_size_hw=config.patch_size, patch_size_t=1)


def video_decoder_apply_chunked(
    params: dict,
    config: DecoderConfig,
    sample: jax.Array,
    causal: bool = False,
    timestep: Optional[jax.Array] = None,
    noise_key: Optional[jax.Array] = None,
) -> jax.Array:
    """Decode with per-stage jits chained on device.

    Numerically identical to :func:`video_decoder_apply` but compiled as
    head + one stage per group(+upsample) + tail. Each stage compiles in
    bounded time (measured: one 1024-channel group ~81 s vs >25 min for the
    monolith at full geometry) and caches independently, so changing tile
    shape or frame count recompiles only the affected stages. Host-driven
    decode paths (pipelines/generate, tiling) use this by default.
    """
    b = sample.shape[0]
    # Layout conversions happen HERE, outside the stage jits — eager channel
    # transposes are cheap; the same transpose inside a jitted graph hits a
    # pathological XLA:TPU device-side compile (PERF.md round 2).
    sample_cl = ops.to_channels_last(sample)
    noise = None
    if config.timestep_conditioning and noise_key is not None:
        noise = jax.random.normal(noise_key, sample_cl.shape,
                                  dtype=jnp.float32).astype(sample.dtype)
    scaled_timestep = None
    if config.timestep_conditioning:
        if timestep is None:
            timestep = jnp.full((b,), config.decode_timestep, dtype=jnp.float32)
        scaled_timestep = timestep * 1000.0

    x = _decoder_head(params, config, sample_cl, noise, causal)
    for g in range(config.num_upsamples + 1):
        group = params["up_blocks"][str(2 * g)]
        ups = params["up_blocks"].get(str(2 * g + 1))
        x = _decoder_stage(
            group, ups, x, scaled_timestep, config, causal, upsample=ups is not None
        )
    return ops.to_channels_first(_decoder_tail(params, config, x, scaled_timestep, causal))


def video_decoder_apply(
    params: dict,
    config: DecoderConfig,
    sample: jax.Array,
    causal: bool = False,
    timestep: Optional[jax.Array] = None,
    noise_key: Optional[jax.Array] = None,
) -> jax.Array:
    """Decode (B, latent_C, F', H', W') latents to (B, 3, F, H, W) RGB
    (reference: decoder.py:361-450).

    noise_key: PRNG key for the decode-noise injection; None disables noise
    (the reference always injects when timestep conditioning is on,
    decoder.py:380-385 — pass a key for parity).
    """
    b = sample.shape[0]
    dtype = sample.dtype
    x = ops.to_channels_last(sample)

    if config.timestep_conditioning and noise_key is not None:
        noise = jax.random.normal(noise_key, x.shape, dtype=jnp.float32).astype(dtype)
        x = noise * config.decode_noise_scale + (1.0 - config.decode_noise_scale) * x

    x = ops.denormalize_latents(x, params["latents_mean"], params["latents_std"])

    scaled_timestep = None
    if config.timestep_conditioning:
        if timestep is None:
            timestep = jnp.full((b,), config.decode_timestep, dtype=jnp.float32)
        scaled_timestep = timestep * 1000.0

    pm = config.padding_mode
    x = causal_conv3d(params["conv_in"], x, 3, 1, causal, pm)

    chans = config.channel_schedule
    for g, ch in enumerate(chans):
        group = params["up_blocks"][str(2 * g)]
        ts_embed = None
        if scaled_timestep is not None:
            ts_embed = time_embedder_apply(group["time_embedder"], scaled_timestep, dtype)

        def res_body(h, bparams, ts_embed=ts_embed):
            return _res_block(bparams, h, causal, pm, ts_embed), None

        x, _ = jax.lax.scan(res_body, x, group["res_blocks"])
        if g < config.num_upsamples:
            x = depth_to_space_upsample(
                params["up_blocks"][str(2 * g + 1)], x, (2, 2, 2),
                residual=True, out_channels_reduction_factor=2, causal=causal, padding_mode=pm,
            )

    x = pixel_norm(x, eps=1e-8)
    if scaled_timestep is not None:
        embedded = time_embedder_apply(params["last_time_embedder"], scaled_timestep, dtype)
        ada = params["last_scale_shift_table"][None] + embedded.reshape(b, 2, chans[-1])
        shift = ada[:, 0, None, None, None, :]
        scale = ada[:, 1, None, None, None, :]
        x = x * (1 + scale) + shift

    x = causal_conv3d(params["conv_out"], jax.nn.silu(x), 3, 1, causal, pm)
    x = ops.unpatchify(x, patch_size_hw=config.patch_size, patch_size_t=1)
    return ops.to_channels_first(x)
