"""Audio VAE: 2D conv VAE over mel spectrograms, TPU-native.

Behavioral spec: reference mlx_video/models/ltx/audio_vae/audio_vae.py:61-486
plus building blocks (causal_conv_2d.py, resnet.py, downsample.py,
upsample.py, attention.py, normalization.py, ops.py).

Geometry (LTX-2 defaults): stereo log-mel input (B, 2, T, 64), base ch=128,
ch_mult (1,2,4) -> 2 downsamples (time /4, mel 64->16), latent z=8 channels.
Height (= time) causal convolutions. Internal layout is channels-last
(B, T, M, C); the public API keeps the trainer-compatible channels-first
(B, C, T, M) contract.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax


class AudioVAEConfig(NamedTuple):
    """Shared encoder/decoder geometry (reference: audio_vae.py:61-120, 228-311).

    Defaults are the LTX-2 checkpoint geometry as the reference CONSTRUCTS
    it (generate.py:1705-1724: ``attn_resolutions=set()``,
    ``mid_block_add_attention=False`` — "Config says no attention in mid
    block"), not the reference class defaults. With attention defaulted on,
    init creates attn blocks the checkpoint has no weights for, and a
    randomly-initialized attention ran mid-network on every audio decode.
    """

    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4)
    num_res_blocks: int = 2
    in_channels: int = 2
    out_ch: int = 2
    z_channels: int = 8
    double_z: bool = True
    resolution: int = 256
    attn_resolutions: Tuple[int, ...] = ()  # encoder: none
    decoder_attn_resolutions: Tuple[int, ...] = ()
    mid_block_add_attention: bool = False
    mel_bins: int = 64
    latent_downsample_factor: int = 4
    sample_rate: int = 16000
    mel_hop_length: int = 160
    is_causal: bool = True


# ---------------------------------------------------------------------------
# Primitives (channels-last (B, T, M, C); time axis is causal "height")
# ---------------------------------------------------------------------------


def _pixel_norm(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * lax.rsqrt(ms + eps)).astype(dtype)


def init_conv2d(key, cin, cout, k, dtype=jnp.float32) -> dict:
    kh, kw = (k, k) if isinstance(k, int) else k
    scale = (cin * kh * kw) ** -0.5
    return {
        "weight": jax.random.uniform(key, (kh, kw, cin, cout), jnp.float32, -scale, scale).astype(dtype),
        "bias": jnp.zeros((cout,), dtype=dtype),
    }


def _conv(params, x, stride=1, padding=((0, 0), (0, 0))):
    st = (stride, stride) if isinstance(stride, int) else stride
    out = lax.conv_general_dilated(
        x, params["weight"].astype(x.dtype), st, padding, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return out + params["bias"].astype(x.dtype)


def causal_conv2d(params, x, kernel: int = 3, stride: int = 1, causal: bool = True):
    """Height(=time)-causal conv: pad (k-1) before the time axis, symmetric on
    mel (reference: causal_conv_2d.py:18-101, HEIGHT axis)."""
    k = kernel
    if causal:
        pad = ((k - 1, 0), ((k - 1) // 2, (k - 1) - (k - 1) // 2))
    else:
        pad = (((k - 1) // 2, (k - 1) - (k - 1) // 2), ((k - 1) // 2, (k - 1) - (k - 1) // 2))
    return _conv(params, x, stride, pad)


def init_resnet_block(key, cin, cout, dtype=jnp.float32) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "conv1": init_conv2d(k1, cin, cout, 3, dtype),
        "conv2": init_conv2d(k2, cout, cout, 3, dtype),
    }
    if cin != cout:
        p["nin_shortcut"] = init_conv2d(k3, cin, cout, 1, dtype)
    return p


def resnet_block(params, x, causal: bool = True):
    """pixel_norm -> SiLU -> causal conv, x2, + shortcut
    (reference: resnet.py:101-185 with PIXEL norm)."""
    h = causal_conv2d(params["conv1"], jax.nn.silu(_pixel_norm(x)), 3, 1, causal)
    h = causal_conv2d(params["conv2"], jax.nn.silu(_pixel_norm(h)), 3, 1, causal)
    if "nin_shortcut" in params:
        x = causal_conv2d(params["nin_shortcut"], x, 1, 1, causal)
    return x + h


def init_attn_block(key, c, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 4)
    return {name: init_conv2d(ks[i], c, c, 1, dtype) for i, name in enumerate(("q", "k", "v", "proj_out"))}


def attn_block(params, x):
    """Single-head spatial self-attention (reference: attention.py:20-77)."""
    h = _pixel_norm(x)
    q, k, v = (_conv(params[n], h) for n in ("q", "k", "v"))
    b, t, m, c = q.shape
    q = q.reshape(b, t * m, c)
    k = k.reshape(b, t * m, c)
    v = v.reshape(b, t * m, c)
    w = jax.nn.softmax(jnp.einsum("bqc,bkc->bqk", q, k) * c**-0.5, axis=-1)
    h = jnp.einsum("bqk,bkc->bqc", w, v).reshape(b, t, m, c)
    return x + _conv(params["proj_out"], h)


def init_downsample(key, c, dtype=jnp.float32) -> dict:
    return {"conv": init_conv2d(key, c, c, 3, dtype)}


def downsample(params, x, causal: bool = True):
    """Strided 3x3 downsample; causal pads (2, 0) on time, (0, 1) on mel
    (reference: downsample.py:16-75, HEIGHT axis)."""
    pad = ((2, 0), (0, 1)) if causal else ((0, 1), (0, 1))
    return _conv(params["conv"], x, 2, pad)


def init_upsample(key, c, dtype=jnp.float32) -> dict:
    return {"conv": init_conv2d(key, c, c, 3, dtype)}


def upsample(params, x, causal: bool = True):
    """Nearest-neighbor 2x + causal conv; drop the first time row to undo
    the causal pad (reference: upsample.py:33-89)."""
    x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    x = causal_conv2d(params["conv"], x, 3, 1, causal)
    if causal:
        x = x[:, 1:]
    return x


# ---------------------------------------------------------------------------
# Patchifier + per-channel statistics (reference: ops.py:26-105)
# ---------------------------------------------------------------------------


def patchify_audio(x: jax.Array) -> jax.Array:
    """(B, T, M, C) -> (B, T, C*M), channel-major packing ('b c t f -> b t (c f)')."""
    b, t, m, c = x.shape
    return jnp.transpose(x, (0, 1, 3, 2)).reshape(b, t, c * m)


def unpatchify_audio(x: jax.Array, channels: int, mel_bins: int) -> jax.Array:
    """(B, T, C*M) -> (B, T, M, C)."""
    b, t, _ = x.shape
    return jnp.transpose(x.reshape(b, t, channels, mel_bins), (0, 1, 3, 2))


def init_per_channel_statistics(channels: int = 128) -> dict:
    return {
        "std_of_means": jnp.ones((channels,), dtype=jnp.float32),
        "mean_of_means": jnp.zeros((channels,), dtype=jnp.float32),
    }


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def init_audio_encoder(key, config: AudioVAEConfig = AudioVAEConfig(), dtype=jnp.float32) -> dict:
    n_res = len(config.ch_mult)
    keys = jax.random.split(key, 4 + n_res)
    in_mult = (1,) + tuple(config.ch_mult)
    params: dict = {
        "conv_in": init_conv2d(keys[0], config.in_channels, config.ch, 3, dtype),
        "per_channel_statistics": init_per_channel_statistics(
            config.z_channels * (config.mel_bins // config.latent_downsample_factor)
        ),
        "down": {},
    }
    curr_res = config.resolution
    block_in = config.ch
    for level in range(n_res):
        stage: dict = {"block": {}, "attn": {}}
        block_in = config.ch * in_mult[level]
        block_out = config.ch * config.ch_mult[level]
        bkeys = jax.random.split(keys[2 + level], config.num_res_blocks + 2)
        for i in range(config.num_res_blocks):
            stage["block"][str(i)] = init_resnet_block(bkeys[i], block_in, block_out, dtype)
            block_in = block_out
            if curr_res in config.attn_resolutions:
                stage["attn"][str(i)] = init_attn_block(
                    jax.random.fold_in(bkeys[config.num_res_blocks], i), block_in, dtype
                )
        if level != n_res - 1:
            stage["downsample"] = init_downsample(bkeys[-1], block_in, dtype)
            curr_res //= 2
        params["down"][str(level)] = stage

    mk = jax.random.split(keys[1], 3)
    params["mid"] = {
        "block_1": init_resnet_block(mk[0], block_in, block_in, dtype),
        "block_2": init_resnet_block(mk[1], block_in, block_in, dtype),
    }
    if config.mid_block_add_attention:
        params["mid"]["attn_1"] = init_attn_block(mk[2], block_in, dtype)
    out_c = 2 * config.z_channels if config.double_z else config.z_channels
    params["conv_out"] = init_conv2d(keys[-1], block_in, out_c, 3, dtype)
    return params


def audio_encoder_apply(
    params: dict, config: AudioVAEConfig, spectrogram: jax.Array
) -> jax.Array:
    """Encode (B, C_in, T, M) or (B, T, M, C_in) log-mel spectrograms to
    normalized latents (B, z, T', M') channels-first
    (reference: audio_vae.py:164-218)."""
    if spectrogram.ndim != 4:
        raise ValueError(f"Expected 4D spectrogram, got {spectrogram.shape}")
    if spectrogram.shape[1] == config.in_channels and spectrogram.shape[-1] != config.in_channels:
        spectrogram = jnp.transpose(spectrogram, (0, 2, 3, 1))

    causal = config.is_causal
    h = causal_conv2d(params["conv_in"], spectrogram, 3, 1, causal)
    n_res = len(config.ch_mult)
    curr_res = config.resolution
    for level in range(n_res):
        stage = params["down"][str(level)]
        for i in range(config.num_res_blocks):
            h = resnet_block(stage["block"][str(i)], h, causal)
            if str(i) in stage["attn"]:
                h = attn_block(stage["attn"][str(i)], h)
        if level != n_res - 1:
            h = downsample(stage["downsample"], h, causal)
            curr_res //= 2

    h = resnet_block(params["mid"]["block_1"], h, causal)
    if "attn_1" in params["mid"]:
        h = attn_block(params["mid"]["attn_1"], h)
    h = resnet_block(params["mid"]["block_2"], h, causal)

    h = causal_conv2d(params["conv_out"], jax.nn.silu(_pixel_norm(h)), 3, 1, causal)

    means = h[..., : config.z_channels] if config.double_z else h
    mel_latent = means.shape[2]
    stats = params["per_channel_statistics"]
    patched = patchify_audio(means)
    normalized = (patched.astype(jnp.float32) - stats["mean_of_means"]) / stats["std_of_means"]
    latents = unpatchify_audio(normalized.astype(means.dtype), config.z_channels, mel_latent)
    return jnp.transpose(latents, (0, 3, 1, 2))


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def init_audio_decoder(key, config: AudioVAEConfig = AudioVAEConfig(), dtype=jnp.float32) -> dict:
    n_res = len(config.ch_mult)
    keys = jax.random.split(key, 5 + n_res)
    base_ch = config.ch * config.ch_mult[-1]
    params: dict = {
        "conv_in": init_conv2d(keys[0], config.z_channels, base_ch, 3, dtype),
        "per_channel_statistics": init_per_channel_statistics(
            config.z_channels * (config.mel_bins // config.latent_downsample_factor)
        ),
        "up": {},
    }
    mk = jax.random.split(keys[1], 3)
    params["mid"] = {
        "block_1": init_resnet_block(mk[0], base_ch, base_ch, dtype),
        "block_2": init_resnet_block(mk[1], base_ch, base_ch, dtype),
    }
    if config.mid_block_add_attention:
        params["mid"]["attn_1"] = init_attn_block(mk[2], base_ch, dtype)

    block_in = base_ch
    curr_res = config.resolution // (2 ** (n_res - 1))
    for level in reversed(range(n_res)):
        stage: dict = {"block": {}, "attn": {}}
        block_out = config.ch * config.ch_mult[level]
        bkeys = jax.random.split(keys[2 + level], config.num_res_blocks + 3)
        for i in range(config.num_res_blocks + 1):
            stage["block"][str(i)] = init_resnet_block(bkeys[i], block_in, block_out, dtype)
            block_in = block_out
            if curr_res in config.decoder_attn_resolutions:
                stage["attn"][str(i)] = init_attn_block(
                    jax.random.fold_in(bkeys[-2], i), block_in, dtype
                )
        if level != 0:
            stage["upsample"] = init_upsample(bkeys[-1], block_in, dtype)
            curr_res *= 2
        params["up"][str(level)] = stage

    params["conv_out"] = init_conv2d(keys[-1], block_in, config.out_ch, 3, dtype)
    return params


def audio_decoder_apply(params: dict, config: AudioVAEConfig, sample: jax.Array) -> jax.Array:
    """Decode latents (B, z, T', M') to spectrograms (B, out_ch, T, M)
    channels-first (reference: audio_vae.py:348-458)."""
    if sample.shape[1] == config.z_channels and sample.ndim == 4:
        sample = jnp.transpose(sample, (0, 2, 3, 1))
    causal = config.is_causal

    b, t_lat, mel_lat, z = sample.shape
    stats = params["per_channel_statistics"]
    patched = patchify_audio(sample)
    denorm = patched.astype(jnp.float32) * stats["std_of_means"] + stats["mean_of_means"]
    h = unpatchify_audio(denorm.astype(sample.dtype), z, mel_lat)

    target_t = t_lat * config.latent_downsample_factor
    if causal:
        target_t = max(target_t - (config.latent_downsample_factor - 1), 1)
    target_m = config.mel_bins

    h = causal_conv2d(params["conv_in"], h, 3, 1, causal)
    h = resnet_block(params["mid"]["block_1"], h, causal)
    if "attn_1" in params["mid"]:
        h = attn_block(params["mid"]["attn_1"], h)
    h = resnet_block(params["mid"]["block_2"], h, causal)

    n_res = len(config.ch_mult)
    for level in reversed(range(n_res)):
        stage = params["up"][str(level)]
        for i in range(config.num_res_blocks + 1):
            h = resnet_block(stage["block"][str(i)], h, causal)
            if str(i) in stage["attn"]:
                h = attn_block(stage["attn"][str(i)], h)
        if level != 0:
            h = upsample(stage["upsample"], h, causal)

    h = causal_conv2d(params["conv_out"], jax.nn.silu(_pixel_norm(h)), 3, 1, causal)

    # Crop/pad to the exact target length (reference: audio_vae.py:398-444).
    h = h[:, : min(h.shape[1], target_t), : min(h.shape[2], target_m), : config.out_ch]
    pad_t = target_t - h.shape[1]
    pad_m = target_m - h.shape[2]
    if pad_t > 0 or pad_m > 0:
        h = jnp.pad(h, ((0, 0), (0, max(pad_t, 0)), (0, max(pad_m, 0)), (0, 0)))
    h = h[:, :target_t, :target_m]
    return jnp.transpose(h, (0, 3, 1, 2))
