"""HiFi-GAN vocoder: mel spectrograms -> 24 kHz stereo waveform, TPU-native.

Behavioral spec: reference mlx_video/models/ltx/audio_vae/vocoder.py:12-142
and resnet.py:20-99 (ResBlock1/2, LRELU slope 0.1; final activation uses the
default 0.01 slope to match PyTorch F.leaky_relu).

Layout: NWC (batch, time, channels). PyTorch ConvTranspose1d is implemented
via input-dilated ``lax.conv_general_dilated`` with flipped kernels —
verified bit-close against torch in tests.
"""

from __future__ import annotations

import math
from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

LRELU_SLOPE = 0.1


def leaky_relu(x: jax.Array, negative_slope: float = LRELU_SLOPE) -> jax.Array:
    return jnp.maximum(x, x * negative_slope)


class VocoderConfig(NamedTuple):
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    upsample_rates: Tuple[int, ...] = (6, 5, 2, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 15, 8, 4, 4)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    upsample_initial_channel: int = 1024
    stereo: bool = True
    resblock: str = "1"
    output_sample_rate: int = 24000
    # channels * mel_bins of the decoded spectrogram; None = LTX-2 default
    # (2 stereo channels x 64 mel bins = 128, reference: vocoder.py:58).
    mel_in_channels: Optional[int] = None

    @property
    def in_channels(self) -> int:
        if self.mel_in_channels is not None:
            return self.mel_in_channels
        return 128 if self.stereo else 64

    @property
    def out_channels(self) -> int:
        return 2 if self.stereo else 1

    @property
    def upsample_factor(self) -> int:
        return math.prod(self.upsample_rates)


def _init_conv1d(key, cin, cout, k, dtype=jnp.float32) -> dict:
    scale = (cin * k) ** -0.5
    return {
        "weight": jax.random.uniform(key, (k, cin, cout), jnp.float32, -scale, scale).astype(dtype),
        "bias": jnp.zeros((cout,), dtype=dtype),
    }


def _conv1d(params, x, stride=1, padding=0, dilation=1):
    out = lax.conv_general_dilated(
        x,
        params["weight"].astype(x.dtype),
        (stride,),
        ((padding, padding),),
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return out + params["bias"].astype(x.dtype)


def _conv_transpose1d(params, x, stride, padding):
    """PyTorch ConvTranspose1d(stride=s, padding=p): input-dilated conv with
    spatially flipped kernel; weight stored as (k, C_in, C_out)."""
    w = jnp.flip(params["weight"], axis=0).astype(x.dtype)
    k = w.shape[0]
    pad = k - 1 - padding
    out = lax.conv_general_dilated(
        x, w, (1,), ((pad, pad),), lhs_dilation=(stride,), dimension_numbers=("NWC", "WIO", "NWC")
    )
    return out + params["bias"].astype(x.dtype)


def _init_resblock1(key, channels, kernel, dilations, dtype) -> dict:
    keys = jax.random.split(key, 2 * len(dilations))
    return {
        "convs1": {
            str(i): _init_conv1d(keys[i], channels, channels, kernel, dtype)
            for i in range(len(dilations))
        },
        "convs2": {
            str(i): _init_conv1d(keys[len(dilations) + i], channels, channels, kernel, dtype)
            for i in range(len(dilations))
        },
    }


def _resblock1(params, x, kernel, dilations):
    """LReLU -> dilated conv -> LReLU -> conv, residual (reference: resnet.py:20-64)."""
    for i, d in enumerate(dilations):
        xt = leaky_relu(x)
        xt = _conv1d(params["convs1"][str(i)], xt, padding=(kernel - 1) * d // 2, dilation=d)
        xt = leaky_relu(xt)
        xt = _conv1d(params["convs2"][str(i)], xt, padding=(kernel - 1) // 2)
        x = xt + x
    return x


def _init_resblock2(key, channels, kernel, dilations, dtype) -> dict:
    keys = jax.random.split(key, len(dilations))
    return {
        "convs": {
            str(i): _init_conv1d(keys[i], channels, channels, kernel, dtype)
            for i in range(len(dilations))
        }
    }


def _resblock2(params, x, kernel, dilations):
    for i, d in enumerate(dilations):
        xt = leaky_relu(x)
        xt = _conv1d(params["convs"][str(i)], xt, padding=(kernel - 1) * d // 2, dilation=d)
        x = xt + x
    return x


def init_vocoder(key, config: VocoderConfig = VocoderConfig(), dtype=jnp.float32) -> dict:
    n_up = len(config.upsample_rates)
    keys = jax.random.split(key, 2 + n_up + n_up * len(config.resblock_kernel_sizes))
    params: dict = {
        "conv_pre": _init_conv1d(keys[0], config.in_channels, config.upsample_initial_channel, 7, dtype),
        "ups": {},
        "resblocks": {},
    }
    ki = 2
    init_rb = _init_resblock1 if config.resblock == "1" else _init_resblock2
    block_idx = 0
    for i, (stride, k) in enumerate(zip(config.upsample_rates, config.upsample_kernel_sizes)):
        cin = config.upsample_initial_channel // (2**i)
        cout = config.upsample_initial_channel // (2 ** (i + 1))
        params["ups"][str(i)] = _init_conv1d(keys[ki], cin, cout, k, dtype)
        ki += 1
        for kernel, dils in zip(config.resblock_kernel_sizes, config.resblock_dilation_sizes):
            params["resblocks"][str(block_idx)] = init_rb(keys[ki], cout, kernel, dils, dtype)
            ki += 1
            block_idx += 1
    final_ch = config.upsample_initial_channel // (2**n_up)
    params["conv_post"] = _init_conv1d(keys[1], final_ch, config.out_channels, 7, dtype)
    return params


def vocoder_apply(params: dict, config: VocoderConfig, x: jax.Array) -> jax.Array:
    """(B, C, T, Mel) decoded spectrogram -> (B, out_ch, samples) waveform
    (reference: vocoder.py:91-142)."""
    # (B, C, T, M) -> (B, C, M, T) -> (B, C*M, T) -> NWC (B, T, C*M)
    x = jnp.transpose(x, (0, 1, 3, 2))
    b, s, c, t = x.shape
    x = x.reshape(b, s * c, t)
    x = jnp.transpose(x, (0, 2, 1))

    x = _conv1d(params["conv_pre"], x, padding=3)

    run_rb = _resblock1 if config.resblock == "1" else _resblock2
    num_kernels = len(config.resblock_kernel_sizes)
    for i, (stride, k) in enumerate(zip(config.upsample_rates, config.upsample_kernel_sizes)):
        x = leaky_relu(x)
        x = _conv_transpose1d(params["ups"][str(i)], x, stride, (k - stride) // 2)
        acc = None
        for j in range(num_kernels):
            idx = i * num_kernels + j
            out = run_rb(
                params["resblocks"][str(idx)], x,
                config.resblock_kernel_sizes[j], config.resblock_dilation_sizes[j],
            )
            acc = out if acc is None else acc + out
        x = acc / num_kernels

    # PyTorch F.leaky_relu default slope 0.01 here (reference: vocoder.py:133-135).
    x = leaky_relu(x, 0.01)
    x = _conv1d(params["conv_post"], x, padding=3)
    x = jnp.tanh(x)
    return jnp.transpose(x, (0, 2, 1))


def decode_audio(
    latent: jax.Array,
    decoder_params: dict,
    decoder_config,
    vocoder_params: dict,
    vocoder_config: VocoderConfig,
) -> jax.Array:
    """Latent -> spectrogram -> waveform (reference: audio_vae.py:471-486).

    One jitted (AOT-cached) program for the whole mel-decode + vocoder
    chain: eagerly it is hundreds of per-op dispatches through the device
    tunnel (~1-3 ms each) and none of its compile work persists across
    processes."""
    wav = _decode_audio_jit(
        latent, decoder_params, vocoder_params,
        decoder_config=decoder_config, vocoder_config=vocoder_config,
    )
    if wav.shape[0] == 1:
        wav = wav[0]
    return wav.astype(jnp.float32)


def _decode_audio_impl(latent, decoder_params, vocoder_params, decoder_config, vocoder_config):
    from mlx_video_tpu.models.ltx.audio_vae.audio_vae import audio_decoder_apply

    spec = audio_decoder_apply(decoder_params, decoder_config, latent)
    return vocoder_apply(vocoder_params, vocoder_config, spec)


from mlx_video_tpu.utils.aot import aot_jit as _aot_jit  # noqa: E402

_decode_audio_jit = _aot_jit(
    _decode_audio_impl, static_argnames=("decoder_config", "vocoder_config"),
    name="decode_audio",
)
