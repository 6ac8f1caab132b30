"""Causal 3D/2D convolution primitives for the video VAE, TPU-native.

Behavioral spec: reference mlx_video/models/ltx/video_vae/convolution.py:78-294.

Design differences from the reference (deliberate):
- **NDHWC throughout.** All VAE tensors are channels-last ``(B, F, H, W, C)``
  internally, which is the native TPU conv layout; the public encode/decode
  API converts from the pipeline's ``(B, C, F, H, W)`` once at the boundary.
- **No temporal chunking.** The reference chunks conv3d to work around an
  MLX large-tensor bug (convolution.py:168-222); XLA handles large tensors,
  and memory pressure is managed at the tiling layer instead.
- Weights are stored in JAX rhs layout ``(D, H, W, I, O)``; the checkpoint
  loader transposes once from the PyTorch ``(O, I, D, H, W)`` layout.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

PaddingMode = str  # "zeros" | "reflect"


def _triple(v) -> Tuple[int, int, int]:
    return (v, v, v) if isinstance(v, int) else tuple(v)


def temporal_causal_pad(x: jax.Array, time_kernel: int, causal: bool) -> jax.Array:
    """Edge-replicate temporal padding (reference: convolution.py:124-137).

    Causal: repeat the first frame ``k-1`` times at the start. Non-causal:
    repeat first/last frames ``(k-1)//2`` times on each side.
    x: (B, F, H, W, C).
    """
    if time_kernel <= 1:
        return x
    if causal:
        first = jnp.repeat(x[:, :1], time_kernel - 1, axis=1)
        return jnp.concatenate([first, x], axis=1)
    pad = (time_kernel - 1) // 2
    if pad == 0:
        return x
    first = jnp.repeat(x[:, :1], pad, axis=1)
    last = jnp.repeat(x[:, -1:], pad, axis=1)
    return jnp.concatenate([first, x, last], axis=1)


def spatial_pad(x: jax.Array, pad_h: int, pad_w: int, mode: PaddingMode) -> jax.Array:
    """Zero or reflect (boundary-excluding) spatial padding
    (reference: convolution.py:13-40, 143-157). x: (B, F, H, W, C)."""
    if pad_h == 0 and pad_w == 0:
        return x
    widths = ((0, 0), (0, 0), (pad_h, pad_h), (pad_w, pad_w), (0, 0))
    if mode == "reflect":
        return jnp.pad(x, widths, mode="reflect")
    return jnp.pad(x, widths)


def init_conv3d(
    key: jax.Array,
    in_channels: int,
    out_channels: int,
    kernel_size: Union[int, Tuple[int, int, int]],
    dtype=jnp.float32,
) -> dict:
    kd, kh, kw = _triple(kernel_size)
    fan_in = in_channels * kd * kh * kw
    scale = fan_in**-0.5
    return {
        "weight": jax.random.uniform(
            key, (kd, kh, kw, in_channels, out_channels), jnp.float32, -scale, scale
        ).astype(dtype),
        "bias": jnp.zeros((out_channels,), dtype=dtype),
    }


def conv3d_via_2d(
    x: jax.Array, weight: jax.Array, strides: Tuple[int, int, int]
) -> jax.Array:
    """VALID 3D convolution lowered to ``kd`` batched 2D convolutions.

    XLA:TPU's native 3D-conv lowering compiles pathologically slowly at VAE
    geometries (243 s device-side for ONE 1024-channel 3x3x3 conv vs 1-4 s
    for the identical math expressed as 2D convs; steady-state is equal —
    scripts/ab_conv3d.py), so every VAE/upsampler conv routes through this
    decomposition: temporal kernel tap ``t`` is a (B*F_out)-batched 2D conv,
    taps accumulated in fp32, rounded once at the end.

    x: (B, F_padded, H_padded, W_padded, C); weight: (kd, kh, kw, I, O).
    """
    kd = weight.shape[0]
    sd, sh, sw = strides
    b, fp, hp, wp, c = x.shape
    fo = (fp - kd) // sd + 1
    out = None
    for t in range(kd):
        xt = x if (kd == 1 and sd == 1) else x[:, t : t + (fo - 1) * sd + 1 : sd]
        o = lax.conv_general_dilated(
            xt.reshape(b * fo, hp, wp, c),
            weight[t],
            window_strides=(sh, sw),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        out = o if out is None else out + o
    return out.reshape(b, fo, out.shape[1], out.shape[2], weight.shape[4])


def causal_conv3d(
    params: dict,
    x: jax.Array,
    kernel_size: Union[int, Tuple[int, int, int]],
    stride: Union[int, Tuple[int, int, int]] = 1,
    causal: bool = False,
    padding_mode: PaddingMode = "zeros",
) -> jax.Array:
    """Causal 3D convolution over (B, F, H, W, C).

    Temporal padding replicates the first frame (causal) or both edges
    (non-causal); spatial padding is k//2 zero/reflect on each side.
    """
    kd, kh, kw = _triple(kernel_size)
    x = temporal_causal_pad(x, kd, causal)
    x = spatial_pad(x, kh // 2, kw // 2, padding_mode)
    out = conv3d_via_2d(x, params["weight"].astype(x.dtype), _triple(stride))
    return (out + params["bias"].astype(jnp.float32)).astype(x.dtype)


def init_conv2d(
    key: jax.Array,
    in_channels: int,
    out_channels: int,
    kernel_size: Union[int, Tuple[int, int]],
    dtype=jnp.float32,
) -> dict:
    kh, kw = (kernel_size, kernel_size) if isinstance(kernel_size, int) else tuple(kernel_size)
    fan_in = in_channels * kh * kw
    scale = fan_in**-0.5
    return {
        "weight": jax.random.uniform(
            key, (kh, kw, in_channels, out_channels), jnp.float32, -scale, scale
        ).astype(dtype),
        "bias": jnp.zeros((out_channels,), dtype=dtype),
    }


def conv2d(
    params: dict,
    x: jax.Array,
    stride: Union[int, Tuple[int, int]] = 1,
    padding: Union[int, Tuple[int, int]] = 0,
) -> jax.Array:
    """Plain 2D convolution over (B, H, W, C) with symmetric zero padding
    (reference: convolution.py:225-294)."""
    ph, pw = (padding, padding) if isinstance(padding, int) else tuple(padding)
    st = (stride, stride) if isinstance(stride, int) else tuple(stride)
    out = lax.conv_general_dilated(
        x,
        params["weight"].astype(x.dtype),
        window_strides=st,
        padding=((ph, ph), (pw, pw)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + params["bias"].astype(x.dtype)
