"""Scaled dot-product attention for TPU.

Replaces ``mx.fast.scaled_dot_product_attention``
(reference: mlx_video/models/ltx/attention.py:13-53). The default path is
``jax.nn.dot_product_attention`` which XLA lowers to a fused flash-style
kernel on TPU; a Pallas flash-attention kernel is available behind the same
interface for the long-sequence/self-attention hot path
(see mlx_video_tpu/ops/flash_attention.py).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

# Flash-attention policy: None = auto (on for eligible shapes on TPU; 3.9x
# faster than XLA attention at DiT geometry, measured on v5e), True/False =
# forced via use_pallas_flash() or MLX_VIDEO_TPU_FLASH=1/0.
_USE_PALLAS_FLASH: Optional[bool] = (
    {"1": True, "0": False}.get(os.environ.get("MLX_VIDEO_TPU_FLASH", ""), None)
)
_ON_TPU: Optional[bool] = None


def use_pallas_flash(enable: Optional[bool] = True) -> None:
    global _USE_PALLAS_FLASH
    _USE_PALLAS_FLASH = enable


def _tpu_backend() -> bool:
    global _ON_TPU
    if _ON_TPU is None:
        try:
            platform = jax.devices()[0].platform.lower()
        except Exception:
            platform = "cpu"
        _ON_TPU = platform in ("tpu", "axon")
    return _ON_TPU


def _flash_eligible(q: jax.Array, k: jax.Array, bias) -> bool:
    """Self-attention shapes the Pallas kernel supports profitably: no bias,
    square attention, lane-aligned head dim, enough tokens to tile — and a
    VMEM upper bound: the kernel keeps the full K and V resident in VMEM
    (flash_attention.py in_specs), so past ~8 MiB of K+V the Mosaic compile
    fails where the XLA path would have worked. Sequences beyond the bound
    belong to ring attention (parallel/ring_attention.py), whose local
    blocks are short again."""
    kv_bytes = 2 * k.shape[1] * k.shape[-1] * k.dtype.itemsize
    return (
        bias is None
        and q.shape[1] == k.shape[1]
        and q.shape[-1] % 128 == 0
        and q.shape[1] >= 256
        and kv_bytes <= 8 * 1024 * 1024
    )


# The cross kernel is opt-in: standalone it beats XLA ~1.9x (351us vs
# 653us at 1280q x 128kv x 16h on v5e), but inside the full 48-layer DiT
# graph routing it REGRESSES the step ~5% (58.3 -> 61.4ms) — XLA fuses the
# small-KV attention with the surrounding projections, while the pallas
# call forces a layout boundary. Measured 2026-08; revisit on new toolchains.
_USE_CROSS_KERNEL: bool = os.environ.get("MLX_VIDEO_TPU_CROSS_KERNEL", "") == "1"


def use_cross_kernel(enable: bool = True) -> None:
    global _USE_CROSS_KERNEL
    _USE_CROSS_KERNEL = enable


def _cross_eligible(q: jax.Array, k: jax.Array, bias) -> bool:
    """Short-KV cross-attention shapes for the whole-KV-in-VMEM kernel:
    caption KV small enough to keep resident, per-key-only bias (the
    (B,1,1,Skv) caption padding mask), lane-aligned head dim."""
    return (
        _USE_CROSS_KERNEL
        and q.shape[1] != k.shape[1]
        and k.shape[1] <= 1024
        and q.shape[-1] % 128 == 0
        and q.shape[1] >= 256
        and (
            bias is None
            or (bias.ndim == 4 and bias.shape[1] == 1 and bias.shape[2] == 1)
        )
    )


def sdpa(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    scale: Optional[float] = None,
) -> jax.Array:
    """Attention over (B, S, H, D) tensors, additive float bias like the reference.

    Returns (B, Sq, H, D) in the input dtype.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    use_flash = _USE_PALLAS_FLASH
    if use_flash is None:
        use_flash = _tpu_backend()
    if use_flash and _flash_eligible(q, k, bias):
        from mlx_video_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, scale=scale)
    # The cross kernel is its own explicit opt-in (_USE_CROSS_KERNEL inside
    # _cross_eligible): it must stay reachable when the flash master switch
    # is off (e.g. MLX_VIDEO_TPU_FLASH=0 MLX_VIDEO_TPU_CROSS_KERNEL=1).
    if _cross_eligible(q, k, bias):
        from mlx_video_tpu.ops.flash_attention import flash_cross_attention

        bias_rows = None
        if bias is not None:
            bias_rows = bias.reshape(bias.shape[0], bias.shape[-1])
        return flash_cross_attention(q, k, v, bias=bias_rows, scale=scale)
    return jax.nn.dot_product_attention(q, k, v, bias=bias, scale=scale)


def sdpa_flat(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    heads: int,
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """Attention over flattened (B, S, H*D) tensors (reference layout).

    Mirrors the reference helper's reshape contract
    (reference: attention.py:13-53) on top of :func:`sdpa`.
    """
    b, sq, dim = q.shape
    skv = k.shape[1]
    d_head = dim // heads
    qh = q.reshape(b, sq, heads, d_head)
    kh = k.reshape(b, skv, heads, d_head)
    vh = v.reshape(b, skv, heads, d_head)
    out = sdpa(qh, kh, vh, bias=bias)
    return out.reshape(b, sq, dim)


# Fused RoPE+attention is opt-in: measured on v5e at DiT geometry
# (B1 S5184 H32 D128 bf16) the in-kernel rope is ~1.5x SLOWER than
# materializing rope with XLA and calling the plain flash kernel (9.3ms vs
# 6.0ms) — each query block re-ropes the full K stream (grid_q-times
# redundant vector work) and the lane-dim concat relayouts outweigh the
# saved HBM round-trip. Kept for shapes/backends where fusion wins.
_USE_FUSED_ROPE: bool = os.environ.get("MLX_VIDEO_TPU_FUSED_ROPE", "") == "1"


def use_fused_rope(enable: bool = True) -> None:
    global _USE_FUSED_ROPE
    _USE_FUSED_ROPE = enable


def fused_split_rope_eligible(q: jax.Array, heads: int, pe) -> bool:
    """Whether the fused RoPE + flash kernel can take this self-attention:
    opted in, flash enabled, SPLIT-layout pe tables (B, H, S, D/2),
    lane-aligned head dim, enough tokens to tile."""
    if not _USE_FUSED_ROPE:
        return False
    use_flash = _USE_PALLAS_FLASH
    if use_flash is None:
        use_flash = _tpu_backend()
    if not use_flash or pe is None:
        return False
    d_head = q.shape[-1] // heads
    return (
        pe[0].ndim == 4
        and pe[0].shape[1] == heads
        and d_head % 128 == 0
        and q.shape[1] >= 256
        and pe[0].shape[0] == q.shape[0]
        and pe[0].shape[2] == q.shape[1]
    )


def sdpa_flat_fused_rope(
    q: jax.Array, k: jax.Array, v: jax.Array, heads: int, pe
) -> jax.Array:
    """Self-attention over flattened (B, S, H*D) with split-RoPE applied
    inside the Pallas flash kernel (skips q/k RoPE materialization)."""
    from mlx_video_tpu.ops.flash_attention import flash_attention_split_rope

    b, s, dim = q.shape
    d_head = dim // heads
    qh = q.reshape(b, s, heads, d_head)
    kh = k.reshape(b, s, heads, d_head)
    vh = v.reshape(b, s, heads, d_head)
    out = flash_attention_split_rope(qh, kh, vh, pe[0], pe[1], scale=d_head**-0.5)
    return out.reshape(b, s, dim)
