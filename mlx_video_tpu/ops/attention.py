"""Scaled dot-product attention for TPU.

Replaces ``mx.fast.scaled_dot_product_attention``
(reference: mlx_video/models/ltx/attention.py:13-53). The default path is
``jax.nn.dot_product_attention`` which XLA lowers to a fused flash-style
kernel on TPU; a Pallas flash-attention kernel is available behind the same
interface for the long-sequence/self-attention hot path
(see mlx_video_tpu/ops/flash_attention.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

# Toggled by tests / benchmarks; the Pallas kernel registers itself here.
_USE_PALLAS_FLASH = False


def use_pallas_flash(enable: bool = True) -> None:
    global _USE_PALLAS_FLASH
    _USE_PALLAS_FLASH = enable


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
    if _USE_PALLAS_FLASH and bias is None and q.shape[1] == k.shape[1]:
        from mlx_video_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, scale=scale)
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
