"""Normalization primitives with fp32 accumulation islands.

The reference leans on ``mx.fast.rms_norm`` (reference: mlx_video/utils.py:398-400)
for all pre-norms. On TPU, XLA fuses the rsqrt/mean/multiply chain into the
surrounding elementwise work, so a plain jnp implementation with fp32
accumulation is the right default; a Pallas fused variant can be slotted in
behind the same API if profiling ever shows it winning.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: Optional[jax.Array] = None, eps: float = 1e-6) -> jax.Array:
    """RMS norm over the last dim; fp32 accumulation, output in input dtype."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(var + eps)
    if weight is not None:
        out = out * weight.astype(jnp.float32)
    return out.astype(dtype)


def layer_norm(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Affine-free LayerNorm (the DiT output norm, reference: ltx.py:300)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(dtype)


def pixel_norm(x: jax.Array, axis: int = 1, eps: float = 1e-6) -> jax.Array:
    """Per-pixel channel RMS norm used by the VAE (reference: utils.py:477-483)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    ms = jnp.mean(xf * xf, axis=axis, keepdims=True)
    return (xf * jax.lax.rsqrt(ms + eps)).astype(dtype)
