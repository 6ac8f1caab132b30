"""Velocity/denoised conversions (parity API, JAX-native).

Behavioral spec: reference ltx_core/utils.py (fp32 compute, dtype restore).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mlx_video_tpu.ops.norms import rms_norm  # noqa: F401  (re-export)


def _sigma_f32(sigma, like: jax.Array) -> jax.Array:
    s = jnp.asarray(sigma, dtype=jnp.float32)
    while s.ndim < like.ndim:
        s = s[..., None]
    return s


def to_denoised(sample: jax.Array, velocity: jax.Array, sigma) -> jax.Array:
    """x0 = x_t - sigma * v (fp32 island)."""
    out = sample.astype(jnp.float32) - _sigma_f32(sigma, sample) * velocity.astype(jnp.float32)
    return out.astype(sample.dtype)


def to_velocity(sample: jax.Array, denoised_sample: jax.Array, sigma) -> jax.Array:
    """v = (x_t - x0) / sigma (fp32 island)."""
    out = (sample.astype(jnp.float32) - denoised_sample.astype(jnp.float32)) / _sigma_f32(
        sigma, sample
    )
    return out.astype(sample.dtype)
