"""Euler diffusion step (parity API; reference: ltx_core/components/diffusion_steps.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ltx_core.utils import to_velocity


class EulerDiffusionStep:
    def execute(
        self, sample: jax.Array, denoised_sample: jax.Array, sigmas, step_index: int
    ) -> jax.Array:
        velocity = to_velocity(sample, denoised_sample, sigmas[step_index])
        dt = jnp.asarray(sigmas[step_index + 1] - sigmas[step_index], dtype=jnp.float32)
        out = sample.astype(jnp.float32) + velocity.astype(jnp.float32) * dt
        return out.astype(sample.dtype)
