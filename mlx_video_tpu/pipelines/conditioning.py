"""Latent-space conditioning for I2V / keyframe / video conditioning.

Behavioral spec: reference mlx_video/conditioning/latent.py:13-229.

- ``VideoConditionByLatentIndex`` (replace mode): overwrite latent frames
  with the clean conditioning latent, set denoise mask to ``1 - strength``.
- ``VideoConditionByKeyframeIndex`` (guide mode): keep the noisy latent,
  set the clean reference + mask only.
- ``LatentState`` carries (latent, clean_latent, per-frame denoise_mask);
  the per-step blend is ``denoised*mask + clean*(1-mask)``.

JAX-native: conditioning placement uses static frame indices with ``.at[]``
scatter updates (no per-frame Python concat loops), so the result is a
single fused XLA op and ``apply_denoise_mask`` stays jittable.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp


@dataclass
class VideoConditionByLatentIndex:
    """Replace-mode conditioning (reference: conditioning/latent.py:13-31)."""

    latent: jax.Array  # (B, C, f, H, W)
    frame_idx: int = 0
    strength: float = 1.0

    def get_num_latent_frames(self) -> int:
        return self.latent.shape[2]


@dataclass
class VideoConditionByKeyframeIndex:
    """Guide-mode conditioning (reference: conditioning/latent.py:34-51)."""

    keyframes: jax.Array  # (B, C, f, H, W)
    frame_idx: int = 0
    strength: float = 1.0

    def get_num_latent_frames(self) -> int:
        return self.keyframes.shape[2]


VideoCondition = Union[VideoConditionByLatentIndex, VideoConditionByKeyframeIndex]


class LatentState(NamedTuple):
    """(latent, clean_latent, per-frame denoise mask)
    (reference: conditioning/latent.py:54-74)."""

    latent: jax.Array  # (B, C, F, H, W)
    clean_latent: jax.Array  # (B, C, F, H, W)
    denoise_mask: jax.Array  # (B, 1, F, 1, 1); 1.0 = denoise, 0.0 = keep clean


def create_initial_state(
    shape: Tuple[int, ...],
    key: Optional[jax.Array] = None,
    noise_scale: float = 1.0,
    dtype=jnp.float32,
) -> LatentState:
    """Random initial state (reference: conditioning/latent.py:77-101).

    RNG semantics differ from the reference by design: JAX keys are explicit
    (MLX uses a global seed), so parity is defined on the math, not the
    stream — matching the reference's own PT-parity stance (SURVEY §7).
    """
    noise = jnp.zeros(shape, dtype=dtype) if key is None else jax.random.normal(key, shape, dtype=dtype)
    return LatentState(
        latent=noise * noise_scale,
        clean_latent=jnp.zeros(shape, dtype=dtype),
        denoise_mask=jnp.ones((shape[0], 1, shape[2], 1, 1), dtype=dtype),
    )


def apply_conditioning(state: LatentState, conditionings: List[VideoCondition]) -> LatentState:
    """Place conditioning latents/masks at their frame indices
    (reference: conditioning/latent.py:104-177)."""
    latent, clean, mask = state.latent, state.clean_latent, state.denoise_mask
    b, c, f, h, w = latent.shape

    for cond in conditionings:
        if isinstance(cond, VideoConditionByKeyframeIndex):
            cond_latent, mode = cond.keyframes, "guide"
        else:
            cond_latent, mode = cond.latent, "replace"
        frame_idx, strength = cond.frame_idx, cond.strength

        _, cc, cf, ch, cw = cond_latent.shape
        if (cc, ch, cw) != (c, h, w):
            raise ValueError(
                f"Conditioning latent shape ({cc}, {ch}, {cw}) does not match target ({c}, {h}, {w})"
            )
        if frame_idx >= f:
            raise ValueError(f"Frame index {frame_idx} is out of bounds for latent with {f} frames")

        end = min(frame_idx + cf, f)
        n = end - frame_idx
        cond_slice = cond_latent[:, :, :n].astype(latent.dtype)

        if mode == "replace":
            latent = latent.at[:, :, frame_idx:end].set(cond_slice)
        clean = clean.at[:, :, frame_idx:end].set(cond_slice)
        mask = mask.at[:, :, frame_idx:end].set(
            jnp.full((b, 1, n, 1, 1), 1.0 - strength, dtype=mask.dtype)
        )

    return LatentState(latent=latent, clean_latent=clean, denoise_mask=mask)


def apply_denoise_mask(denoised: jax.Array, clean: jax.Array, denoise_mask: jax.Array) -> jax.Array:
    """denoised*mask + clean*(1-mask) (reference: conditioning/latent.py:180-196)."""
    mask = denoise_mask.astype(denoised.dtype)
    return denoised * mask + clean.astype(denoised.dtype) * (1.0 - mask)


def add_noise_with_state(state: LatentState, key: jax.Array, noise_scale: float) -> LatentState:
    """Mask-scaled renoising: latent = noise*s*mask + latent*(1 - s*mask)
    (reference: conditioning/latent.py:199-229)."""
    noise = jax.random.normal(key, state.latent.shape, dtype=jnp.float32).astype(state.latent.dtype)
    effective = noise_scale * state.denoise_mask.astype(state.latent.dtype)
    latent = noise * effective + state.latent * (1.0 - effective)
    return state._replace(latent=latent)
