"""Latent tools: patchify/unpatchify/conditioning helpers over LatentState.

Behavioral spec: reference ltx_core/tools.py (VideoLatentTools /
AudioLatentTools over the Patchifier protocol).
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Optional, Union

import jax
import jax.numpy as jnp

from ltx_core.components.patchifiers import (
    AudioPatchifier,
    VideoLatentPatchifier,
    get_pixel_coords,
)
from ltx_core.components.protocols import Patchifier  # noqa: F401 (parity export)
from ltx_core.types import (
    AudioLatentShape,
    LatentState,
    SpatioTemporalScaleFactors,
    VideoLatentShape,
)

DEFAULT_SCALE_FACTORS = SpatioTemporalScaleFactors.default()


class _LatentToolsBase:
    patchifier: object
    target_shape: Union[VideoLatentShape, AudioLatentShape]

    def patchify(self, latent_state: LatentState) -> LatentState:
        if tuple(latent_state.latent.shape) != self.target_shape.to_shape():
            raise ValueError(
                f"Latent state has shape {latent_state.latent.shape}, expected "
                f"{self.target_shape.to_shape()}"
            )
        state = latent_state.clone()
        return replace(
            state,
            latent=self.patchifier.patchify(state.latent),
            clean_latent=self.patchifier.patchify(state.clean_latent),
            denoise_mask=self.patchifier.patchify(state.denoise_mask),
        )

    def unpatchify(self, latent_state: LatentState) -> LatentState:
        state = latent_state.clone()
        return replace(
            state,
            latent=self.patchifier.unpatchify(state.latent, output_shape=self.target_shape),
            clean_latent=self.patchifier.unpatchify(state.clean_latent, output_shape=self.target_shape),
            denoise_mask=self.patchifier.unpatchify(
                state.denoise_mask, output_shape=self.target_shape.mask_shape()
            ),
        )

    def clear_conditioning(self, latent_state: LatentState) -> LatentState:
        state = latent_state.clone()
        n = self.patchifier.get_token_count(self.target_shape)
        return LatentState(
            latent=state.latent[:, :n],
            clean_latent=state.clean_latent[:, :n],
            denoise_mask=jnp.ones_like(state.denoise_mask)[:, :n],
            positions=state.positions[:, :, :n] if state.positions is not None else None,
        )


# Reference protocol name for the shared tools interface
# (reference: ltx_core/tools.py:21-30).
LatentTools = _LatentToolsBase


@dataclass
class VideoLatentTools(_LatentToolsBase):
    target_shape: VideoLatentShape
    scale_factors: SpatioTemporalScaleFactors = DEFAULT_SCALE_FACTORS
    patch_size: int = 1
    fps: float = 24.0
    causal_fix: bool = True  # (reference: tools.py:66; keyframe apply_to reads it)

    def __post_init__(self):
        self.patchifier = VideoLatentPatchifier(self.patch_size)

    def create_initial_state(
        self,
        key: Optional[jax.Array] = None,
        dtype=jnp.float32,
        initial_latent: Optional[jax.Array] = None,
    ) -> LatentState:
        shape = self.target_shape.to_shape()
        if initial_latent is not None:
            latent = initial_latent.astype(dtype)
        elif key is not None:
            latent = jax.random.normal(key, shape, dtype=jnp.float32).astype(dtype)
        else:
            latent = jnp.zeros(shape, dtype=dtype)
        coords = self.patchifier.get_patch_grid_bounds(self.target_shape)
        positions = get_pixel_coords(coords, self.scale_factors, causal_fix=True)
        positions = positions.at[:, 0].divide(self.fps)
        return LatentState(
            latent=latent,
            clean_latent=jnp.zeros(shape, dtype=dtype),
            denoise_mask=jnp.ones(self.target_shape.mask_shape().to_shape(), dtype=dtype),
            positions=positions,
        )


@dataclass
class AudioLatentTools(_LatentToolsBase):
    target_shape: AudioLatentShape
    patch_size: int = 1

    def __post_init__(self):
        self.patchifier = AudioPatchifier(self.patch_size)

    def create_initial_state(
        self,
        key: Optional[jax.Array] = None,
        dtype=jnp.float32,
        initial_latent: Optional[jax.Array] = None,
    ) -> LatentState:
        shape = self.target_shape.to_shape()
        if initial_latent is not None:
            latent = initial_latent.astype(dtype)
        elif key is not None:
            latent = jax.random.normal(key, shape, dtype=jnp.float32).astype(dtype)
        else:
            latent = jnp.zeros(shape, dtype=dtype)
        positions = self.patchifier.get_patch_grid_bounds(self.target_shape)
        return LatentState(
            latent=latent,
            clean_latent=jnp.zeros(shape, dtype=dtype),
            denoise_mask=jnp.ones(self.target_shape.mask_shape().to_shape(), dtype=dtype),
            positions=positions,
        )
