"""(parity import path; reference: ltx_core/conditioning/types/latent_cond.py).

The class extends the engine's replace-mode conditioning dataclass
(mlx_video_tpu.pipelines.conditioning) with the reference's token-domain
``apply_to`` protocol: the conditioning latent is patchified and APPENDED
to the state's token sequence with its own positions (time coordinate
shifted by ``frame_idx`` and divided by fps) and a ``1 - strength``
denoise mask — ``LatentTools.clear_conditioning`` trims the appended
tokens after the loop (reference: latent_cond.py:18-36). Engine pipelines
(isinstance checks in mlx_video_tpu.pipelines.conditioning.apply_conditioning)
see the subclass transparently.
"""

from __future__ import annotations

import jax.numpy as jnp

from mlx_video_tpu.pipelines.conditioning import (
    VideoConditionByLatentIndex as _EngineLatentCond,
)


class VideoConditionByLatentIndex(_EngineLatentCond):
    def apply_to(self, latent_state, latent_tools):
        from ltx_core.types import LatentState, VideoLatentShape

        tokens = latent_tools.patchifier.patchify(self.latent)
        coords = latent_tools.patchifier.get_patch_grid_bounds(
            VideoLatentShape.from_shape(self.latent.shape)
        )
        # Reference uses the RAW latent grid as positions here (pixel-coord
        # conversion is the keyframe variant's behavior): latent_cond.py:20-26.
        positions = coords.astype(jnp.float32)
        positions = positions.at[:, 0].add(float(self.frame_idx))
        positions = positions.at[:, 0].divide(float(latent_tools.fps))
        mask = jnp.full(tokens.shape[:2] + (1,), 1.0 - self.strength, dtype=self.latent.dtype)
        return LatentState(
            latent=jnp.concatenate([latent_state.latent, tokens], axis=1),
            denoise_mask=jnp.concatenate([latent_state.denoise_mask.astype(mask.dtype), mask], axis=1),
            positions=jnp.concatenate([latent_state.positions, positions], axis=2),
            clean_latent=jnp.concatenate([latent_state.clean_latent, tokens], axis=1),
        )


__all__ = ["VideoConditionByLatentIndex"]
