"""(parity import path; reference: ltx_core/conditioning/types/keyframe_cond.py).

Extends the engine's guide-mode conditioning dataclass with the
reference's token-domain ``apply_to``: keyframe latents are patchified and
appended with PIXEL-space positions (causal fix only at frame 0, time
shifted by ``frame_idx``, divided by fps) and a ``1 - strength`` mask
(reference: keyframe_cond.py:20-42).
"""

from __future__ import annotations

import jax.numpy as jnp

from mlx_video_tpu.pipelines.conditioning import (
    VideoConditionByKeyframeIndex as _EngineKeyframeCond,
)


class VideoConditionByKeyframeIndex(_EngineKeyframeCond):
    def apply_to(self, latent_state, latent_tools):
        from ltx_core.components.patchifiers import get_pixel_coords
        from ltx_core.types import LatentState, VideoLatentShape

        tokens = latent_tools.patchifier.patchify(self.keyframes)
        coords = latent_tools.patchifier.get_patch_grid_bounds(
            VideoLatentShape.from_shape(self.keyframes.shape)
        )
        positions = get_pixel_coords(
            coords,
            latent_tools.scale_factors,
            causal_fix=latent_tools.causal_fix if self.frame_idx == 0 else False,
        ).astype(jnp.float32)
        positions = positions.at[:, 0].add(float(self.frame_idx))
        positions = positions.at[:, 0].divide(float(latent_tools.fps))
        mask = jnp.full(tokens.shape[:2] + (1,), 1.0 - self.strength, dtype=self.keyframes.dtype)
        return LatentState(
            latent=jnp.concatenate([latent_state.latent, tokens], axis=1),
            denoise_mask=jnp.concatenate([latent_state.denoise_mask.astype(mask.dtype), mask], axis=1),
            positions=jnp.concatenate([latent_state.positions, positions], axis=2),
            clean_latent=jnp.concatenate([latent_state.clean_latent, tokens], axis=1),
        )


__all__ = ["VideoConditionByKeyframeIndex"]
