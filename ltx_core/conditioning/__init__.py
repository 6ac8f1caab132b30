"""Conditioning items (parity API; reference: ltx_core/conditioning/*)."""

from mlx_video_tpu.pipelines.conditioning import (
    LatentState as PipelineLatentState,
    VideoConditionByKeyframeIndex,
    VideoConditionByLatentIndex,
    apply_conditioning,
    apply_denoise_mask,
    create_initial_state,
)


class ConditioningError(ValueError):
    """(reference: ltx_core/conditioning/exceptions.py)."""
