"""Conditioning items (parity API; reference: ltx_core/conditioning/*)."""

from mlx_video_tpu.pipelines.conditioning import (
    LatentState as PipelineLatentState,
    apply_conditioning,
    apply_denoise_mask,
    create_initial_state,
)

from ltx_core.conditioning.types import (
    VideoConditionByKeyframeIndex,
    VideoConditionByLatentIndex,
)


class ConditioningError(ValueError):
    """(reference: ltx_core/conditioning/exceptions.py)."""


def __getattr__(name):
    # ConditioningItem lives in ltx_core.conditioning.item (import lazily to
    # avoid a circular import with ltx_core.types at package init).
    if name == "ConditioningItem":
        from ltx_core.conditioning.item import ConditioningItem

        return ConditioningItem
    raise AttributeError(name)
