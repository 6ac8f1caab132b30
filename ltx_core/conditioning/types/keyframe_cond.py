"""(parity import path; reference: ltx_core/conditioning/types/keyframe_cond.py)."""

from mlx_video_tpu.pipelines.conditioning import VideoConditionByKeyframeIndex

__all__ = ["VideoConditionByKeyframeIndex"]
