"""Conditioning item types (parity import path; reference:
ltx_core/conditioning/types/__init__.py)."""

from mlx_video_tpu.pipelines.conditioning import (
    VideoConditionByKeyframeIndex,
    VideoConditionByLatentIndex,
)

__all__ = ["VideoConditionByKeyframeIndex", "VideoConditionByLatentIndex"]
