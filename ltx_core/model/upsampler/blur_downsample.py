"""Blur-downsample re-export (reference: ltx_core/model/upsampler/blur_downsample.py)."""

from mlx_video_tpu.models.ltx.upsampler import blur_down

__all__ = ["blur_down"]
