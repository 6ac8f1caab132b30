"""Pixel-shuffle re-export (reference: ltx_core/model/upsampler/pixel_shuffle.py)."""

from mlx_video_tpu.models.ltx.upsampler import pixel_shuffle_2d

__all__ = ["pixel_shuffle_2d"]
