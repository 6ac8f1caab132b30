"""Rational-resampler re-export (reference:
ltx_core/model/upsampler/spatial_rational_resampler.py)."""

from mlx_video_tpu.models.ltx.upsampler import spatial_rational_resample

__all__ = ["spatial_rational_resample"]
