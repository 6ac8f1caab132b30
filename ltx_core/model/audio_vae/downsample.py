"""Downsample re-export (reference: ltx_core/model/audio_vae/downsample.py)."""

from mlx_video_tpu.models.ltx.audio_vae.audio_vae import downsample, init_downsample

build_downsampling_path = downsample  # reference-name alias

__all__ = ["build_downsampling_path", "downsample", "init_downsample"]
