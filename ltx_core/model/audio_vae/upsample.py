"""Upsample re-export (reference: ltx_core/model/audio_vae/upsample.py)."""

from mlx_video_tpu.models.ltx.audio_vae.audio_vae import init_upsample, upsample

build_upsampling_path = upsample  # reference-name alias

__all__ = ["build_upsampling_path", "init_upsample", "upsample"]
