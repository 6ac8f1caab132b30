"""Causal conv2d re-export (reference: ltx_core/model/audio_vae/causal_conv_2d.py)."""

from mlx_video_tpu.models.ltx.audio_vae.audio_vae import causal_conv2d, init_conv2d

__all__ = ["causal_conv2d", "init_conv2d"]
