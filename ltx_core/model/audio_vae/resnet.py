"""Audio resnet re-export (reference: ltx_core/model/audio_vae/resnet.py)."""

from mlx_video_tpu.models.ltx.audio_vae.audio_vae import init_resnet_block, resnet_block

__all__ = ["init_resnet_block", "resnet_block"]
