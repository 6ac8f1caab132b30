"""Audio attention block re-export (reference: ltx_core/model/audio_vae/attention.py)."""

from mlx_video_tpu.models.ltx.audio_vae.audio_vae import attn_block, init_attn_block

__all__ = ["attn_block", "init_attn_block"]
