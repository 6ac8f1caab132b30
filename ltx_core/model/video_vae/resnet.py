"""Resnet re-export (reference: ltx_core/model/video_vae/resnet.py)."""

from mlx_video_tpu.models.ltx.video_vae.blocks import (
    init_resnet_block,
    pixel_norm,
    resnet_block,
)

__all__ = ["init_resnet_block", "pixel_norm", "resnet_block"]
