"""Causal-conv re-export (reference: ltx_core/model/video_vae/convolution.py)."""

from mlx_video_tpu.models.ltx.video_vae.conv import (
    causal_conv3d,
    conv2d,
    init_conv2d,
    init_conv3d,
    spatial_pad,
    temporal_causal_pad,
)

__all__ = [
    "causal_conv3d",
    "conv2d",
    "init_conv2d",
    "init_conv3d",
    "spatial_pad",
    "temporal_causal_pad",
]
