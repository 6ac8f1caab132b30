"""Up/down-sampling re-export (reference: ltx_core/model/video_vae/sampling.py)."""

from mlx_video_tpu.models.ltx.video_vae.blocks import (
    depth_to_space_upsample,
    init_depth_to_space_upsample,
    init_space_to_depth_downsample,
    space_to_depth_downsample,
)

__all__ = [
    "depth_to_space_upsample",
    "init_depth_to_space_upsample",
    "init_space_to_depth_downsample",
    "space_to_depth_downsample",
]
