"""Upsampler res-block re-export (reference: ltx_core/model/upsampler/res_block.py)."""

from mlx_video_tpu.models.ltx.upsampler import init_res_block_3d, res_block_3d

__all__ = ["init_res_block_3d", "res_block_3d"]
