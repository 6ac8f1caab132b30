"""AV transformer block re-export (reference: ltx_core/model/transformer/transformer.py)."""

from mlx_video_tpu.models.ltx.model import Modality, block_apply, init_block

__all__ = ["Modality", "block_apply", "init_block"]
