"""Transformer re-exports (reference: ltx_core/model/transformer/model.py:1-5)."""

from mlx_video_tpu.config import LTXModelConfig, LTXRopeType, TransformerConfig
from mlx_video_tpu.models.ltx import rope
from mlx_video_tpu.models.ltx.model import (
    Modality,
    attention_apply,
    block_apply,
    feed_forward_apply,
    init_ltx_params,
    ltx_apply,
    text_projection_apply,
    to_denoised,
)
