"""Attention re-export (reference: ltx_core/model/transformer/attention.py)."""

from mlx_video_tpu.models.ltx.model import attention_apply, init_attention
from mlx_video_tpu.ops.attention import sdpa as scaled_dot_product_attention

__all__ = ["attention_apply", "init_attention", "scaled_dot_product_attention"]
