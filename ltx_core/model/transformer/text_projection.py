"""Caption-projection re-export (reference: ltx_core/model/transformer/text_projection.py)."""

from mlx_video_tpu.models.ltx.model import init_text_projection, text_projection_apply

__all__ = ["init_text_projection", "text_projection_apply"]
