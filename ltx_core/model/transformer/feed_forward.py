"""Feed-forward re-export (reference: ltx_core/model/transformer/feed_forward.py)."""

from mlx_video_tpu.models.ltx.model import feed_forward_apply, init_feed_forward

__all__ = ["feed_forward_apply", "init_feed_forward"]
