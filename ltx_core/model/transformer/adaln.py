"""adaLN re-export (reference: ltx_core/model/transformer/adaln.py, a
compatibility stub; the engine adaLN lives in mlx_video_tpu/models/ltx/model.py)."""

from mlx_video_tpu.models.ltx.model import adaln_apply, init_adaln, timestep_embedding

__all__ = ["adaln_apply", "init_adaln", "timestep_embedding"]
