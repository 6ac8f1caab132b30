"""(parity import path; reference: ltx_core/conditioning/types/latent_cond.py)."""

from mlx_video_tpu.pipelines.conditioning import VideoConditionByLatentIndex

__all__ = ["VideoConditionByLatentIndex"]
