"""(parity import path; reference:
ltx_trainer/training_strategies/video_to_video.py)."""

from mlx_video_tpu.trainer.strategies import (  # noqa: F401
    ModelInputs,
    compute_loss,
    prepare_video_to_video,
)
