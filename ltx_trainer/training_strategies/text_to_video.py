"""(parity import path; reference:
ltx_trainer/training_strategies/text_to_video.py)."""

from mlx_video_tpu.trainer.strategies import (  # noqa: F401
    ModelInputs,
    compute_loss,
    prepare_text_to_video,
)
