"""Shim onto the TPU trainer (reference: ltx_trainer/config.py)."""

from mlx_video_tpu.trainer.config import TrainingConfig, load_training_config  # noqa: F401
