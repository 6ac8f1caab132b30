"""Shim onto the TPU trainer (reference: ltx_trainer/progress.py)."""

from mlx_video_tpu.trainer.aux import ProgressStats, TrainingProgress  # noqa: F401
