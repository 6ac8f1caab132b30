"""Shim onto the TPU trainer (reference: ltx_trainer/trainer.py)."""

from mlx_video_tpu.trainer.trainer import Trainer, build_model_config  # noqa: F401
