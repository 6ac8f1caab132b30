"""Shim onto the TPU trainer (reference: ltx_trainer/validation_sampler.py)."""

from mlx_video_tpu.trainer.validation_sampler import ValidationSampler  # noqa: F401
