"""Shim onto the TPU trainer (reference: ltx_trainer/timestep_samplers.py)."""

from mlx_video_tpu.trainer.strategies import sample_sigmas  # noqa: F401
