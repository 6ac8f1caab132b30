"""Shim onto the TPU trainer (reference: ltx_trainer/quantization.py)."""

from mlx_video_tpu.trainer.aux import read_quantization_metadata  # noqa: F401
