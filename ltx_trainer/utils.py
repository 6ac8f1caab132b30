"""Shim onto the TPU trainer (reference: ltx_trainer/utils.py)."""

from mlx_video_tpu.trainer.aux import set_seed  # noqa: F401
