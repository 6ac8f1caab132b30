"""Shim onto the TPU trainer (reference: ltx_trainer/config_display.py)."""

from mlx_video_tpu.trainer.aux import print_config  # noqa: F401
