"""Shim onto the TPU trainer (reference: ltx_trainer/video_utils.py)."""

from mlx_video_tpu.trainer.aux import read_video, save_video  # noqa: F401
