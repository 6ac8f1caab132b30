"""Shim onto the TPU trainer (reference: ltx_trainer/captioning.py)."""

from mlx_video_tpu.trainer.aux import caption_image, caption_video  # noqa: F401
