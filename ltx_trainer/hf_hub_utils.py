"""Shim onto the TPU trainer (reference: ltx_trainer/hf_hub_utils.py)."""

from mlx_video_tpu.trainer.aux import push_to_hub  # noqa: F401
