"""Shim onto the TPU trainer (reference: ltx_trainer/model_loader.py)."""

from mlx_video_tpu.io.weights import load_dit_params, load_native_params  # noqa: F401
