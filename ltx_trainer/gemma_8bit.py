"""Quantized Gemma text-encoder support (parity import path; reference:
ltx_trainer/gemma_8bit.py -> mlx_video/mlx_trainer/gemma_8bit.py).

The TPU text encoder loads MLX-format quantized Gemma checkpoints natively
(mlx_video_tpu/io/text_encoder_weights.py); this module exposes that path
under the reference's name."""

from mlx_video_tpu.models.ltx.text_encoder import LTX2TextEncoder  # noqa: F401


def load_gemma_8bit(model_path, **kwargs):
    """Load the text encoder from an 8-bit (quantized) checkpoint."""
    return LTX2TextEncoder.load(model_path, model_path, **kwargs)
