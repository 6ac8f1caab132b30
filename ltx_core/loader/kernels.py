"""Custom-kernel registry compat (reference: ltx_core/loader/kernels.py, a
stub — custom kernels were CUDA-only in the PyTorch original; the engine's
TPU Pallas kernels live in mlx_video_tpu/ops/)."""

__all__ = []
