"""Shim onto the TPU trainer (reference: ltx_trainer/training_strategies.py)."""

from mlx_video_tpu.trainer.strategies import ModelInputs, StrategyBatch, compute_loss, make_inputs, prepare_text_to_video, prepare_video_to_video  # noqa: F401
