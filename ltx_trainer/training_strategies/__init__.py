"""Shim onto the TPU trainer strategies (reference:
ltx_trainer/training_strategies/__init__.py)."""

from mlx_video_tpu.trainer.strategies import (  # noqa: F401
    ModelInputs,
    StrategyBatch,
    compute_loss,
    make_inputs,
    prepare_text_to_video,
    prepare_video_to_video,
)
