"""(parity import path; reference:
ltx_trainer/training_strategies/base_strategy.py)."""

from mlx_video_tpu.trainer.strategies import (  # noqa: F401
    ModelInputs,
    StrategyBatch,
    compute_loss,
    make_inputs,
)
