"""Trainer parity package: re-exports onto the TPU trainer
(reference: ltx_trainer/* one-line shims onto mlx_video.mlx_trainer)."""

from mlx_video_tpu.trainer.config import TrainingConfig, load_training_config
from mlx_video_tpu.trainer.datasets import (
    Batch,
    DummyDataset,
    PrecomputedDataset,
    collate_batches,
    iter_batches,
)
from mlx_video_tpu.trainer.trainer import Trainer
