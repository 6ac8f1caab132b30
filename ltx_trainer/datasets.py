"""Shim onto the TPU trainer (reference: ltx_trainer/datasets.py)."""

from mlx_video_tpu.trainer.datasets import Batch, DummyDataset, PrecomputedDataset, collate_batches, iter_batches  # noqa: F401
