"""Training-strategy protocol (parity import path; reference:
ltx_trainer/training_strategies/base_strategy.py ->
mlx_video/mlx_trainer/training_strategies/base_strategy.py:17-55).

The engine path is functional (prepare_* -> make_inputs -> compute_loss,
mlx_video_tpu/trainer/strategies.py); ``TrainingStrategy`` presents the
reference's class protocol on top of it.
"""

from __future__ import annotations

from typing import Any, Optional

import jax

from mlx_video_tpu.trainer.strategies import (  # noqa: F401
    ModelInputs,
    StrategyBatch,
    compute_loss,
    make_inputs,
)


class TrainingStrategy:
    """Protocol: requires_audio / get_data_sources /
    prepare_training_inputs / compute_loss."""

    #: override in subclasses: batch-dict -> StrategyBatch
    _prepare = None
    _sources: Any = {"latents": "latents", "conditions": "conditions"}

    def __init__(self, cfg: Any = None) -> None:
        self.cfg = cfg

    @property
    def requires_audio(self) -> bool:
        return bool(getattr(self.cfg, "with_audio", False))

    def get_data_sources(self):
        return dict(self._sources)

    def prepare_training_inputs(
        self, batch, timestep_sampler=None, key: Optional[jax.Array] = None
    ) -> ModelInputs:
        if type(self)._prepare is None:
            raise NotImplementedError
        sb = type(self)._prepare(batch)
        if key is None:
            seed = getattr(timestep_sampler, "seed", 0) if timestep_sampler is not None else 0
            key = jax.random.key(seed)
        cfg = self.cfg
        return make_inputs(
            sb,
            key,
            first_frame_conditioning_p=getattr(cfg, "first_frame_conditioning_p", 0.1),
            timestep_sampling_mode=getattr(cfg, "timestep_sampling_mode", "uniform"),
            timestep_sampling_std=getattr(cfg, "timestep_sampling_std", 1.0),
        )

    def compute_loss(self, video_pred, audio_pred, inputs: ModelInputs):
        return compute_loss(video_pred, audio_pred, inputs)


__all__ = [
    "ModelInputs",
    "StrategyBatch",
    "TrainingStrategy",
    "compute_loss",
    "make_inputs",
]
