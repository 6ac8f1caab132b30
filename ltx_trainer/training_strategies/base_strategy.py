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
        self._key = jax.random.key(int(getattr(cfg, "seed", 0) or 0))

    @property
    def requires_audio(self) -> bool:
        return bool(getattr(self.cfg, "with_audio", False))

    def get_data_sources(self):
        return dict(self._sources)

    def _next_key(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def prepare_training_inputs(
        self, batch, timestep_sampler=None, key: Optional[jax.Array] = None
    ) -> ModelInputs:
        if type(self)._prepare is None:
            raise NotImplementedError
        sb = type(self)._prepare(batch)
        if key is None:
            # Advance the strategy's own PRNG stream per call (a fixed key
            # here would train every step on the same sigma/noise draw).
            key = self._next_key()
        cfg = self.cfg
        # Honor an explicitly passed sampler's distribution; fall back to
        # the config fields (the engine path, trainer/strategies.py).
        mode = getattr(cfg, "timestep_sampling_mode", "uniform")
        std = getattr(cfg, "timestep_sampling_std", 1.0)
        if timestep_sampler is not None:
            name = type(timestep_sampler).__name__
            if "ShiftedLogitNormal" in name:
                mode = "shifted_logit_normal"
                std = getattr(timestep_sampler, "std", std)
            elif "Uniform" in name:
                mode = "uniform"
        return make_inputs(
            sb,
            key,
            first_frame_conditioning_p=getattr(cfg, "first_frame_conditioning_p", 0.1),
            timestep_sampling_mode=mode,
            timestep_sampling_std=std,
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
