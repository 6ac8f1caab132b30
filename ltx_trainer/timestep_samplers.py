"""Timestep samplers (reference: ltx_trainer/timestep_samplers.py ->
mlx_video/mlx_trainer/timestep_samplers.py:10-55).

The engine path is the functional, key-explicit ``sample_sigmas``
(mlx_video_tpu/trainer/strategies.py). These class wrappers present the
reference's stateful ``sample_for(latents, seq_len)`` API on top of it,
advancing an internal PRNG key per call.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional

import jax

from mlx_video_tpu.trainer.strategies import sample_sigmas  # noqa: F401


@dataclass
class TimestepSampler:
    """Base class for sampling sigmas/timesteps.

    The PRNG key is created lazily on first use (no JAX backend init at
    import time) and advances per call. Prefer ``get_timestep_sampler`` over
    the shared ``SAMPLERS`` instances when reproducibility matters — shared
    instances share one PRNG stream across callers.
    """

    seed: int = 0

    def _next_key(self):
        key = getattr(self, "_key", None)
        if key is None:
            key = jax.random.key(self.seed)
        key, sub = jax.random.split(key)
        self._key = key
        return sub

    def sample_for(self, latents, seq_len: Optional[int] = None):
        raise NotImplementedError


@dataclass
class UniformSampler(TimestepSampler):
    def sample_for(self, latents, seq_len: Optional[int] = None):
        b = latents.shape[0]
        return sample_sigmas(self._next_key(), b, seq_len or latents.shape[1], "uniform").reshape(
            b, 1, 1
        )


@dataclass
class ShiftedLogitNormalSampler(TimestepSampler):
    std: float = 1.0

    def sample_for(self, latents, seq_len: Optional[int] = None):
        b = latents.shape[0]
        return sample_sigmas(
            self._next_key(), b, seq_len or latents.shape[1], "shifted_logit_normal", self.std
        ).reshape(b, 1, 1)


SAMPLERS: Dict[str, TimestepSampler] = {
    "uniform": UniformSampler(),
    "shifted_logit_normal": ShiftedLogitNormalSampler(),
}


def get_timestep_sampler(mode: str, std: float = 1.0) -> TimestepSampler:
    if mode == "shifted_logit_normal":
        return ShiftedLogitNormalSampler(std=std)
    return UniformSampler()
