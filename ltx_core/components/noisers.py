"""Gaussian noiser (parity API; reference: ltx_core/components/noisers.py).

JAX-native: the RNG key is explicit (derived from ``seed``) instead of a
global seed.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp


@dataclass
class GaussianNoiser:
    seed: Optional[int] = None
    _counter: int = 0

    def noise(self, latents: jax.Array) -> jax.Array:
        key = jax.random.key(self.seed if self.seed is not None else 0)
        key = jax.random.fold_in(key, self._counter)
        self._counter += 1
        return jax.random.normal(key, latents.shape, dtype=jnp.float32).astype(latents.dtype)
