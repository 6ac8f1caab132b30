"""Component protocols (parity API; reference: ltx_core/components/protocols.py)."""

from __future__ import annotations

from typing import Protocol

import jax


class Patchifier(Protocol):
    def patchify(self, latents: jax.Array) -> jax.Array: ...

    def unpatchify(self, latents: jax.Array, output_shape) -> jax.Array: ...

    def get_patch_grid_bounds(self, output_shape) -> jax.Array: ...

    def get_token_count(self, tgt_shape) -> int: ...


class Noiser(Protocol):
    def noise(self, latents: jax.Array) -> jax.Array: ...


class GuiderProtocol(Protocol):
    def delta(self, cond: jax.Array, uncond: jax.Array) -> jax.Array: ...

    def enabled(self) -> bool: ...


class SchedulerProtocol(Protocol):
    def execute(self, steps: int, **kwargs) -> jax.Array: ...


class DiffusionStepProtocol(Protocol):
    def execute(
        self, sample: jax.Array, denoised_sample: jax.Array, sigmas: jax.Array, step_index: int
    ) -> jax.Array: ...
