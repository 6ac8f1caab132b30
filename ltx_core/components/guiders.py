"""Guidance combiners: CFG, CFG*, STG, APG (parity API, JAX-native).

Behavioral spec: reference ltx_core/components/guiders.py:23-108. All deltas
are pure jnp (jit-safe); only LegacyStatefulAPGGuider keeps Python-side
momentum state (it is stateful by definition and must run outside jit or
with its running average threaded manually).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp


def _l2_norm(x: jax.Array, axis=None, keepdims: bool = False) -> jax.Array:
    return jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims) + 1e-8)


def projection_coef(to_project: jax.Array, project_onto: jax.Array) -> jax.Array:
    b = to_project.shape[0]
    p = to_project.reshape(b, -1)
    q = project_onto.reshape(b, -1)
    dot = jnp.sum(p * q, axis=1, keepdims=True)
    sq = jnp.sum(q * q, axis=1, keepdims=True) + 1e-8
    return dot / sq


@dataclass(frozen=True)
class CFGGuider:
    scale: float

    def delta(self, cond: jax.Array, uncond: jax.Array) -> jax.Array:
        return (self.scale - 1) * (cond - uncond)

    def enabled(self) -> bool:
        return self.scale != 1.0


@dataclass(frozen=True)
class CFGStarRescalingGuider:
    scale: float

    def delta(self, cond: jax.Array, uncond: jax.Array) -> jax.Array:
        rescaled_neg = projection_coef(cond, uncond).reshape(
            (-1,) + (1,) * (uncond.ndim - 1)
        ) * uncond
        return (self.scale - 1) * (cond - rescaled_neg)

    def enabled(self) -> bool:
        return self.scale != 1.0


@dataclass(frozen=True)
class STGGuider:
    scale: float

    def delta(self, pos_denoised: jax.Array, perturbed_denoised: jax.Array) -> jax.Array:
        return self.scale * (pos_denoised - perturbed_denoised)

    def enabled(self) -> bool:
        return self.scale != 0.0


def _apg_delta(guidance, cond, eta, norm_threshold, scale_mult):
    if norm_threshold > 0:
        gn = _l2_norm(guidance, axis=(-1, -2, -3), keepdims=True)
        guidance = guidance * jnp.minimum(1.0, norm_threshold / gn)
    coef = projection_coef(guidance, cond).reshape((-1,) + (1,) * (cond.ndim - 1))
    g_parallel = coef * cond
    g_orth = guidance - g_parallel
    return (g_parallel * eta + g_orth) * scale_mult


@dataclass(frozen=True)
class LtxAPGGuider:
    scale: float
    eta: float = 1.0
    norm_threshold: float = 0.0

    def delta(self, cond: jax.Array, uncond: jax.Array) -> jax.Array:
        return _apg_delta(cond - uncond, cond, self.eta, self.norm_threshold, self.scale - 1)

    def enabled(self) -> bool:
        return self.scale != 1.0


@dataclass
class LegacyStatefulAPGGuider:
    scale: float
    eta: float
    norm_threshold: float = 5.0
    momentum: float = 0.0
    running_avg: Optional[jax.Array] = None

    def delta(self, cond: jax.Array, uncond: jax.Array) -> jax.Array:
        guidance = cond - uncond
        if self.momentum != 0:
            if self.running_avg is None:
                self.running_avg = guidance
            else:
                self.running_avg = self.momentum * self.running_avg + guidance
            guidance = self.running_avg
        return _apg_delta(guidance, cond, self.eta, self.norm_threshold, self.scale)

    def enabled(self) -> bool:
        return self.scale != 0.0
