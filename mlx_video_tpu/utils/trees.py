"""Pytree ownership helpers for donation safety.

Derived parameter trees (quantized / LoRA-injected / resharded views of a
base tree) may alias device buffers of the tree they were derived from.
JAX buffer donation (``donate_argnums``) deletes the donated buffers after
the call — if a donated leaf is aliased into another live tree, that tree's
leaf dies too and the next read raises ``RuntimeError: Array has been
deleted``. The reference framework never hits this because MLX arrays are
refcounted and never explicitly donated (its trainer leaves the loaded
model untouched, mlx_video/mlx_trainer/trainer.py:234-295 — the contract
to preserve is "the caller still owns its model").

The rule in this codebase:

- Constructors that derive a tree from the **dense base**
  (:func:`mlx_video_tpu.ops.quant.quantize_dit_params`,
  :func:`mlx_video_tpu.ops.int8.quantize_params_w8a8`) return a tree that
  OWNS every leaf — the big weights are replaced by freshly-computed
  quantized leaves, and the small passthrough leaves (biases, norm scales,
  adaLN tables, non-quantized projections) are copied here. Copy cost is
  a few hundred MB at 19B, against the multi-GB alias hazard.
- Constructors whose input is itself a derived temporary
  (:func:`mlx_video_tpu.ops.quant.prepare_w4a8`,
  :func:`mlx_video_tpu.lora.inject_lora`) share storage with their input
  by design (copying the packed q4 stacks would transiently double the
  full model — the OOM that motivated sharing). Their docstrings state the
  contract; callers that keep the input tree alive across a donating step
  must copy via :func:`own_derived_leaves` or
  ``shard_params(..., force_copy=True)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def shared_leaf_count(derived, base) -> int:
    """Number of leaves of ``derived`` that are the same Python object (and
    therefore the same device buffer) as a leaf of ``base``."""
    base_ids = {id(l) for l in jax.tree.leaves(base)}
    return sum(1 for l in jax.tree.leaves(derived) if id(l) in base_ids)


def own_derived_leaves(derived, base):
    """Return ``derived`` with every leaf that aliases a buffer of ``base``
    replaced by a fresh device copy (sharding preserved).

    After this, donating/deleting either tree cannot invalidate the other.
    Only ``jax.Array`` leaves are copied — host (numpy) leaves cannot be
    deleted by donation. Leaves unique to ``derived`` are passed through
    untouched, so the big freshly-created quantized stacks are never
    duplicated.
    """
    base_ids = {id(l) for l in jax.tree.leaves(base)}

    def maybe_copy(leaf):
        if id(leaf) in base_ids and isinstance(leaf, jax.Array):
            return jnp.copy(leaf)
        return leaf

    return jax.tree.map(maybe_copy, derived)
