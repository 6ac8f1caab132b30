"""3D fractional-position rotary embeddings for LTX-2, TPU-native.

Behavioral spec comes from the reference implementation
(reference: mlx_video/models/ltx/rope.py:10-529):

- Positions are *pixel-space* (t, h, w) interval bounds of shape
  ``(B, n_dims, S, 2)``; with ``use_middle_indices_grid`` the midpoint of each
  [start, end) interval is used.
- Fractional positions ``pos / max_pos`` are scaled to [-1, 1] and multiplied
  by log-spaced frequencies ``theta ** linspace(0, 1, dim // (2*n_dims)) * pi/2``
  (reference: rope.py:175-211).
- INTERLEAVED: frequencies are repeat-interleaved (each frequency twice) and
  padded at the *front* with (cos=1, sin=0) to ``dim`` (rope.py:332-361);
  rotation pairs adjacent feature dims over the full flattened hidden
  dimension (rope.py:33-75).
- SPLIT: frequencies padded at the front to ``dim // 2`` then reshaped to
  per-head ``(B, H, S, D/2)`` (rope.py:293-329); rotation mixes the two
  halves of each head's feature dim (rope.py:109-172).

All frequency/rotation math is float32 regardless of model dtype. The
reference's "double precision" flag is also fp32 on-device (rope.py:419-444),
so on TPU both paths coincide; we keep the flag for API parity.
"""

from __future__ import annotations

import math
import warnings
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from mlx_video_tpu.config import LTXRopeType

FreqsCis = Tuple[jax.Array, jax.Array]


def generate_freq_grid(theta: float, n_pos_dims: int, dim: int) -> jax.Array:
    """Log-spaced frequency indices, scaled by pi/2 (reference: rope.py:175-211)."""
    n_elem = 2 * n_pos_dims
    num_indices = max(dim // n_elem, 1)
    lin_space = jnp.linspace(0.0, 1.0, num_indices, dtype=jnp.float32)
    return jnp.power(jnp.float32(theta), lin_space) * jnp.float32(math.pi / 2)


def _resolve_middle(indices_grid: jax.Array, use_middle_indices_grid: bool) -> jax.Array:
    """Collapse (B, n_dims, S, 2) interval bounds to (B, n_dims, S) positions."""
    if use_middle_indices_grid:
        if indices_grid.ndim != 4 or indices_grid.shape[-1] != 2:
            raise ValueError(
                f"middle-indices grid requires shape (B, n_dims, S, 2), got {indices_grid.shape}"
            )
        return (indices_grid[..., 0] + indices_grid[..., 1]) * 0.5
    if indices_grid.ndim == 4:
        return indices_grid[..., 0]
    return indices_grid


def generate_freqs(
    indices: jax.Array,
    indices_grid: jax.Array,
    max_pos: Sequence[int],
    use_middle_indices_grid: bool,
) -> jax.Array:
    """Per-token frequency arguments, shape (B, S, num_indices * n_dims).

    Reference: rope.py:241-290. The (pos_dim, freq_index) outer product is
    flattened with the *frequency* index as the slower-varying axis so that
    for each frequency the t/h/w components are adjacent.
    """
    if indices_grid.dtype == jnp.bfloat16:
        warnings.warn(
            "Position grid has dtype bfloat16, which causes precision loss in RoPE. "
            "Use float32 for position grids to avoid quality degradation.",
            UserWarning,
            stacklevel=2,
        )
    grid = _resolve_middle(indices_grid.astype(jnp.float32), use_middle_indices_grid)
    n_pos_dims = grid.shape[1]
    if n_pos_dims != len(max_pos):
        raise ValueError(
            f"Number of position dims ({n_pos_dims}) must match max_pos length ({len(max_pos)})"
        )
    max_pos_arr = jnp.asarray(max_pos, dtype=jnp.float32).reshape(1, n_pos_dims, 1)
    # (B, n_dims, S) -> (B, S, n_dims), scaled to [-1, 1]
    fractional = jnp.moveaxis(grid / max_pos_arr, 1, -1)
    scaled = fractional * 2.0 - 1.0
    # (B, S, n_dims, 1) * (num_indices,) -> (B, S, n_dims, num_indices)
    freqs = scaled[..., None] * indices.astype(jnp.float32)
    # -> (B, S, num_indices, n_dims) -> flatten
    freqs = jnp.swapaxes(freqs, -1, -2)
    return freqs.reshape(freqs.shape[0], freqs.shape[1], -1)


def interleaved_freqs_cis(freqs: jax.Array, pad_size: int) -> FreqsCis:
    """(cos, sin) of shape (B, S, dim) for interleaved RoPE (rope.py:332-361)."""
    cos_freq = jnp.cos(freqs)
    sin_freq = jnp.sin(freqs)
    cos_freq = jnp.repeat(cos_freq, 2, axis=-1)
    sin_freq = jnp.repeat(sin_freq, 2, axis=-1)
    if pad_size != 0:
        pad_shape = (*cos_freq.shape[:-1], pad_size)
        cos_freq = jnp.concatenate([jnp.ones(pad_shape, cos_freq.dtype), cos_freq], axis=-1)
        sin_freq = jnp.concatenate([jnp.zeros(pad_shape, sin_freq.dtype), sin_freq], axis=-1)
    return cos_freq, sin_freq


def split_freqs_cis(freqs: jax.Array, pad_size: int, num_attention_heads: int) -> FreqsCis:
    """(cos, sin) of shape (B, H, S, D/2) for split RoPE (rope.py:293-329)."""
    cos_freq = jnp.cos(freqs)
    sin_freq = jnp.sin(freqs)
    if pad_size != 0:
        pad_shape = (*cos_freq.shape[:-1], pad_size)
        cos_freq = jnp.concatenate([jnp.ones(pad_shape, cos_freq.dtype), cos_freq], axis=-1)
        sin_freq = jnp.concatenate([jnp.zeros(pad_shape, sin_freq.dtype), sin_freq], axis=-1)
    b, s = cos_freq.shape[0], cos_freq.shape[1]
    cos_freq = cos_freq.reshape(b, s, num_attention_heads, -1).swapaxes(1, 2)
    sin_freq = sin_freq.reshape(b, s, num_attention_heads, -1).swapaxes(1, 2)
    return cos_freq, sin_freq


def precompute_freqs_cis(
    indices_grid: jax.Array,
    dim: int,
    theta: float = 10000.0,
    max_pos: Optional[Sequence[int]] = None,
    use_middle_indices_grid: bool = False,
    num_attention_heads: int = 32,
    rope_type: LTXRopeType = LTXRopeType.INTERLEAVED,
    double_precision: bool = False,
) -> FreqsCis:
    """Precompute RoPE (cos, sin) tables (reference: rope.py:364-416).

    ``double_precision`` is accepted for parity; both paths are float32 on TPU
    (the reference's "double precision" path is fp32 too, rope.py:419-444).
    """
    del double_precision  # fp32 everywhere; see module docstring
    if max_pos is None:
        max_pos = [20, 2048, 2048]
    n_pos_dims = indices_grid.shape[1]
    indices = generate_freq_grid(theta, n_pos_dims, dim)
    freqs = generate_freqs(indices, indices_grid, max_pos, use_middle_indices_grid)

    if rope_type == LTXRopeType.SPLIT:
        pad_size = dim // 2 - freqs.shape[-1]
        return split_freqs_cis(freqs, pad_size, num_attention_heads)
    if rope_type == LTXRopeType.INTERLEAVED:
        n_elem = 2 * n_pos_dims
        return interleaved_freqs_cis(freqs, dim % n_elem)
    raise ValueError(f"Unsupported rope type: {rope_type}")


def _rotate_half_interleaved(x: jax.Array) -> jax.Array:
    """[x0, x1, x2, x3] -> [-x1, x0, -x3, x2] (reference: rope.py:78-89)."""
    shape = x.shape
    x_pairs = x.reshape(*shape[:-1], shape[-1] // 2, 2)
    rotated = jnp.stack([-x_pairs[..., 1], x_pairs[..., 0]], axis=-1)
    return rotated.reshape(shape)


def apply_interleaved_rotary_emb(x: jax.Array, cos_freqs: jax.Array, sin_freqs: jax.Array) -> jax.Array:
    """Adjacent-pair rotation over the flattened hidden dim (rope.py:33-75)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    out = xf * cos_freqs.astype(jnp.float32) + _rotate_half_interleaved(xf) * sin_freqs.astype(jnp.float32)
    return out.astype(dtype)


def apply_split_rotary_emb(x: jax.Array, cos_freqs: jax.Array, sin_freqs: jax.Array) -> jax.Array:
    """Half-dim rotation with per-head frequencies (rope.py:109-172).

    Accepts either per-head layout ``(B, H, S, D)`` or flattened ``(B, S, H*D)``
    (the flattened form is reshaped around the rotation like the reference).
    """
    dtype = x.dtype
    needs_reshape = False
    if x.ndim != 4 and cos_freqs.ndim == 4:
        b, h, s, _ = cos_freqs.shape
        x = x.reshape(b, s, h, -1).swapaxes(1, 2)
        needs_reshape = True

    xf = x.astype(jnp.float32)
    cos = cos_freqs.astype(jnp.float32)
    sin = sin_freqs.astype(jnp.float32)

    d = xf.shape[-1]
    halves = xf.reshape(*xf.shape[:-1], 2, d // 2)
    first, second = halves[..., 0, :], halves[..., 1, :]
    out_first = first * cos - sin * second
    out_second = second * cos + sin * first
    out = jnp.stack([out_first, out_second], axis=-2).reshape(xf.shape)

    if needs_reshape:
        b, h, s, d = out.shape
        out = out.swapaxes(1, 2).reshape(b, s, h * d)
    return out.astype(dtype)


def apply_rotary_emb(
    x: jax.Array,
    freqs_cis: FreqsCis,
    rope_type: LTXRopeType = LTXRopeType.INTERLEAVED,
) -> jax.Array:
    if rope_type == LTXRopeType.INTERLEAVED:
        return apply_interleaved_rotary_emb(x, freqs_cis[0], freqs_cis[1])
    if rope_type == LTXRopeType.SPLIT:
        return apply_split_rotary_emb(x, freqs_cis[0], freqs_cis[1])
    raise ValueError(f"Unsupported rope type: {rope_type}")
