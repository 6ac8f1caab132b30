"""Tensor-stat debug instrumentation.

Behavioral spec: reference mlx_video/generate.py:107-124 (LTX_DEBUG tensor
stat dumps at pipeline seams). Enabled by ``LTX_DEBUG=1`` or
``MLX_VIDEO_DEBUG=1``; stats are computed on-device and fetched as four
scalars (cheap even through a slow host link).
"""

from __future__ import annotations

import os
import sys
from typing import Optional


def debug_enabled() -> bool:
    return os.environ.get("LTX_DEBUG") == "1" or os.environ.get("MLX_VIDEO_DEBUG") == "1"


def debug_stats(name: str, tensor, file=None) -> None:
    """Print shape/min/max/mean/std for a tensor when debugging is on."""
    if not debug_enabled():
        return
    import jax.numpy as jnp

    t = tensor.astype(jnp.float32)
    print(
        f"[debug] {name}: shape={tuple(tensor.shape)} dtype={tensor.dtype} "
        f"min={float(jnp.min(t)):.4f} max={float(jnp.max(t)):.4f} "
        f"mean={float(jnp.mean(t)):.4f} std={float(jnp.std(t)):.4f}",
        file=file or sys.stderr,
        flush=True,
    )
