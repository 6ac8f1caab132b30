"""Device mesh construction for multi-chip execution.

The reference is single-device by design (reference:
ltx_trainer/docs/mlx_limitations.md:7-10, README.md:254-256); this layer is
a new capability per SURVEY §2.12: a GSPMD mesh over ICI/DCN with axes
``(data, fsdp, tensor)``. Collectives are inserted by XLA from sharding
annotations — there is no hand-written communication.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

AXES = ("data", "fsdp", "tensor")


def factor_devices(n: int) -> Tuple[int, int, int]:
    """Factor n devices into (data, fsdp, tensor).

    Heuristic: give tensor parallelism the largest power-of-two factor up to
    8 (attention heads / FFN columns split cleanly and TP collectives are the
    most latency-sensitive, so they should ride the innermost ICI axis), then
    fsdp, then data.
    """
    tensor = 1
    while tensor * 2 <= min(n, 8) and n % (tensor * 2) == 0:
        tensor *= 2
    rest = n // tensor
    fsdp = 1
    while fsdp * 2 <= rest and rest % (fsdp * 2) == 0:
        fsdp *= 2
    data = rest // fsdp
    return (data, fsdp, tensor)


def create_mesh(
    shape: Optional[Tuple[int, int, int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a (data, fsdp, tensor) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = factor_devices(n)
    if int(np.prod(shape)) != n:
        raise ValueError(f"Mesh shape {shape} does not cover {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, AXES)


def single_device_mesh() -> Mesh:
    return create_mesh((1, 1, 1), devices=jax.devices()[:1])
