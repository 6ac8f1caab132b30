"""LoRA fusing (parity API; reference: ltx_core/loader/fuse_loras.py).

The reference module raises on use (its real merge lives in mlx_video.lora);
here ``fuse_loras`` actually works, delegating to the TPU merge over the
param pytree.
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterable


def fuse_loras(params: dict, loras: Iterable, verbose: bool = False) -> dict:
    """Merge LoRA files into a parameter pytree.

    ``loras``: iterables of (path, strength) pairs or
    :class:`ltx_core.loader.primitives.LoraPathStrengthAndSDOps`.
    """
    from mlx_video_tpu.lora import LoraSpec, merge_lora_into_params

    specs = []
    for item in loras:
        if hasattr(item, "path"):
            specs.append(LoraSpec(Path(item.path), float(getattr(item, "strength", 1.0))))
        else:
            path, strength = item
            specs.append(LoraSpec(Path(path), float(strength)))
    return merge_lora_into_params(params, specs, verbose=verbose)


__all__ = ["fuse_loras"]
