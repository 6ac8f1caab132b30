"""Safetensors state-dict loader (parity API; reference:
ltx_core/loader/sft_loader.py — a raise/no-op stub there; functional here)."""

from __future__ import annotations

from pathlib import Path


class SafetensorsModelStateDictLoader:
    """Loads raw tensors from a safetensors file as a flat state dict."""

    def __init__(self, path):
        self.path = Path(path)

    def load(self) -> dict:
        from mlx_video_tpu.io.safetensors import SafetensorsReader

        out = {}
        with SafetensorsReader(self.path) as r:
            for name in r.keys():
                out[name] = r.get(name)
        return out


__all__ = ["SafetensorsModelStateDictLoader"]
