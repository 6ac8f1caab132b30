"""Audio normalization re-export (reference: ltx_core/model/audio_vae/normalization.py)."""

from ltx_core.model.common.normalization import PixelNorm, build_normalization_layer

__all__ = ["PixelNorm", "build_normalization_layer"]
