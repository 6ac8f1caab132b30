"""Transformer re-exports (reference: ltx_core/model/transformer/__init__.py).

The engine implementation is functional (init/apply pairs over param pytrees,
mlx_video_tpu/models/ltx/model.py); these names map the reference's class
surface onto it.
"""

from mlx_video_tpu.config import LTXModelConfig, LTXRopeType, TransformerConfig
from mlx_video_tpu.models.ltx import rope
from mlx_video_tpu.models.ltx.model import (
    Modality,
    attention_apply,
    block_apply,
    feed_forward_apply,
    init_ltx_params,
    ltx_apply,
    text_projection_apply,
    to_denoised,
)

# Compatibility constants for the legacy loader API
# (reference: ltx_core/model/transformer/__init__.py:7-10).
LTXV_MODEL_COMFY_RENAMING_MAP: dict = {}
LTXV_MODEL_COMFY_RENAMING_WITH_TRANSFORMER_LINEAR_DOWNCAST_MAP: dict = {}
UPCAST_DURING_INFERENCE: set = set()


class LTXModelConfigurator:
    """Builds an ``LTXModelConfig`` (reference: transformer/__init__.py:13-18)."""

    def __init__(self, *_, **__):
        pass

    def build(self) -> LTXModelConfig:
        return LTXModelConfig()


class LTXVideoOnlyModelConfigurator(LTXModelConfigurator):
    pass


class UpcastWithStochasticRounding:
    """Compatibility marker (reference: transformer/__init__.py:25-26)."""


__all__ = [
    "LTXV_MODEL_COMFY_RENAMING_MAP",
    "LTXV_MODEL_COMFY_RENAMING_WITH_TRANSFORMER_LINEAR_DOWNCAST_MAP",
    "UPCAST_DURING_INFERENCE",
    "LTXModelConfig",
    "LTXModelConfigurator",
    "LTXRopeType",
    "LTXVideoOnlyModelConfigurator",
    "Modality",
    "TransformerConfig",
    "UpcastWithStochasticRounding",
    "attention_apply",
    "block_apply",
    "feed_forward_apply",
    "init_ltx_params",
    "ltx_apply",
    "rope",
    "text_projection_apply",
    "to_denoised",
]
