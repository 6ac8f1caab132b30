"""Model re-exports (parity API; reference: ltx_core/model/* re-export shims
onto the engine package)."""

from mlx_video_tpu.config import (
    LTXModelConfig,
    LTXModelType,
    LTXRopeType,
    TransformerConfig,
    VideoVAEConfig,
)
from mlx_video_tpu.models.ltx.model import Modality, init_ltx_params, ltx_apply

# --- Model protocol (reference: ltx_core/model/model_protocol.py) ---------
from typing import Protocol, TypeVar

ModelType = TypeVar("ModelType")


class ModelConfigurator(Protocol[ModelType]):
    """Protocol for loaders that instantiate models from a config dict
    (reference: ltx_core/model/model_protocol.py:6-10)."""

    @classmethod
    def from_config(cls, config: dict) -> ModelType: ...
