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


class LTXModel:
    """Class-style adapter over the functional DiT (reference exposes an
    ``LTXModel`` nn.Module; the engine is ``init_ltx_params``/``ltx_apply``).

    ``LTXModel(config)`` initializes fresh params, or bind existing ones
    with ``LTXModel(config, params)``. Calling returns per-modality
    velocity predictions."""

    def __init__(self, config: LTXModelConfig = None, params: dict = None, *, key=None, dtype=None):
        import jax
        import jax.numpy as jnp

        self.config = config or LTXModelConfig()
        if params is None:
            params = init_ltx_params(
                key if key is not None else jax.random.key(0),
                self.config,
                dtype=dtype or jnp.bfloat16,
            )
        self.params = params

    def __call__(self, video=None, audio=None, **kw):
        return ltx_apply(self.params, self.config, video=video, audio=audio, **kw)


class X0Model:
    """Velocity -> denoised wrapper (reference: ltx.py X0Model;
    x0 = x_t - sigma * v)."""

    def __init__(self, model: LTXModel):
        self.model = model

    def __call__(self, video=None, audio=None, **kw):
        v_vel, a_vel = self.model(video=video, audio=audio, **kw)
        v_x0 = (
            to_denoised(video.latent, v_vel, video.timesteps[..., None])
            if video is not None and v_vel is not None
            else v_vel
        )
        a_x0 = (
            to_denoised(audio.latent, a_vel, audio.timesteps[..., None])
            if audio is not None and a_vel is not None
            else a_vel
        )
        return v_x0, a_x0


__all__ = [
    "LTXV_MODEL_COMFY_RENAMING_MAP",
    "LTXV_MODEL_COMFY_RENAMING_WITH_TRANSFORMER_LINEAR_DOWNCAST_MAP",
    "UPCAST_DURING_INFERENCE",
    "LTXModelConfig",
    "LTXModelConfigurator",
    "LTXRopeType",
    "LTXVideoOnlyModelConfigurator",
    "LTXModel",
    "Modality",
    "TransformerConfig",
    "UpcastWithStochasticRounding",
    "X0Model",
    "attention_apply",
    "block_apply",
    "feed_forward_apply",
    "init_ltx_params",
    "ltx_apply",
    "rope",
    "text_projection_apply",
    "to_denoised",
]
