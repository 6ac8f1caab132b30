"""VAE configurators (reference: ltx_core/model/video_vae/model_configurator.py).

Builds engine VAE param trees from an LTX-2 config dict (the ``vae`` section
of the checkpoint metadata)."""

from ltx_core.model.video_vae import VideoDecoderConfigurator, VideoEncoderConfigurator
from ltx_core.model.video_vae.enums import (
    LogVarianceType,
    NormLayerType,
    PaddingModeType,
)

__all__ = [
    "LogVarianceType",
    "NormLayerType",
    "PaddingModeType",
    "VideoDecoderConfigurator",
    "VideoEncoderConfigurator",
]
