"""Video VAE re-exports (reference: ltx_core/model/video_vae/__init__.py)."""

from mlx_video_tpu.models.ltx.video_vae import ops
from mlx_video_tpu.models.ltx.video_vae.blocks import (
    depth_to_space_upsample,
    pixel_norm,
    resnet_block,
    space_to_depth_downsample,
)
from mlx_video_tpu.models.ltx.video_vae.conv import causal_conv3d
from mlx_video_tpu.models.ltx.video_vae.decoder import (
    DecoderConfig,
    init_video_decoder,
    video_decoder_apply,
)
from mlx_video_tpu.models.ltx.video_vae.encoder import (
    init_video_encoder,
    video_encoder_apply,
)
from mlx_video_tpu.models.ltx.video_vae.tiling import (
    SpatialTilingConfig,
    TemporalTilingConfig,
    TilingConfig,
    decode_with_tiling,
)

# Minimal compat constants (reference: video_vae/__init__.py:12-14).
VAE_ENCODER_COMFY_KEYS_FILTER: dict = {}
VAE_DECODER_COMFY_KEYS_FILTER: dict = {}


class VideoEncoderConfigurator:
    def __init__(self, *_, **__):
        pass


class VideoDecoderConfigurator:
    def __init__(self, *_, **__):
        pass


__all__ = [
    "DecoderConfig",
    "SpatialTilingConfig",
    "TemporalTilingConfig",
    "TilingConfig",
    "VAE_DECODER_COMFY_KEYS_FILTER",
    "VAE_ENCODER_COMFY_KEYS_FILTER",
    "VideoDecoderConfigurator",
    "VideoEncoderConfigurator",
    "causal_conv3d",
    "decode_with_tiling",
    "depth_to_space_upsample",
    "init_video_decoder",
    "init_video_encoder",
    "ops",
    "pixel_norm",
    "resnet_block",
    "space_to_depth_downsample",
    "video_decoder_apply",
    "video_encoder_apply",
]
