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


class VideoEncoder:
    """Class-style adapter over the functional encoder (reference exposes a
    ``VideoEncoder`` nn.Module; the engine is init/apply)."""

    def __init__(self, config=None, params: dict = None, *, key=None, dtype=None):
        import jax
        import jax.numpy as jnp

        from mlx_video_tpu.config import VideoVAEConfig

        self.config = config or VideoVAEConfig()
        if params is None:
            params = init_video_encoder(
                key if key is not None else jax.random.key(0),
                self.config,
                dtype=dtype or jnp.float32,
            )
        self.params = params

    def __call__(self, video):
        return video_encoder_apply(self.params, self.config, video)


class VideoDecoder:
    """Class-style adapter over the dedicated LTX-2 decoder."""

    def __init__(self, config=None, params: dict = None, *, key=None, dtype=None):
        import jax
        import jax.numpy as jnp

        from mlx_video_tpu.models.ltx.video_vae.decoder import DecoderConfig

        self.config = config or DecoderConfig()
        if params is None:
            params = init_video_decoder(
                key if key is not None else jax.random.key(0),
                self.config,
                dtype=dtype or jnp.float32,
            )
        self.params = params

    def __call__(self, latents, **kw):
        return video_decoder_apply(self.params, self.config, latents, **kw)

    def decode_tiled(self, latents, tiling_config=None, on_frames_ready=None, **kw):
        return decode_with_tiling(
            lambda lat, **dkw: video_decoder_apply(self.params, self.config, lat, **dkw, **kw),
            latents,
            tiling_config or TilingConfig.default(),
            on_frames_ready=on_frames_ready,
        )


__all__ = [
    "DecoderConfig",
    "SpatialTilingConfig",
    "TemporalTilingConfig",
    "TilingConfig",
    "VAE_DECODER_COMFY_KEYS_FILTER",
    "VAE_ENCODER_COMFY_KEYS_FILTER",
    "VideoDecoder",
    "VideoDecoderConfigurator",
    "VideoEncoder",
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
