"""Upsampler re-exports (reference: ltx_core/model/upsampler/__init__.py)."""

from mlx_video_tpu.models.ltx.upsampler import (
    init_latent_upsampler,
    latent_upsampler_apply,
    pixel_shuffle_2d,
    upsample_latents,
)


class LatentUpsamplerConfigurator:
    """Compat configurator (reference: upsampler/__init__.py:6-8)."""

    def __init__(self, *_, **__):
        pass


__all__ = [
    "LatentUpsamplerConfigurator",
    "init_latent_upsampler",
    "latent_upsampler_apply",
    "pixel_shuffle_2d",
    "upsample_latents",
]
