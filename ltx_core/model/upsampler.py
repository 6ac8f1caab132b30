"""Upsampler re-exports (reference: ltx_core/model/upsampler/*)."""

from mlx_video_tpu.models.ltx.upsampler import (
    init_latent_upsampler,
    latent_upsampler_apply,
    pixel_shuffle_2d,
    upsample_latents,
)
