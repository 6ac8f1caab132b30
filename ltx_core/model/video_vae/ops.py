"""VAE ops re-export (reference: ltx_core/model/video_vae/ops.py)."""

from mlx_video_tpu.models.ltx.video_vae.ops import (
    denormalize_latents,
    normalize_latents,
    patchify,
    to_channels_first,
    to_channels_last,
    unpatchify,
)

__all__ = [
    "denormalize_latents",
    "normalize_latents",
    "patchify",
    "to_channels_first",
    "to_channels_last",
    "unpatchify",
]
