"""Audio ops re-export (reference: ltx_core/model/audio_vae/ops.py)."""

from mlx_video_tpu.models.ltx.audio_vae.audio_vae import (
    init_per_channel_statistics,
    patchify_audio,
    unpatchify_audio,
)
from mlx_video_tpu.models.ltx.audio_vae.processing import AudioProcessor
from mlx_video_tpu.models.ltx.audio_vae.vocoder import decode_audio

__all__ = [
    "AudioProcessor",
    "decode_audio",
    "init_per_channel_statistics",
    "patchify_audio",
    "unpatchify_audio",
]
