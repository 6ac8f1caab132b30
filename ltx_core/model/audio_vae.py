"""Audio VAE + vocoder re-exports (reference: ltx_core/model/audio_vae/*)."""

from mlx_video_tpu.models.ltx.audio_vae.audio_vae import (
    AudioVAEConfig,
    audio_decoder_apply,
    audio_encoder_apply,
    init_audio_decoder,
    init_audio_encoder,
)
from mlx_video_tpu.models.ltx.audio_vae.processing import AudioProcessor
from mlx_video_tpu.models.ltx.audio_vae.vocoder import (
    VocoderConfig,
    decode_audio,
    init_vocoder,
    vocoder_apply,
)
