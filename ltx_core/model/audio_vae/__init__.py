"""Audio VAE + vocoder re-exports (reference: ltx_core/model/audio_vae/__init__.py)."""

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

# Minimal compat constants (reference: audio_vae/__init__.py:5-8).
AUDIO_VAE_ENCODER_COMFY_KEYS_FILTER: dict = {}
AUDIO_VAE_DECODER_COMFY_KEYS_FILTER: dict = {}
VOCODER_COMFY_KEYS_FILTER: dict = {}


class AudioEncoderConfigurator:
    def __init__(self, *_, **__):
        pass


class AudioDecoderConfigurator:
    def __init__(self, *_, **__):
        pass


class VocoderConfigurator:
    def __init__(self, *_, **__):
        pass


__all__ = [
    "AUDIO_VAE_DECODER_COMFY_KEYS_FILTER",
    "AUDIO_VAE_ENCODER_COMFY_KEYS_FILTER",
    "AudioDecoderConfigurator",
    "AudioEncoderConfigurator",
    "AudioProcessor",
    "AudioVAEConfig",
    "VOCODER_COMFY_KEYS_FILTER",
    "VocoderConfig",
    "VocoderConfigurator",
    "audio_decoder_apply",
    "audio_encoder_apply",
    "decode_audio",
    "init_audio_decoder",
    "init_audio_encoder",
    "init_vocoder",
    "vocoder_apply",
]
