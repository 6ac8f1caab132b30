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


class _AudioModule:
    """Base for class-style adapters over the functional audio stack."""

    _init = None
    _apply = None

    def __init__(self, config=None, params: dict = None, *, key=None, dtype=None):
        import jax
        import jax.numpy as jnp

        self.config = config or AudioVAEConfig()
        if params is None:
            params = type(self)._init(
                key if key is not None else jax.random.key(0),
                self.config,
                dtype=dtype or jnp.float32,
            )
        self.params = params

    def __call__(self, x):
        return type(self)._apply(self.params, self.config, x)


class AudioEncoder(_AudioModule):
    """Mel spectrogram -> normalized latents."""

    _init = staticmethod(init_audio_encoder)
    _apply = staticmethod(audio_encoder_apply)


class AudioDecoder(_AudioModule):
    """Latents -> mel spectrogram."""

    _init = staticmethod(init_audio_decoder)
    _apply = staticmethod(audio_decoder_apply)


class Vocoder:
    """HiFi-GAN spectrogram -> waveform."""

    def __init__(self, config=None, params: dict = None, *, key=None, dtype=None):
        import jax
        import jax.numpy as jnp

        self.config = config or VocoderConfig()
        if params is None:
            params = init_vocoder(
                key if key is not None else jax.random.key(0),
                self.config,
                dtype=dtype or jnp.float32,
            )
        self.params = params

    def __call__(self, spectrogram):
        return vocoder_apply(self.params, self.config, spectrogram)


__all__ = [
    "AUDIO_VAE_DECODER_COMFY_KEYS_FILTER",
    "AUDIO_VAE_ENCODER_COMFY_KEYS_FILTER",
    "AudioDecoder",
    "AudioDecoderConfigurator",
    "AudioEncoder",
    "AudioEncoderConfigurator",
    "Vocoder",
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
