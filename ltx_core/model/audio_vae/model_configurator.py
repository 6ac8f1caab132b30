"""Audio configurators (reference: ltx_core/model/audio_vae/model_configurator.py)."""

from ltx_core.model.audio_vae import (
    AudioDecoderConfigurator,
    AudioEncoderConfigurator,
    VocoderConfigurator,
)

__all__ = [
    "AudioDecoderConfigurator",
    "AudioEncoderConfigurator",
    "VocoderConfigurator",
]
