"""Per-component model loaders for trainer/tooling parity.

Behavioral spec: reference mlx_video/mlx_trainer/model_loader.py:28-238
(load_transformer / load_video_vae_encoder / load_video_vae_decoder /
load_audio_vae_decoder / load_vocoder / load_text_encoder /
MLXModelComponents / load_model). Each returns (params, config) pytree
pairs — the functional equivalents of the reference's module objects.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mlx_video_tpu.config import LTXModelConfig, LTXModelType, LTXRopeType, VideoVAEConfig


def _resolve(path) -> Path:
    return Path(path).expanduser().resolve()


def default_19b_config(model_type: LTXModelType = LTXModelType.VideoOnly) -> LTXModelConfig:
    """The 19B training config (reference: model_loader.py:31-46)."""
    return LTXModelConfig(
        model_type=model_type,
        num_attention_heads=32,
        attention_head_dim=128,
        in_channels=128,
        out_channels=128,
        num_layers=48,
        cross_attention_dim=4096,
        caption_channels=3840,
        rope_type=LTXRopeType.SPLIT,
        double_precision_rope=True,
    )


def load_transformer(
    checkpoint_path, config: Optional[LTXModelConfig] = None, dtype=jnp.bfloat16
) -> Tuple[dict, LTXModelConfig]:
    """Transformer params from a safetensors checkpoint
    (reference: model_loader.py:28-60)."""
    from mlx_video_tpu.io.weights import load_dit_params

    if config is None:
        config = default_19b_config()
    params = load_dit_params(_resolve(checkpoint_path), config, dtype=dtype)
    return params, config


def load_video_vae_encoder(checkpoint_path, config=None, dtype=jnp.bfloat16):
    """(reference: model_loader.py:63-74)."""
    from mlx_video_tpu.io.vae_weights import load_video_encoder_weights
    from mlx_video_tpu.models.ltx.video_vae.encoder import init_video_encoder

    cfg = config or VideoVAEConfig()
    params = init_video_encoder(jax.random.key(0), cfg, dtype=dtype)
    load_video_encoder_weights(_resolve(checkpoint_path), params, dtype=dtype)
    return params, cfg


def load_video_vae_decoder(checkpoint_path, config=None, dtype=jnp.bfloat16):
    """(reference: model_loader.py:77-88)."""
    from mlx_video_tpu.io.vae_weights import load_video_decoder_weights
    from mlx_video_tpu.models.ltx.video_vae.decoder import DecoderConfig, init_video_decoder

    cfg = config or DecoderConfig()
    params = init_video_decoder(jax.random.key(0), cfg, dtype=dtype)
    load_video_decoder_weights(_resolve(checkpoint_path), params, dtype=dtype)
    return params, cfg


def load_audio_vae_decoder(checkpoint_path, config=None, dtype=jnp.bfloat16):
    """(reference: model_loader.py:91-156)."""
    from mlx_video_tpu.io.vae_weights import load_audio_vae_weights
    from mlx_video_tpu.models.ltx.audio_vae.audio_vae import (
        AudioVAEConfig,
        init_audio_decoder,
    )

    cfg = config or AudioVAEConfig()
    params = init_audio_decoder(jax.random.key(0), cfg, dtype=dtype)
    load_audio_vae_weights(_resolve(checkpoint_path), None, params, dtype=dtype)
    return params, cfg


def load_vocoder(checkpoint_path, config=None, dtype=jnp.bfloat16):
    """(reference: model_loader.py:159-196)."""
    from mlx_video_tpu.io.vae_weights import load_vocoder_weights
    from mlx_video_tpu.models.ltx.audio_vae.vocoder import VocoderConfig, init_vocoder

    cfg = config or VocoderConfig()
    params = init_vocoder(jax.random.key(0), cfg, dtype=dtype)
    load_vocoder_weights(_resolve(checkpoint_path), params, dtype=dtype)
    return params, cfg


def load_text_encoder(checkpoint_path, text_encoder_path, dtype=jnp.bfloat16):
    """(reference: model_loader.py:199-207)."""
    from mlx_video_tpu.models.ltx.text_encoder import LTX2TextEncoder

    return LTX2TextEncoder.load(_resolve(checkpoint_path), _resolve(text_encoder_path), dtype=dtype)


@dataclass
class ModelComponents:
    """Aggregate of loaded components (reference: model_loader.py:210-216
    MLXModelComponents)."""

    transformer_params: Optional[dict] = None
    transformer_config: Optional[LTXModelConfig] = None
    vae_encoder: Optional[tuple] = None
    vae_decoder: Optional[tuple] = None
    audio_decoder: Optional[tuple] = None
    vocoder: Optional[tuple] = None
    text_encoder: Optional[object] = None


# Reference-name alias.
MLXModelComponents = ModelComponents


def load_model(
    model_path,
    config: Optional[LTXModelConfig] = None,
    kind: str = "dev",
    with_vae: bool = True,
    with_audio: bool = False,
    with_text_encoder: bool = False,
    text_encoder_path=None,
    dtype=jnp.bfloat16,
) -> ModelComponents:
    """Load everything the trainer needs from one repo/path
    (reference: model_loader.py:219-238)."""
    from mlx_video_tpu.loading import resolve_transformer_file, resolve_vae_file

    model_path = _resolve(model_path)
    out = ModelComponents()
    tf_file = resolve_transformer_file(model_path, kind)
    out.transformer_params, out.transformer_config = load_transformer(tf_file, config, dtype)
    if with_vae:
        vae_file = resolve_vae_file(model_path)
        out.vae_encoder = load_video_vae_encoder(vae_file, dtype=dtype)
        out.vae_decoder = load_video_vae_decoder(vae_file, dtype=dtype)
    if with_audio:
        candidates = [model_path / "audio_vae.safetensors", model_path / "model.safetensors"]
        for c in candidates:
            if c.exists():
                out.audio_decoder = load_audio_vae_decoder(c, dtype=dtype)
                break
        voc = model_path / "vocoder.safetensors"
        if voc.exists():
            out.vocoder = load_vocoder(voc, dtype=dtype)
    if with_text_encoder:
        out.text_encoder = load_text_encoder(
            model_path, text_encoder_path or model_path, dtype
        )
    return out


# Reference-name aliases (mlx_video/mlx_trainer/model_loader.py surface).
load_vae_encoder = load_video_vae_encoder
load_vae_decoder = load_video_vae_decoder
load_audio_decoder = load_audio_vae_decoder
load_gemma = load_text_encoder
