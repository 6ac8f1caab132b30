"""Decoder re-export (reference: ltx_core/model/video_vae/decoder.py)."""

from mlx_video_tpu.models.ltx.video_vae.decoder import (
    DecoderConfig,
    init_time_embedder,
    init_video_decoder,
    time_embedder_apply,
    video_decoder_apply,
    video_decoder_apply_chunked,
)

__all__ = [
    "DecoderConfig",
    "init_time_embedder",
    "init_video_decoder",
    "time_embedder_apply",
    "video_decoder_apply",
    "video_decoder_apply_chunked",
]
