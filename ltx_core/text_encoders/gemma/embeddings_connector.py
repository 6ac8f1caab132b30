"""Embeddings connector parity import path (reference:
ltx_core/text_encoders/gemma/embeddings_connector.py). Functional connector
(2-layer transformer + 128 learnable registers) lives in
mlx_video_tpu.models.ltx.text_encoder."""

from mlx_video_tpu.models.ltx.text_encoder import (
    connector_apply as Embeddings1DConnector,
    connector_apply,
    connector_block_apply,
    init_connector,
)

__all__ = [
    "Embeddings1DConnector",
    "connector_apply",
    "connector_block_apply",
    "init_connector",
]
