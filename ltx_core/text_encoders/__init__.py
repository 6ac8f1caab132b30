"""Text encoder re-exports (reference: ltx_core/text_encoders/*)."""

from mlx_video_tpu.models.gemma3 import Gemma3TextConfig, gemma3_hidden_states
from mlx_video_tpu.models.ltx.text_encoder import (
    LTX2TextEncoder,
    encode_tokens,
    norm_and_concat_hidden_states,
)
