"""(parity import path; reference: ltx_core/text_encoders/gemma/encoders/)."""

from ltx_core.text_encoders.gemma import (
    AVGemmaTextEncoderModel,
    GemmaTextEncoderModelBase,
)

__all__ = ["AVGemmaTextEncoderModel", "GemmaTextEncoderModelBase"]
