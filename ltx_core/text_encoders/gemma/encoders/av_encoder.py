"""(parity import path; reference:
ltx_core/text_encoders/gemma/encoders/av_encoder.py)."""

from ltx_core.text_encoders.gemma import AVGemmaTextEncoderModel

__all__ = ["AVGemmaTextEncoderModel"]
