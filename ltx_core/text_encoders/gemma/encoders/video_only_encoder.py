"""(parity import path; reference:
ltx_core/text_encoders/gemma/encoders/video_only_encoder.py)."""

from ltx_core.text_encoders.gemma import GemmaTextEncoderModelBase

VideoOnlyGemmaTextEncoderModel = GemmaTextEncoderModelBase

__all__ = ["VideoOnlyGemmaTextEncoderModel"]
