"""(parity import path; reference:
ltx_core/text_encoders/gemma/encoders/base_encoder.py)."""

from ltx_core.text_encoders.gemma import GemmaTextEncoderModelBase

__all__ = ["GemmaTextEncoderModelBase"]
