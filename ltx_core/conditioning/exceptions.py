"""Conditioning exceptions (parity import path; reference:
ltx_core/conditioning/exceptions.py)."""

from ltx_core.conditioning import ConditioningError

__all__ = ["ConditioningError"]
