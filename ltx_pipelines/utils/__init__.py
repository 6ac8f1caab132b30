"""Pipeline utilities (reference: ltx_pipelines/utils/__init__.py)."""

from ltx_pipelines.utils.model_ledger import ModelLedger

__all__ = ["ModelLedger"]
