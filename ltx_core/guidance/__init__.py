"""Guidance perturbations (parity API; reference: ltx_core/guidance/__init__.py)."""

from ltx_core.guidance.perturbations import (
    BatchedPerturbationConfig,
    Perturbation,
    PerturbationConfig,
    PerturbationType,
)

__all__ = [
    "BatchedPerturbationConfig",
    "Perturbation",
    "PerturbationConfig",
    "PerturbationType",
]
