"""SingleGPUModelBuilder submodule (parity import path; reference:
ltx_core/loader/single_gpu_model_builder.py). The class itself lives in
``ltx_core.loader`` — this module re-exports it."""

from ltx_core.loader import SingleGPUModelBuilder

__all__ = ["SingleGPUModelBuilder"]
