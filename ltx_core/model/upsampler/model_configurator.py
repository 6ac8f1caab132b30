"""Upsampler configurator (reference: ltx_core/model/upsampler/model_configurator.py)."""

from ltx_core.model.upsampler import LatentUpsamplerConfigurator

__all__ = ["LatentUpsamplerConfigurator"]
