"""Model building / loading (parity API; reference: ltx_core/loader/*).

The reference ships ``SingleGPUModelBuilder`` plus stub loaders; here the
builder delegates into the TPU loading layer, and single-device vs. sharded
is a mesh argument rather than a different builder class.
"""

from pathlib import Path
from typing import Optional

from mlx_video_tpu.loading import load_model_bundle, resolve_transformer_file, resolve_vae_file
from mlx_video_tpu.pipelines.generate import PipelineType

from ltx_core.loader.primitives import LoraPathStrengthAndSDOps  # noqa: F401

# ComfyUI-export LoRA key renaming (reference: ltx_core/loader/__init__.py:5 —
# an empty map in the reference too; kept for import parity with its CLIs).
LTXV_LORA_COMFY_RENAMING_MAP: dict = {}


class SingleGPUModelBuilder:
    """Builds the full model bundle on one chip (reference parity name)."""

    def __init__(self, model_path, pipeline: str = "distilled", audio: bool = False):
        self.model_path = Path(model_path)
        self.pipeline = PipelineType(pipeline)
        self.audio = audio

    def build(self):
        return load_model_bundle(self.model_path, pipeline=self.pipeline, audio=self.audio)


def fuse_loras(*args, **kwargs):
    """Use mlx_video_tpu.lora.merge_lora_into_params (reference stub raised too)."""
    raise NotImplementedError(
        "fuse_loras: use mlx_video_tpu.lora.merge_lora_into_params on the param pytree"
    )


class SafetensorsModelStateDictLoader:
    """Parity stub (reference: ltx_core/loader raise/no-op)."""

    def __init__(self, *args, **kwargs):
        pass

    def load(self, *args, **kwargs):
        raise NotImplementedError("Use mlx_video_tpu.io.weights loaders")
