"""TPU-native LTX-2 inference + finetuning stack.

Top-level convenience exports (reference: mlx_video/__init__.py exposes
LTXModel/LTXModelConfig/loaders). Heavy submodules import lazily — importing
the package must stay cheap for CLI --help and tooling.
"""

from mlx_video_tpu.config import LTXModelConfig, LTXModelType, LTXRopeType

__version__ = "0.1.0"

__all__ = [
    "LTXModelConfig",
    "LTXModelType",
    "LTXRopeType",
    "init_ltx_params",
    "ltx_apply",
    "load_dit_params",
    "generate_video",
    "__version__",
]


def __getattr__(name):
    if name in ("init_ltx_params", "ltx_apply"):
        from mlx_video_tpu.models.ltx import model

        return getattr(model, name)
    if name == "load_dit_params":
        from mlx_video_tpu.io.weights import load_dit_params

        return load_dit_params
    if name == "generate_video":
        from mlx_video_tpu.pipelines.generate import generate_video

        return generate_video
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
