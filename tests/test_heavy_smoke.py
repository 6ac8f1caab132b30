"""Env-gated heavy smoke tests against real LTX-2 weights.

Mirrors the reference's gated heavy suite
(reference: tests/test_heavy_pipeline_parity.py, test_heavy_smoke.py): these
download/load the full 19B stack, so they only run when explicitly
requested:

    MLX_VIDEO_TPU_SMOKE=1 MLX_VIDEO_TPU_MODEL_REPO=/path/to/snapshot \
        python -m pytest tests/test_heavy_smoke.py -q
"""

import os
from pathlib import Path

import pytest

if not os.getenv("MLX_VIDEO_TPU_SMOKE"):
    pytest.skip(
        "Set MLX_VIDEO_TPU_SMOKE=1 (and MLX_VIDEO_TPU_MODEL_REPO) for heavy tests",
        allow_module_level=True,
    )


def _model_repo():
    return os.getenv("MLX_VIDEO_TPU_MODEL_REPO", "Lightricks/LTX-2")


@pytest.fixture(scope="module")
def models():
    import jax.numpy as jnp

    from mlx_video_tpu.loading import load_model_bundle
    from mlx_video_tpu.pipelines.generate import PipelineType
    from mlx_video_tpu.utils.hub import get_model_path

    path = get_model_path(_model_repo())
    return load_model_bundle(path, pipeline=PipelineType.DISTILLED, dtype=jnp.bfloat16)


@pytest.fixture(scope="module")
def text(models):
    import jax.numpy as jnp

    from mlx_video_tpu.models.ltx.text_encoder import LTX2TextEncoder
    from mlx_video_tpu.pipelines.generate import TextConditioning
    from mlx_video_tpu.utils.hub import get_model_path

    path = get_model_path(_model_repo())
    encoder = LTX2TextEncoder.load(path, path, dtype=jnp.bfloat16)
    video, audio = encoder.encode("A cinematic mountain landscape at sunrise.")
    return TextConditioning(video_embeddings=video, audio_embeddings=audio)


def test_distilled_pipeline(models, text, tmp_path: Path):
    from mlx_video_tpu.pipelines.generate import PipelineType, generate_video

    out = tmp_path / "distilled.mp4"
    result = generate_video(
        models, text,
        height=512, width=512, num_frames=9, seed=0, fps=12.0,
        pipeline=PipelineType.DISTILLED, stage1_steps=4, stage2_steps=2,
        output_path=out,
    )
    assert out.exists() and out.stat().st_size > 0
    assert result.latents is not None


def test_dev_pipeline(models, text, tmp_path: Path):
    from mlx_video_tpu.pipelines.generate import PipelineType, generate_video

    out = tmp_path / "dev.mp4"
    generate_video(
        models, text,
        height=512, width=512, num_frames=9, seed=0, fps=12.0,
        pipeline=PipelineType.DEV, num_inference_steps=10, cfg_scale=4.0,
        output_path=out,
    )
    assert out.exists() and out.stat().st_size > 0
