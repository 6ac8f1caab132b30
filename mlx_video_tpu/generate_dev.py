"""Legacy dev-pipeline entry (reference: mlx_video/generate_dev.py:1-59 shim)."""

from mlx_video_tpu.generate import (  # noqa: F401
    AUDIO_LATENTS_PER_SECOND,
    AUDIO_SAMPLE_RATE,
    DEFAULT_NEGATIVE_PROMPT,
    cfg_delta,
    compute_audio_frames,
    create_audio_position_grid,
    create_position_grid,
    generate_video,
    ltx2_scheduler,
    main,
)


def generate_video_dev(*args, tiling: str = "none", **kwargs):
    """Dev single-stage CFG generation (reference parity name)."""
    from mlx_video_tpu.pipelines.generate import PipelineType

    kwargs.setdefault("pipeline", PipelineType.DEV)
    return generate_video(*args, tiling=tiling, **kwargs)


if __name__ == "__main__":
    main(["--pipeline", "dev"])
