"""``python -m mlx_video_tpu.generate`` parity entry (reference CLI name:
``python -m mlx_video.generate``). Re-exports the pipeline API."""

from mlx_video_tpu.cli.generate import build_parser, main  # noqa: F401
from mlx_video_tpu.pipelines.generate import (  # noqa: F401
    GenerateResult,
    ModelBundle,
    PipelineType,
    TextConditioning,
    generate_video,
)
from mlx_video_tpu.pipelines.positions import (  # noqa: F401
    AUDIO_LATENTS_PER_SECOND,
    AUDIO_SAMPLE_RATE,
    compute_audio_frames,
    create_audio_position_grid,
    create_position_grid,
)
from mlx_video_tpu.pipelines.prompts import DEFAULT_NEGATIVE_PROMPT  # noqa: F401
from mlx_video_tpu.pipelines.schedulers import (  # noqa: F401
    STAGE_1_SIGMAS,
    STAGE_2_SIGMAS,
    cfg_delta,
    ltx2_scheduler,
)

if __name__ == "__main__":
    main()
