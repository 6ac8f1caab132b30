"""End-to-end wall-clock of the default distilled recipe at FULL geometry.

Measures the north-star config (BASELINE.md: distilled 512x512x33f, 8+3
steps) through the real generate_video pipeline on one TPU chip: stage-1
denoise -> 2x latent upsample -> stage-2 refine -> chunked VAE decode ->
mp4 write. The 19B-geometry transformer runs W4A8 (q4 storage synthesized
by bench.synth_q4_params — random weights in the real quantized layout;
timing depends on shapes/dtypes only — with int8 MXU compute);
decoder/upsampler are full-geometry random bf16, host-staged around the
denoise phases (generate_video low_memory).

Run it twice in separate processes to measure cold-vs-warm persistent
compilation cache (VERDICT r1 weak #3):

    python scripts/e2e_timing.py          # first: compiles (persistent cache)
    python scripts/e2e_timing.py          # second process: warm cache

Prints the phase report and one JSON line with the wall-clock split.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    from bench import synth_q4_params
    from mlx_video_tpu.config import LTXModelConfig, LTXModelType, LTXRopeType
    from mlx_video_tpu.models.ltx.upsampler import init_latent_upsampler
    from mlx_video_tpu.models.ltx.video_vae.decoder import DecoderConfig, init_video_decoder
    from mlx_video_tpu.pipelines.generate import (
        ModelBundle,
        PipelineType,
        TextConditioning,
        generate_video,
    )

    t_start = time.time()
    tiny = "--tiny" in sys.argv
    if tiny:
        config = LTXModelConfig(
            model_type=LTXModelType.VideoOnly, num_attention_heads=4,
            attention_head_dim=32, in_channels=16, out_channels=16, num_layers=4,
            cross_attention_dim=128, caption_channels=64, rope_type=LTXRopeType.SPLIT,
        )
        dec_cfg = DecoderConfig(in_channels=16, base_channels=32,
                                num_layers_per_block=1, num_upsamples=3, patch_size=4)
        ups = init_latent_upsampler(jax.random.key(2), in_channels=16,
                                    mid_channels=32, num_blocks=1, dtype=jnp.bfloat16)
    else:
        config = LTXModelConfig(
            model_type=LTXModelType.VideoOnly, num_attention_heads=32,
            attention_head_dim=128, in_channels=128, out_channels=128, num_layers=48,
            cross_attention_dim=4096, caption_channels=3840, rope_type=LTXRopeType.SPLIT,
        )
        dec_cfg = DecoderConfig()  # full 1024-channel geometry
        ups = init_latent_upsampler(jax.random.key(2), dtype=jnp.bfloat16)

    params = synth_q4_params(config)
    if not tiny:
        # W4A8: the recommended single-chip 19B mode (int8 MXU rate, and the
        # per-layer int8 transients halve the scan's temp arena vs bf16
        # dequant - the arena is what crowds a 16 GB chip next to 8.4 GB of
        # weights).
        from mlx_video_tpu.ops.quant import prepare_w4a8

        params = prepare_w4a8(params, bits=4)
    dec = init_video_decoder(jax.random.key(1), dec_cfg, dtype=jnp.bfloat16)
    models = ModelBundle(
        transformer_params=params,
        transformer_config=config,
        vae_decoder_params=dec,
        vae_decoder_config=dec_cfg,
        upsampler_params=ups,
    )
    # The bundle must hold the ONLY references: low_memory staging frees
    # HBM by refcount, and lingering locals would pin the device copies.
    del params, dec, ups
    text = TextConditioning(
        video_embeddings=jax.random.normal(
            jax.random.key(3), (1, 128, config.caption_channels), dtype=jnp.bfloat16
        )
    )
    jax.block_until_ready(models.transformer_params)
    t_load = time.time() - t_start

    out = "/tmp/e2e_timing.mp4"
    t0 = time.time()
    result = generate_video(
        models, text,
        height=64 if tiny else 512, width=64 if tiny else 512,
        num_frames=9 if tiny else 33,
        seed=0, pipeline=PipelineType.DISTILLED,
        stage1_steps=2 if tiny else 8, stage2_steps=1 if tiny else 3,
        output_path=out, tiling="auto", dtype=jnp.bfloat16, profile=True,
        low_memory=not tiny,  # 19B + full decoder: stage HBM like the reference
        # int8 transfer parking for the aux stages (halves staging bytes;
        # per-group codec passes the 35 dB drift gate, tests/test_staging.py):
        aux_int8_staging=(not tiny) and os.environ.get("MLX_VIDEO_AUX_INT8", "1") == "1",
        # async prefetch of the aux transfers under the denoise scans
        # (MLX_VIDEO_OVERLAP_STAGING=0 disables):
        overlap_staging=None,
        # Park the int8 aux trees in HBM: at this geometry the ~0.9 GiB
        # parked form fits beside the w4a8 19B + arena, so the staging
        # transfers vanish (MLX_VIDEO_AUX_PARK=host restores the classic
        # host round-trip):
        aux_park_device=os.environ.get("MLX_VIDEO_AUX_PARK", "device") == "device",
    )
    wall = time.time() - t0
    assert result.video is not None and np.isfinite(result.video).all()
    phases = {k: round(v, 3) for k, v in result.phase_timer.phases.items()}
    print(json.dumps({
        "metric": "e2e_distilled_512x512x33_seconds" if not tiny else "e2e_tiny_seconds",
        "wall_seconds": round(wall, 2),
        "param_setup_seconds": round(t_load, 2),
        "phases": phases,
        "mode": "19b-w4a8 + full decoder" if not tiny else "tiny",
    }))


if __name__ == "__main__":
    main()
