"""BASELINE config 3: dev single-stage CFG e2e — 768x768, 65 frames,
40 steps, cfg 4.5, image conditioning — on ONE chip.

Drives generate_video through the DEV pipeline at the full config-3
geometry (latents 9x24x24 = 5184 tokens, CFG-batched 2B forward) with the
19B-geometry transformer in W4A8 (q4 storage synthesized by
bench.synth_q4_params — random weights in the real quantized layout;
timing depends on shapes/dtypes only), the full VAE encoder (conditioning
image) and 1024-channel decoder (tiled), under low_memory staging.

    python scripts/e2e_config3.py            # full, on the TPU
    python scripts/e2e_config3.py --tiny --cpu   # plumbing smoke
    python scripts/e2e_config3.py --steps N      # override step count

Prints the phase report and one JSON line.
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
    from mlx_video_tpu.config import (
        LTXModelConfig,
        LTXModelType,
        LTXRopeType,
        VideoVAEConfig,
        tiny_test_config,
    )
    from mlx_video_tpu.models.ltx.video_vae.decoder import DecoderConfig, init_video_decoder
    from mlx_video_tpu.models.ltx.video_vae.encoder import init_video_encoder
    from mlx_video_tpu.pipelines.generate import (
        ModelBundle,
        PipelineType,
        TextConditioning,
        generate_video,
    )

    t_start = time.time()
    tiny = "--tiny" in sys.argv
    steps = 40
    if "--steps" in sys.argv:
        steps = int(sys.argv[sys.argv.index("--steps") + 1])
    if tiny:
        config = tiny_test_config(LTXModelType.VideoOnly)
        steps = min(steps, 2)
        enc_cfg = VideoVAEConfig(
            in_channels=3, out_channels=config.in_channels,
            latent_channels=config.in_channels, patch_size=4,
            encoder_blocks=(
                ("res_x", {"num_layers": 1}),
                ("compress_space_res", {"multiplier": 2}),
                ("compress_time_res", {"multiplier": 2}),
                ("compress_all_res", {"multiplier": 2}),
                ("compress_all_res", {"multiplier": 2}),
            ),
        )
        dec_cfg = DecoderConfig(in_channels=config.in_channels, base_channels=32,
                                num_layers_per_block=1, num_upsamples=3, patch_size=4)
        from mlx_video_tpu.models.ltx.model import init_ltx_params

        t_params = init_ltx_params(jax.random.key(0), config, dtype=jnp.bfloat16)
    else:
        config = LTXModelConfig(
            model_type=LTXModelType.VideoOnly,
            num_attention_heads=32, attention_head_dim=128,
            in_channels=128, out_channels=128, num_layers=48,
            cross_attention_dim=4096, caption_channels=3840,
            rope_type=LTXRopeType.SPLIT,
        )
        enc_cfg = VideoVAEConfig()
        dec_cfg = DecoderConfig()
        from mlx_video_tpu.ops.quant import prepare_w4a8

        t_params = prepare_w4a8(synth_q4_params(config), bits=4)

    # Aux models init on the HOST: at 19B the transformer already claims
    # most of the 16 GB chip — device-initializing enc/dec next to it OOMs
    # before low_memory staging can retire them (r2 chip run). low_memory
    # then moves each to HBM only for its own phase.
    host = jax.devices("cpu")[0]
    with jax.default_device(host):
        dec_params = init_video_decoder(jax.random.key(1), dec_cfg, dtype=jnp.bfloat16)
        enc_params = init_video_encoder(jax.random.key(2), enc_cfg, dtype=jnp.bfloat16)
    models = ModelBundle(
        transformer_params=t_params,
        transformer_config=config,
        vae_decoder_params=dec_params,
        vae_decoder_config=dec_cfg,
        vae_encoder_params=enc_params,
        vae_encoder_config=enc_cfg,
    )
    del t_params, dec_params, enc_params

    rng = np.random.default_rng(0)
    text = TextConditioning(
        video_embeddings=jnp.asarray(
            rng.normal(size=(1, 128, config.caption_channels)), dtype=jnp.bfloat16
        ),
        video_neg_embeddings=jnp.asarray(
            rng.normal(size=(1, 128, config.caption_channels)), dtype=jnp.bfloat16
        ),
    )
    jax.block_until_ready(models.transformer_params)
    t_load = time.time() - t_start

    hw = 64 if tiny else 768
    frames = 9 if tiny else 65
    import cv2

    img_path = "/tmp/e2e_c3_img.png"
    cv2.imwrite(img_path, rng.integers(0, 255, (hw, hw, 3)).astype(np.uint8))

    out = "/tmp/e2e_c3.mp4"
    t0 = time.time()
    cfg_sequential = "--cfg-sequential" in sys.argv
    result = generate_video(
        models, text,
        height=hw, width=hw, num_frames=frames, seed=0,
        pipeline=PipelineType.DEV,
        num_inference_steps=steps, cfg_scale=4.5,
        images=[(img_path, 0, 1.0)],
        output_path=out, tiling="auto", dtype=jnp.bfloat16, profile=True,
        low_memory=not tiny and "--no-low-memory" not in sys.argv,
        # per-group int8 transfer parking (35 dB-gated, tests/test_staging.py):
        # halves the decoder/encoder staging bytes; at this geometry the dev
        # scan arena fills HBM, so keep the HOST park (no aux_park_device)
        # and let MLX_VIDEO_OVERLAP_STAGING control the async prefetch.
        aux_int8_staging=not tiny and "--no-aux-int8" not in sys.argv,
        cfg_sequential=cfg_sequential,
        # preferred-layout placement: without it XLA prepends ~3 GB of
        # relayout copies of the 48-layer w4a8 stacks — the difference
        # between the batched-CFG scan fitting one 16 GB chip or OOMing
        optimize_layouts=not tiny and "--no-layout-opt" not in sys.argv,
    )
    wall = time.time() - t0
    assert os.path.exists(out)
    phases = {k: round(v, 3) for k, v in result.phase_timer.phases.items()}
    print(json.dumps({
        "metric": "e2e_config3_dev_cfg_seconds",
        "geometry": f"{hw}x{hw}x{frames}f, {steps} steps, cfg 4.5, i2v",
        "wall_seconds": round(wall, 2),
        "param_setup_seconds": round(t_load, 2),
        "phases": phases,
        "onchip_phase_total": round(sum(result.phase_timer.phases.values()), 2),
        "mode": "tiny" if tiny else (
            "19b-w4a8, sequential CFG (2x batch-B forwards), 1 chip"
            if cfg_sequential else "19b-w4a8, CFG-batched 2B forward, 1 chip"
        ),
    }))


if __name__ == "__main__":
    main()
