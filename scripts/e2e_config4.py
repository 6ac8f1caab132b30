"""BASELINE config 4: keyframe + IC-LoRA video conditioning with
synchronized (joint) audio and streaming tiled decode, full geometry.

Drives generate_video on ONE chip through the two conditioned distilled
pipelines at the 512x512x33f default recipe with the full-size models:

  leg A (headline): IC_LORA — reference-video conditioning (replace mode)
      + keyframe image, joint audio denoise in the AV transformer,
      stream=True tiled decode, wav decode (audio VAE + vocoder), mux.
  leg B: KEYFRAME — guide-mode image conditioning, same geometry (reuses
      leg A's compiled programs in-process).

Models: 19B-geometry AudioVideo transformer in W4A8 (q4 storage
synthesized by bench.synth_q4_params — random weights in the real
quantized layout; timing depends on shapes/dtypes only), full-geometry
VAE encoder + 1024-channel decoder + upsampler + audio VAE decoder +
HiFi-GAN vocoder (random bf16), low_memory host staging.

Conditioning media are synthesized (gradient PNG + 9-frame mp4): pixel
values do not affect timing.

    python scripts/e2e_config4.py           # full, on the TPU
    python scripts/e2e_config4.py --tiny --cpu   # plumbing smoke

Prints the phase report and one JSON line per leg.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _write_cond_media(tmp: str, hw: int, frames: int = 9):
    """Synthesize a keyframe PNG and a short reference mp4 with cv2."""
    import cv2
    import numpy as np

    img_path = os.path.join(tmp, "keyframe.png")
    grad = np.linspace(0, 255, hw, dtype=np.uint8)
    gx = np.broadcast_to(grad[None, :], (hw, hw))
    gy = np.broadcast_to(grad[:, None], (hw, hw))
    cv2.imwrite(img_path, np.stack([gx, gy, gx], -1))

    vid_path = os.path.join(tmp, "refvid.mp4")
    vw = cv2.VideoWriter(vid_path, cv2.VideoWriter_fourcc(*"mp4v"), 24, (hw, hw))
    rng = np.random.default_rng(0)
    for _ in range(frames):
        vw.write(rng.integers(0, 255, (hw, hw, 3), dtype=np.uint8))
    vw.release()
    return img_path, vid_path


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    from bench import synth_q4_params
    from mlx_video_tpu.config import (
        LTXModelConfig,
        LTXModelType,
        LTXRopeType,
        VideoVAEConfig,
        tiny_test_config,
    )
    from mlx_video_tpu.models.ltx.audio_vae.audio_vae import (
        AudioVAEConfig,
        init_audio_decoder,
    )
    from mlx_video_tpu.models.ltx.audio_vae.vocoder import VocoderConfig, init_vocoder
    from mlx_video_tpu.models.ltx.upsampler import init_latent_upsampler
    from mlx_video_tpu.models.ltx.video_vae.decoder import DecoderConfig, init_video_decoder
    from mlx_video_tpu.models.ltx.video_vae.encoder import init_video_encoder
    from mlx_video_tpu.pipelines.generate import (
        ModelBundle,
        PipelineType,
        TextConditioning,
        generate_video,
    )

    t_start = time.time()
    # Compile-warm the trivial fence program while HBM is still empty:
    # generate_video's staging fence is the first device dispatch after the
    # ~11 GiB AV tree lands, and its deferred device-side compile under that
    # pressure was where the r3 chip run surfaced RESOURCE_EXHAUSTED.
    float(jnp.sum(jnp.ones((8,), jnp.float32)))
    tiny = "--tiny" in sys.argv
    if tiny:
        config = dataclasses.replace(
            tiny_test_config(LTXModelType.AudioVideo),
            audio_in_channels=128, audio_out_channels=128,
        )
        enc_cfg = VideoVAEConfig(
            in_channels=3, out_channels=config.in_channels,
            latent_channels=config.in_channels, patch_size=4,
            # 32x spatial / 8x temporal like the real VAE, tiny channels.
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
        audio_cfg = AudioVAEConfig(
            ch=16, ch_mult=(1, 2, 4), num_res_blocks=1, in_channels=2, out_ch=2,
            z_channels=8, mel_bins=64, resolution=64,
            decoder_attn_resolutions=(), mid_block_add_attention=True,
        )
        voc_cfg = VocoderConfig(
            upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
            resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
            upsample_initial_channel=32, stereo=True, mel_in_channels=128,
        )
        key = jax.random.key
        from mlx_video_tpu.models.ltx.model import init_ltx_params

        t_params = init_ltx_params(key(0), config, dtype=jnp.bfloat16)
        ups = init_latent_upsampler(key(2), in_channels=config.in_channels,
                                    mid_channels=32, num_blocks=1, dtype=jnp.bfloat16)
    else:
        # Full 19B AV geometry: video branch 48L x (32 heads x 128), audio
        # branch (32 x 64) — the flagship AudioVideo config (config.py
        # defaults; reference models/ltx/config.py 19B block).
        config = LTXModelConfig(
            model_type=LTXModelType.AudioVideo,
            num_attention_heads=32, attention_head_dim=128,
            in_channels=128, out_channels=128, num_layers=48,
            cross_attention_dim=4096, caption_channels=3840,
            rope_type=LTXRopeType.SPLIT,
        )
        enc_cfg = VideoVAEConfig()  # full encoder geometry
        dec_cfg = DecoderConfig()  # full 1024-channel decoder
        audio_cfg = AudioVAEConfig()  # full mel VAE
        voc_cfg = VocoderConfig()  # full HiFi-GAN (6,5,2,2,2)
        key = jax.random.key
        t_params = synth_q4_params(config)
        from mlx_video_tpu.ops.quant import prepare_w4a8

        t_params = prepare_w4a8(t_params, bits=4)
        ups = None  # host-initialized below with the rest of the aux stack

    # Aux models init on the HOST: the 19B AV transformer claims ~11 GB of
    # the 16 GB chip — device-initializing the full enc/dec/upsampler/audio
    # stack next to it OOMs before low_memory staging can retire anything
    # (r2 chip run failed inside the first _stage(to_host=True)). Host-born
    # params make that staging a no-op; each stage moves to HBM on use.
    host = jax.devices("cpu")[0]
    with jax.default_device(host):
        dec_params = init_video_decoder(key(1), dec_cfg, dtype=jnp.bfloat16)
        enc_params = init_video_encoder(key(5), enc_cfg, dtype=jnp.bfloat16)
        audio_params = init_audio_decoder(key(3), audio_cfg, dtype=jnp.bfloat16)
        voc_params = init_vocoder(key(4), voc_cfg, dtype=jnp.bfloat16)
        if not tiny:
            ups = init_latent_upsampler(key(2), dtype=jnp.bfloat16)
    models = ModelBundle(
        transformer_params=t_params,
        transformer_config=config,
        vae_decoder_params=dec_params,
        vae_decoder_config=dec_cfg,
        vae_encoder_params=enc_params,
        vae_encoder_config=enc_cfg,
        upsampler_params=ups,
        audio_decoder_params=audio_params,
        audio_decoder_config=audio_cfg,
        vocoder_params=voc_params,
        vocoder_config=voc_cfg,
    )
    # the bundle must hold the only refs (low_memory staging)
    del t_params, ups, dec_params, enc_params, audio_params, voc_params

    rng = np.random.default_rng(0)
    text = TextConditioning(
        video_embeddings=jnp.asarray(
            rng.normal(size=(1, 128, config.caption_channels)), dtype=jnp.bfloat16
        ),
        audio_embeddings=jnp.asarray(
            rng.normal(size=(1, 128, config.audio_caption_channels)), dtype=jnp.bfloat16
        ),
    )
    jax.block_until_ready(models.transformer_params)
    t_load = time.time() - t_start
    try:
        ms = jax.local_devices()[0].memory_stats()
        print(
            f"hbm in use after param synth: "
            f"{ms.get('bytes_in_use', 0) / 2**30:.2f} GiB "
            f"(limit {ms.get('bytes_limit', 0) / 2**30:.2f})",
            file=sys.stderr,
        )
    except Exception:
        pass

    hw = 64 if tiny else 512
    frames = 9 if tiny else 33
    tmp = "/tmp/e2e_c4"
    os.makedirs(tmp, exist_ok=True)
    img_path, vid_path = _write_cond_media(tmp, hw)

    legs = []
    for name, pipe, kwargs in (
        (
            "ic_lora_av_stream",
            PipelineType.IC_LORA,
            dict(
                video_conditionings=[(vid_path, 0, 0.8)],
                images=[(img_path, 0, 1.0)],
                audio=True, audio_mode="joint",
                stream=True,
                output_audio_path=os.path.join(tmp, "ic_lora.wav"),
            ),
        ),
        ("keyframe_guide", PipelineType.KEYFRAME, dict(images=[(img_path, 0, 1.0)])),
    ):
        out = os.path.join(tmp, f"{name}.mp4")
        t0 = time.time()
        result = generate_video(
            models, text,
            height=hw, width=hw, num_frames=frames, seed=0, pipeline=pipe,
            stage1_steps=2 if tiny else 8, stage2_steps=1 if tiny else 3,
            output_path=out, tiling="auto", dtype=jnp.bfloat16, profile=True,
            low_memory=not tiny,
            optimize_layouts=not tiny,
            # per-group int8 transfer parking for the (many) aux stacks:
            # enc + dec + ups + audio dec + vocoder are ~2.5 GB bf16 of
            # host<->HBM staging otherwise (35 dB-gated codec).
            aux_int8_staging=(not tiny) and "--no-aux-int8" not in sys.argv,
            **kwargs,
        )
        wall = time.time() - t0
        assert os.path.exists(out), f"{name}: no mp4"
        phases = {k: round(v, 3) for k, v in result.phase_timer.phases.items()}
        leg = {
            "metric": f"e2e_config4_{name}_seconds",
            "wall_seconds": round(wall, 2),
            "phases": phases,
            "onchip_phase_total": round(sum(result.phase_timer.phases.values()), 2),
            "mode": "tiny" if tiny else "19b-av-w4a8 + full enc/dec/ups/audio/vocoder",
        }
        legs.append(leg)
        print(json.dumps(leg))
        if name == "ic_lora_av_stream":
            assert result.audio_latents is not None, "joint audio latents missing"
            # Param synthesis/staging means low_memory freed the transformer;
            # reload it for leg B by re-synthesizing (cheap relative to run).
            if not tiny and models.transformer_params is None:
                # Evict the decode-phase aux trees first: the decoder /
                # audio decoder / vocoder were staged IN for leg A's final
                # decode and stay HBM-resident after the call (~2.5 GB
                # bf16). Coexisting with the ~9.5 GiB w4a8 re-synthesis
                # RESOURCE_EXHAUSTED'd the first r4 drive at exactly this
                # line; park them to host as int8 (staging codec) and let
                # leg B's low_memory staging bring each back on use.
                from mlx_video_tpu.io import staging as _st

                host_dev = jax.devices("cpu")[0]
                for attr in (
                    "vae_decoder_params", "vae_encoder_params",
                    "audio_decoder_params", "vocoder_params",
                    "upsampler_params",
                ):
                    t = getattr(models, attr)
                    if t is not None:
                        setattr(models, attr, _st.park_int8(t, host_dev))
                del result
                import gc

                gc.collect()
                # Drain the device queue (fetch, not block_until_ready —
                # the tunnel returns early from the latter) so the parked
                # buffers are actually freed before synthesis dispatches.
                float(jnp.sum(jnp.ones((8,), jnp.float32)))
                p = synth_q4_params(config)
                models.transformer_params = prepare_w4a8(p, bits=4)
                del p
                jax.block_until_ready(models.transformer_params)

    print(json.dumps({"param_setup_seconds": round(t_load, 2), "legs": len(legs)}))


if __name__ == "__main__":
    main()
