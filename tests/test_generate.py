"""End-to-end generate_video tests with tiny real-geometry models."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_video_tpu.config import LTXModelType, VideoVAEConfig, tiny_test_config
from mlx_video_tpu.models.ltx.model import init_ltx_params
from mlx_video_tpu.models.ltx.upsampler import init_latent_upsampler
from mlx_video_tpu.models.ltx.video_vae.decoder import DecoderConfig, init_video_decoder
from mlx_video_tpu.models.ltx.video_vae.encoder import init_video_encoder
from mlx_video_tpu.pipelines.generate import (
    ModelBundle,
    PipelineType,
    TextConditioning,
    generate_video,
    pad_dimensions,
    round_frames,
    select_tiling,
)

# 32x spatial / 8x temporal, like the real VAE, but tiny channels.
REAL_GEOM_ENCODER_BLOCKS = (
    ("res_x", {"num_layers": 1}),
    ("compress_space_res", {"multiplier": 2}),
    ("compress_time_res", {"multiplier": 2}),
    ("compress_all_res", {"multiplier": 2}),
    ("compress_all_res", {"multiplier": 2}),
)


@pytest.fixture(scope="module")
def models():
    cfg = tiny_test_config(LTXModelType.VideoOnly)
    enc_cfg = VideoVAEConfig(
        in_channels=3, out_channels=cfg.in_channels, latent_channels=cfg.in_channels,
        patch_size=4, encoder_blocks=REAL_GEOM_ENCODER_BLOCKS,
    )
    dec_cfg = DecoderConfig(
        in_channels=cfg.in_channels, base_channels=32, num_layers_per_block=1,
        num_upsamples=3, patch_size=4,
    )
    return ModelBundle(
        transformer_params=init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32),
        transformer_config=cfg,
        vae_decoder_params=init_video_decoder(jax.random.key(1), dec_cfg),
        vae_decoder_config=dec_cfg,
        vae_encoder_params=init_video_encoder(jax.random.key(2), enc_cfg),
        vae_encoder_config=enc_cfg,
        upsampler_params=init_latent_upsampler(
            jax.random.key(3), in_channels=cfg.in_channels, mid_channels=32, num_blocks=1
        ),
    )


def _text(cfg, with_neg=False, seed=0):
    rng = np.random.default_rng(seed)
    pos = jnp.asarray(rng.normal(size=(1, 8, cfg.caption_channels)).astype(np.float32))
    neg = jnp.asarray(rng.normal(size=(1, 8, cfg.caption_channels)).astype(np.float32))
    return TextConditioning(video_embeddings=pos, video_neg_embeddings=neg if with_neg else None)


class TestHelpers:
    def test_pad_dimensions(self):
        assert pad_dimensions(512, 512, 64) == (512, 512, None)
        h, w, crop = pad_dimensions(480, 832, 64)
        assert h == 512 and w == 832
        assert crop == (16, 0, 480, 832)

    def test_round_frames(self):
        assert round_frames(33) == 33
        assert round_frames(30) == 33
        assert round_frames(34) == 41
        assert round_frames(1) == 1

    def test_select_tiling_stream_forces_temporal(self):
        cfg = select_tiling("none", 256, 256, 33, stream=True)
        assert cfg is not None and cfg.temporal_config is not None
        assert select_tiling("none", 256, 256, 33, stream=False) is None

    def test_resolve_frame_idx_media_to_latent(self):
        """CLI frame indices are MEDIA frames; conditioning indexes LATENT
        frames (reference: generate.py:2612-2619): identity when it fits,
        else proportional rescale, clamped."""
        from mlx_video_tpu.pipelines.generate import _resolve_frame_idx

        # 33 media frames -> 5 latent frames
        assert _resolve_frame_idx(0, 33, 5) == 0
        assert _resolve_frame_idx(4, 33, 5) == 4          # already latent-ranged
        assert _resolve_frame_idx(16, 33, 5) == 2          # mid-video -> mid-latent
        assert _resolve_frame_idx(32, 33, 5) == 4          # last frame -> last latent
        assert _resolve_frame_idx(99, 33, 5) == 4          # clamped
        assert _resolve_frame_idx(8, 1, 1) == 0


class TestDistilledPipeline:
    def test_t2v_writes_mp4(self, models, tmp_path):
        out = tmp_path / "video.mp4"
        result = generate_video(
            models, _text(models.transformer_config),
            height=64, width=64, num_frames=9, seed=0,
            pipeline=PipelineType.DISTILLED, stage1_steps=2, stage2_steps=1,
            output_path=out, tiling="none", dtype=jnp.float32,
        )
        assert out.exists() and out.stat().st_size > 0
        assert result.latents.shape == (1, 16, 2, 2, 2)
        assert result.video.shape == (1, 3, 9, 64, 64)
        assert np.all(np.isfinite(result.video))
        assert "stage1_denoise" in result.phase_timer.phases
        assert "stage2_denoise" in result.phase_timer.phases
        assert "vae_decode" in result.phase_timer.phases

    def test_low_memory_frees_transformer(self, tmp_path):
        # low_memory: reference-parity staging (del transformer before decode,
        # reference generate.py:3504-3506). Fresh bundle: `models` is shared.
        from mlx_video_tpu.config import LTXModelType, tiny_test_config
        from mlx_video_tpu.models.ltx.video_vae.decoder import DecoderConfig, init_video_decoder

        cfg = tiny_test_config(LTXModelType.VideoOnly)
        dec_cfg = DecoderConfig(
            in_channels=cfg.in_channels, base_channels=32, num_layers_per_block=1,
            num_upsamples=3, patch_size=4,
        )
        bundle = ModelBundle(
            transformer_params=init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32),
            transformer_config=cfg,
            vae_decoder_params=init_video_decoder(jax.random.key(1), dec_cfg),
            vae_decoder_config=dec_cfg,
            upsampler_params=init_latent_upsampler(
                jax.random.key(3), in_channels=cfg.in_channels, mid_channels=32, num_blocks=1
            ),
        )
        out = tmp_path / "lm.mp4"
        result = generate_video(
            bundle, _text(cfg), height=64, width=64, num_frames=9, seed=0,
            pipeline=PipelineType.DISTILLED, stage1_steps=1, stage2_steps=1,
            output_path=out, tiling="none", dtype=jnp.float32, low_memory=True,
        )
        assert out.exists() and np.all(np.isfinite(result.video))
        assert bundle.transformer_params is None

    def test_low_memory_repeat_run_with_images(self, tmp_path):
        """A second low_memory run on the same bundle must restage the
        host-parked VAE encoder back on-device before cond_encode (a prior
        run leaves it host-staged)."""
        from dataclasses import replace

        from mlx_video_tpu.config import LTXModelType, VideoVAEConfig, tiny_test_config
        from mlx_video_tpu.models.ltx.video_vae.decoder import DecoderConfig, init_video_decoder
        from mlx_video_tpu.models.ltx.video_vae.encoder import init_video_encoder

        cfg = tiny_test_config(LTXModelType.VideoOnly)
        enc_cfg = VideoVAEConfig(
            in_channels=3, out_channels=cfg.in_channels, latent_channels=cfg.in_channels,
            patch_size=4, encoder_blocks=REAL_GEOM_ENCODER_BLOCKS,
        )
        dec_cfg = DecoderConfig(
            in_channels=cfg.in_channels, base_channels=32, num_layers_per_block=1,
            num_upsamples=3, patch_size=4,
        )
        bundle = ModelBundle(
            transformer_params=init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32),
            transformer_config=cfg,
            vae_decoder_params=init_video_decoder(jax.random.key(1), dec_cfg),
            vae_decoder_config=dec_cfg,
            vae_encoder_params=init_video_encoder(jax.random.key(2), enc_cfg),
            vae_encoder_config=enc_cfg,
            upsampler_params=init_latent_upsampler(
                jax.random.key(3), in_channels=cfg.in_channels, mid_channels=32, num_blocks=1
            ),
        )
        import cv2

        img = tmp_path / "cond.png"
        cv2.imwrite(str(img), np.zeros((64, 64, 3), np.uint8))
        kw = dict(
            height=64, width=64, num_frames=9, seed=0, pipeline=PipelineType.DISTILLED,
            stage1_steps=1, stage2_steps=1, images=[(str(img), 0, 1.0)],
            tiling="none", dtype=jnp.float32, low_memory=True,
        )
        t_params = bundle.transformer_params
        generate_video(bundle, _text(cfg), output_path=tmp_path / "a.mp4", **kw)
        # low_memory freed the transformer; restore for the second run
        bundle2 = replace(bundle, transformer_params=t_params)
        r2 = generate_video(bundle2, _text(cfg), output_path=tmp_path / "b.mp4", **kw)
        assert (tmp_path / "b.mp4").exists() and np.all(np.isfinite(r2.video))

    def test_latents_only(self, models):
        result = generate_video(
            models, _text(models.transformer_config),
            height=64, width=64, num_frames=9, pipeline=PipelineType.DISTILLED,
            stage1_steps=1, stage2_steps=1, decode_latents_only=True, dtype=jnp.float32,
        )
        assert result.video_path is None
        assert result.latents.shape == (1, 16, 2, 2, 2)

    def test_i2v_conditioning(self, models, tmp_path):
        from PIL import Image

        img_path = tmp_path / "cond.png"
        Image.fromarray(
            (np.random.default_rng(0).uniform(size=(64, 64, 3)) * 255).astype(np.uint8)
        ).save(img_path)
        result = generate_video(
            models, _text(models.transformer_config),
            height=64, width=64, num_frames=9, pipeline=PipelineType.DISTILLED,
            stage1_steps=1, stage2_steps=1,
            images=[(str(img_path), 0, 1.0)],
            decode_latents_only=True, dtype=jnp.float32,
        )
        assert np.all(np.isfinite(result.latents))

    def test_seed_determinism(self, models):
        kw = dict(
            height=64, width=64, num_frames=9, pipeline=PipelineType.DISTILLED,
            stage1_steps=1, stage2_steps=1, decode_latents_only=True, dtype=jnp.float32,
        )
        a = generate_video(models, _text(models.transformer_config), seed=7, **kw)
        b = generate_video(models, _text(models.transformer_config), seed=7, **kw)
        c = generate_video(models, _text(models.transformer_config), seed=8, **kw)
        np.testing.assert_array_equal(a.latents, b.latents)
        assert np.max(np.abs(a.latents - c.latents)) > 1e-3

    def test_mesh_sharded_matches_single_device(self, models):
        """generate_video(mesh=...) with TP/FSDP-sharded transformer params
        must reproduce single-device latents (GSPMD inference path)."""
        from dataclasses import replace

        from mlx_video_tpu.parallel.mesh import create_mesh
        from mlx_video_tpu.parallel.sharding import shard_params

        kw = dict(
            height=64, width=64, num_frames=9, pipeline=PipelineType.DISTILLED,
            stage1_steps=2, stage2_steps=1, decode_latents_only=True, dtype=jnp.float32,
            seed=3,
        )
        ref = generate_video(models, _text(models.transformer_config), **kw)

        mesh = create_mesh((1, 2, 4))
        sharded = replace(
            models, transformer_params=shard_params(models.transformer_params, mesh)
        )
        out = generate_video(sharded, _text(models.transformer_config), mesh=mesh, **kw)
        np.testing.assert_allclose(out.latents, ref.latents, atol=5e-4)

        # And with ring-attention sequence parallelism on top.
        out_sp = generate_video(
            sharded, _text(models.transformer_config), mesh=mesh,
            sequence_parallel=True, **kw,
        )
        np.testing.assert_allclose(out_sp.latents, ref.latents, atol=5e-4)

    def test_pipeline_parallel_matches_single_device(self, models):
        """generate_video(pipeline_parallel=N) — GPipe stages over the block
        stack (parallel/pipeline.py) — must reproduce single-device latents."""
        from dataclasses import replace

        kw = dict(
            height=64, width=64, num_frames=9, pipeline=PipelineType.DISTILLED,
            stage1_steps=2, stage2_steps=1, decode_latents_only=True, dtype=jnp.float32,
            seed=3,
        )
        ref = generate_video(models, _text(models.transformer_config), **kw)
        out = generate_video(
            replace(models), _text(models.transformer_config), pipeline_parallel=2, **kw
        )
        np.testing.assert_allclose(out.latents, ref.latents, atol=5e-4)

        with pytest.raises(ValueError, match="mutually exclusive"):
            from mlx_video_tpu.parallel.mesh import create_mesh

            generate_video(
                replace(models), _text(models.transformer_config),
                pipeline_parallel=2, mesh=create_mesh((1, 2, 4)), **kw,
            )

    def test_invalid_steps_raise(self, models):
        with pytest.raises(ValueError, match="stage2_steps"):
            generate_video(
                models, _text(models.transformer_config),
                height=64, width=64, num_frames=9, stage2_steps=5,
                decode_latents_only=True,
            )


class TestDevPipeline:
    def test_dev_cfg(self, models):
        result = generate_video(
            models, _text(models.transformer_config, with_neg=True),
            height=64, width=64, num_frames=9, pipeline=PipelineType.DEV,
            num_inference_steps=3, cfg_scale=3.0,
            decode_latents_only=True, dtype=jnp.float32,
        )
        assert result.latents.shape == (1, 16, 2, 2, 2)
        assert np.all(np.isfinite(result.latents))

    def test_dev_cfg_sequential_matches_batched(self, models):
        kw = dict(
            height=64, width=64, num_frames=9, pipeline=PipelineType.DEV,
            num_inference_steps=3, cfg_scale=3.0,
            decode_latents_only=True, dtype=jnp.float32,
        )
        text = _text(models.transformer_config, with_neg=True)
        batched = generate_video(models, text, **kw)
        seq = generate_video(models, text, cfg_sequential=True, **kw)
        np.testing.assert_allclose(seq.latents, batched.latents, atol=5e-5)

    def test_dev_optimize_layouts_matches_default(self, models):
        """Layout pre-placement is a physical-layout change only: results
        must be bit-identical to the default placement."""
        kw = dict(
            height=64, width=64, num_frames=9, pipeline=PipelineType.DEV,
            num_inference_steps=3, cfg_scale=3.0,
            decode_latents_only=True, dtype=jnp.float32,
        )
        text = _text(models.transformer_config, with_neg=True)
        base = generate_video(models, text, **kw)
        opt = generate_video(models, text, optimize_layouts=True, **kw)
        np.testing.assert_array_equal(opt.latents, base.latents)

    def test_dev_rejects_video_conditioning(self, models):
        with pytest.raises(ValueError, match="ic_lora/distilled"):
            generate_video(
                models, _text(models.transformer_config),
                height=64, width=64, num_frames=9, pipeline=PipelineType.DEV,
                video_conditionings=[("x.mp4", 0, 1.0)], decode_latents_only=True,
            )

    def test_ic_lora_requires_video_conditioning(self, models):
        with pytest.raises(ValueError, match="video conditionings"):
            generate_video(
                models, _text(models.transformer_config),
                height=64, width=64, num_frames=9, pipeline=PipelineType.IC_LORA,
                decode_latents_only=True,
            )


class TestCropBack:
    def test_padded_output_cropped(self, models, tmp_path):
        # 96x96 -> padded to 128x128 for distilled (div 64), cropped back on write
        out = tmp_path / "cropped.mp4"
        result = generate_video(
            models, _text(models.transformer_config),
            height=96, width=96, num_frames=9, pipeline=PipelineType.DISTILLED,
            stage1_steps=1, stage2_steps=1, output_path=out, tiling="none",
            dtype=jnp.float32,
        )
        assert out.exists()
        # internal latents at padded res 128/32 = 4
        assert result.latents.shape[-2:] == (4, 4)


class TestJointAudioVideo:
    """Dev-pipeline joint AV generation end to end: denoise both modalities,
    decode audio latents through the mel VAE + vocoder, write wav
    (reference: generate.py:1330-1703, 3928-4160)."""

    def test_audio_without_decoder_still_writes_video(self, tmp_path):
        """audio=True but no audio decoder weights: the mux block is skipped,
        and the video must still be renamed from *.temp.mp4 to output_path."""
        from dataclasses import replace

        models, text = self._make_av_models()
        models = replace(models, audio_decoder_params=None)
        out_path = tmp_path / "noadec.mp4"
        result = generate_video(
            models, text, pipeline=PipelineType.DEV, num_inference_steps=1,
            height=128, width=128, num_frames=9, seed=3, audio=True,
            output_path=out_path, dtype=jnp.float32,
        )
        assert out_path.exists(), "video orphaned at .temp.mp4"
        assert not out_path.with_suffix(".temp.mp4").exists()
        assert result.video_path == out_path

    def _make_av_models(self):
        import dataclasses

        from mlx_video_tpu.config import LTXModelType, VideoVAEConfig, tiny_test_config
        from mlx_video_tpu.models.ltx.audio_vae.audio_vae import (
            AudioVAEConfig,
            init_audio_decoder,
        )
        from mlx_video_tpu.models.ltx.audio_vae.vocoder import VocoderConfig, init_vocoder
        from mlx_video_tpu.models.ltx.video_vae.decoder import (
            DecoderConfig,
            init_video_decoder,
        )
        from mlx_video_tpu.models.ltx.video_vae.encoder import init_video_encoder

        # Audio tokens are C*M = 8*16 = 128-dim at the pipeline's latent
        # geometry (AUDIO_LATENT_CHANNELS x AUDIO_MEL_BINS).
        cfg = dataclasses.replace(
            tiny_test_config(LTXModelType.AudioVideo),
            audio_in_channels=128, audio_out_channels=128,
        )
        enc_cfg = VideoVAEConfig(
            in_channels=3, out_channels=cfg.in_channels, latent_channels=cfg.in_channels,
            patch_size=4, encoder_blocks=REAL_GEOM_ENCODER_BLOCKS,
        )
        dec_cfg = DecoderConfig(
            in_channels=cfg.in_channels, base_channels=32, num_layers_per_block=1,
            num_upsamples=3, patch_size=4,
        )
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
        models = ModelBundle(
            transformer_params=init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32),
            transformer_config=cfg,
            vae_decoder_params=init_video_decoder(jax.random.key(1), dec_cfg),
            vae_decoder_config=dec_cfg,
            vae_encoder_params=init_video_encoder(jax.random.key(2), enc_cfg),
            vae_encoder_config=enc_cfg,
            audio_decoder_params=init_audio_decoder(jax.random.key(3), audio_cfg),
            audio_decoder_config=audio_cfg,
            vocoder_params=init_vocoder(jax.random.key(4), voc_cfg),
            vocoder_config=voc_cfg,
        )
        rng = np.random.default_rng(0)
        text = TextConditioning(
            video_embeddings=jnp.asarray(
                rng.normal(size=(1, 8, cfg.caption_channels)).astype(np.float32)
            ),
            video_neg_embeddings=jnp.asarray(
                rng.normal(size=(1, 8, cfg.caption_channels)).astype(np.float32)
            ),
            audio_embeddings=jnp.asarray(
                rng.normal(size=(1, 8, cfg.audio_caption_channels)).astype(np.float32)
            ),
            audio_neg_embeddings=jnp.asarray(
                rng.normal(size=(1, 8, cfg.audio_caption_channels)).astype(np.float32)
            ),
        )
        return models, text

    def test_av_generate_writes_wav(self, tmp_path):
        models, text = self._make_av_models()
        out_path = tmp_path / "av.mp4"
        result = generate_video(
            models, text, pipeline=PipelineType.DEV, num_inference_steps=2,
            height=128, width=128, num_frames=9, seed=3, audio=True,
            output_path=out_path, output_audio_path=tmp_path / "av.wav",
            dtype=jnp.float32,
        )
        assert result.audio_latents is not None
        assert result.audio_latents.shape[1] == 8  # AUDIO_LATENT_CHANNELS
        assert np.isfinite(result.audio_latents).all()
        assert (tmp_path / "av.wav").exists()
        assert out_path.exists()


class TestStage2CfgJointAudio:
    """Stage-2 CFG refinement must refine joint audio too (reference:
    generate.py:3341-3356 routes joint audio through denoise_dev_av with
    negative embeddings)."""

    def _models_and_text(self, with_audio_neg=True):
        import dataclasses

        from mlx_video_tpu.config import LTXModelType, tiny_test_config
        from mlx_video_tpu.models.ltx.video_vae.decoder import (
            DecoderConfig,
            init_video_decoder,
        )

        cfg = dataclasses.replace(
            tiny_test_config(LTXModelType.AudioVideo),
            audio_in_channels=128, audio_out_channels=128,
        )
        dec_cfg = DecoderConfig(
            in_channels=cfg.in_channels, base_channels=32, num_layers_per_block=1,
            num_upsamples=3, patch_size=4,
        )
        models = ModelBundle(
            transformer_params=init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32),
            transformer_config=cfg,
            vae_decoder_params=init_video_decoder(jax.random.key(1), dec_cfg),
            vae_decoder_config=dec_cfg,
            upsampler_params=init_latent_upsampler(
                jax.random.key(2), in_channels=cfg.in_channels, mid_channels=32, num_blocks=1
            ),
        )
        rng = np.random.default_rng(7)

        def emb(ch):
            return jnp.asarray(rng.normal(size=(1, 8, ch)).astype(np.float32))

        text = TextConditioning(
            video_embeddings=emb(cfg.caption_channels),
            video_neg_embeddings=emb(cfg.caption_channels),
            audio_embeddings=emb(cfg.audio_caption_channels),
            audio_neg_embeddings=emb(cfg.audio_caption_channels) if with_audio_neg else None,
        )
        return models, text

    def test_stage2_cfg_refines_audio(self):
        models, text = self._models_and_text()
        result = generate_video(
            models, text, pipeline=PipelineType.DISTILLED,
            height=64, width=64, num_frames=9, seed=0,
            stage1_steps=1, stage2_steps=1, stage2_cfg=True, cfg_scale=3.0,
            audio=True, audio_mode="joint",
            decode_latents_only=True, dtype=jnp.float32,
        )
        assert result.audio_latents is not None
        assert result.audio_latents.shape[1] == 8
        assert np.isfinite(result.audio_latents).all()

    def test_stage2_cfg_without_audio_neg_raises(self):
        models, text = self._models_and_text(with_audio_neg=False)
        with pytest.raises(ValueError, match="audio_neg_embeddings"):
            generate_video(
                models, text, pipeline=PipelineType.DISTILLED,
                height=64, width=64, num_frames=9, seed=0,
                stage1_steps=1, stage2_steps=1, stage2_cfg=True, cfg_scale=3.0,
                audio=True, audio_mode="joint",
                decode_latents_only=True, dtype=jnp.float32,
            )


class TestQualitySpeedDials:
    """cfg_cache_interval / attn_broadcast_interval through generate_video
    itself (the call-site policy: video-only — forced to 1 when the audio
    modality is active; see pipelines/generate.py dial resolution)."""

    def test_dev_dials_produce_finite_latents(self, models):
        result = generate_video(
            models, _text(models.transformer_config, with_neg=True),
            height=64, width=64, num_frames=9, pipeline=PipelineType.DEV,
            num_inference_steps=4, cfg_scale=3.0,
            attn_broadcast_interval=2,
            decode_latents_only=True, dtype=jnp.float32,
        )
        assert np.all(np.isfinite(result.latents))
        result = generate_video(
            models, _text(models.transformer_config, with_neg=True),
            height=64, width=64, num_frames=9, pipeline=PipelineType.DEV,
            num_inference_steps=4, cfg_scale=3.0,
            cfg_cache_interval=2,
            decode_latents_only=True, dtype=jnp.float32,
        )
        assert np.all(np.isfinite(result.latents))

    def test_distilled_pab_matches_k1_at_interval_1(self, models):
        kw = dict(
            height=64, width=64, num_frames=9, pipeline=PipelineType.DISTILLED,
            stage1_steps=2, stage2_steps=1, seed=11,
            decode_latents_only=True, dtype=jnp.float32,
        )
        base = generate_video(models, _text(models.transformer_config), **kw)
        pab1 = generate_video(
            models, _text(models.transformer_config),
            attn_broadcast_interval=1, **kw,
        )
        np.testing.assert_array_equal(base.latents, pab1.latents)

    def test_joint_audio_rejects_dials_loudly(self, tmp_path):
        """Joint audio + a caching dial must raise (matching denoise()'s
        ValueError and serve's 400) — silently dropping the dial let users
        benchmark against a configuration that was not active."""
        m = TestJointAudioVideo()
        models, text = m._make_av_models()
        with pytest.raises(ValueError, match="video-only"):
            generate_video(
                models, text, pipeline=PipelineType.DEV, num_inference_steps=3,
                height=128, width=128, num_frames=9, seed=3, audio=True,
                attn_broadcast_interval=2, cfg_cache_interval=2,
                decode_latents_only=True, dtype=jnp.float32,
            )
        # without the dials the same joint-audio run completes
        result = generate_video(
            models, text, pipeline=PipelineType.DEV, num_inference_steps=3,
            height=128, width=128, num_frames=9, seed=3, audio=True,
            decode_latents_only=True, dtype=jnp.float32,
        )
        assert np.isfinite(result.latents).all()
        assert result.audio_latents is not None
        assert np.isfinite(result.audio_latents).all()

    def test_teacache_through_generate(self, models):
        """teacache_threshold flows through both distilled stages; a tiny
        threshold (every step full) reproduces the plain run exactly."""
        kw = dict(
            height=64, width=64, num_frames=9, pipeline=PipelineType.DISTILLED,
            stage1_steps=2, stage2_steps=1, seed=11,
            decode_latents_only=True, dtype=jnp.float32,
        )
        base = generate_video(models, _text(models.transformer_config), **kw)
        tc = generate_video(
            models, _text(models.transformer_config),
            teacache_threshold=1e-9, **kw,
        )
        np.testing.assert_allclose(tc.latents, base.latents, atol=1e-5)
        lossy = generate_video(
            models, _text(models.transformer_config),
            teacache_threshold=1e9, **kw,
        )
        assert np.isfinite(lossy.latents).all()
        assert not np.allclose(lossy.latents, base.latents, atol=1e-5)

    def test_joint_audio_rejects_teacache(self):
        m = TestJointAudioVideo()
        models, text = m._make_av_models()
        with pytest.raises(ValueError, match="video-only"):
            generate_video(
                models, text, pipeline=PipelineType.DEV, num_inference_steps=3,
                height=128, width=128, num_frames=9, seed=3, audio=True,
                teacache_threshold=0.1,
                decode_latents_only=True, dtype=jnp.float32,
            )


class TestBatchedGeneration:
    """num_videos > 1 (new capability vs the reference's single-video
    pipeline): N videos share every denoise scan; video i derives its noise
    from jax.random.key(seed + i) with the single-run split schedule, so a
    batched run consumes bit-identical noise to N independent runs — outputs
    match to fp32 tolerance (batched matmuls reduce in a different order, so
    exact bit equality across batch sizes is not attainable)."""

    def test_distilled_batched_matches_singles(self, models):
        text = _text(models.transformer_config)
        kw = dict(
            height=64, width=64, num_frames=9, pipeline=PipelineType.DISTILLED,
            stage1_steps=2, stage2_steps=1, decode_latents_only=True,
            dtype=jnp.float32,
        )
        batched = generate_video(models, text, seed=5, num_videos=2, **kw)
        single0 = generate_video(models, text, seed=5, **kw)
        single1 = generate_video(models, text, seed=6, **kw)
        assert batched.latents.shape[0] == 2
        np.testing.assert_allclose(
            batched.latents[0], single0.latents[0], rtol=2e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            batched.latents[1], single1.latents[0], rtol=2e-4, atol=1e-5
        )

    def test_preview_fires_for_every_video_in_batch(self, models, tmp_path, monkeypatch):
        """The preview throttle resets per video: previews previously
        stopped after the first video of a batch (frame indices restart at
        0 while the throttle kept the last video's high-water mark)."""
        from mlx_video_tpu.utils.profiling import add_event_sink, remove_event_sink

        monkeypatch.setenv("MLX_VIDEO_PREVIEW_EVERY", "4")
        events = []
        add_event_sink(events.append)
        try:
            generate_video(
                models, _text(models.transformer_config), seed=2, num_videos=2,
                height=64, width=64, num_frames=9, pipeline=PipelineType.DISTILLED,
                stage1_steps=1, stage2_steps=1, tiling="none",
                output_path=tmp_path / "p.mp4", dtype=jnp.float32,
            )
        finally:
            remove_event_sink(events.append)
        previews = [e for e in events if e.get("kind") == "preview"]
        # decode emits per-video progress; both videos must yield previews
        by_video = {e.get("video") for e in events if e.get("kind") == "progress"}
        assert by_video == {0, 1}
        assert len(previews) >= 2, [e.get("kind") for e in events]

    def test_dev_cfg_batched_finite(self, models):
        text = _text(models.transformer_config, with_neg=True)
        result = generate_video(
            models, text, seed=1, num_videos=3,
            height=64, width=64, num_frames=9, pipeline=PipelineType.DEV,
            num_inference_steps=2, cfg_scale=3.0,
            decode_latents_only=True, dtype=jnp.float32,
        )
        assert result.latents.shape[0] == 3
        assert np.all(np.isfinite(result.latents))
        # broadcast prompt -> distinct noise -> distinct videos
        assert np.abs(result.latents[0] - result.latents[1]).max() > 0

    def test_batched_writes_one_mp4_per_video(self, models, tmp_path):
        text = _text(models.transformer_config)
        out = tmp_path / "batch.mp4"
        result = generate_video(
            models, text, seed=2, num_videos=2,
            height=64, width=64, num_frames=9, pipeline=PipelineType.DISTILLED,
            stage1_steps=1, stage2_steps=1, tiling="none",
            output_path=out, dtype=jnp.float32,
        )
        assert result.video_paths is not None and len(result.video_paths) == 2
        for p in result.video_paths:
            assert p.exists() and p.stat().st_size > 0
        assert result.video_path == result.video_paths[0]
        assert result.video.shape[0] == 2

    def test_seeds_only_api_and_empty_seeds(self, models):
        """generate_video(seeds=[...]) without num_videos derives the batch
        BEFORE the text broadcast (regression: batch-1 embeddings used to
        reach batch-N latents and crash cross-attention); empty seeds raise
        the designed error, not IndexError."""
        text = _text(models.transformer_config)
        kw = dict(
            height=64, width=64, num_frames=9, pipeline=PipelineType.DISTILLED,
            stage1_steps=1, stage2_steps=1, decode_latents_only=True,
            dtype=jnp.float32,
        )
        out = generate_video(models, text, seeds=[5, 11], **kw)
        assert out.latents.shape[0] == 2
        single = generate_video(models, text, seed=11, **kw)
        np.testing.assert_allclose(out.latents[1], single.latents[0], rtol=2e-4, atol=1e-5)
        with pytest.raises(ValueError, match="non-empty"):
            generate_video(models, text, seeds=[], **kw)

    def test_batched_decode_uses_per_video_noise(self, models, tmp_path):
        """The timestep-conditioned decoder injects noise: batched video i
        must decode with seed-i's key, so its PIXELS (not just latents)
        match an independent run regardless of batching."""
        text = _text(models.transformer_config)
        kw = dict(
            height=64, width=64, num_frames=9, pipeline=PipelineType.DISTILLED,
            stage1_steps=1, stage2_steps=1, tiling="none", dtype=jnp.float32,
        )
        batched = generate_video(
            models, text, seed=4, num_videos=2, output_path=tmp_path / "b.mp4", **kw
        )
        single1 = generate_video(
            models, text, seed=5, output_path=tmp_path / "s.mp4", **kw
        )
        np.testing.assert_allclose(
            batched.video[1], single1.video[0], rtol=5e-4, atol=5e-4
        )

    def test_batched_on_data_parallel_mesh(self, models):
        """num_videos=2 over a (data=2, fsdp=2, tensor=2) mesh: the video
        batch rides the data axis (DP inference — the multi-chip batch
        serving shape) and must reproduce the single-device batched run."""
        from dataclasses import replace

        from mlx_video_tpu.parallel.mesh import create_mesh
        from mlx_video_tpu.parallel.sharding import shard_params

        text = _text(models.transformer_config)
        kw = dict(
            height=64, width=64, num_frames=9, pipeline=PipelineType.DISTILLED,
            stage1_steps=2, stage2_steps=1, decode_latents_only=True,
            dtype=jnp.float32, seed=9, num_videos=2,
        )
        ref = generate_video(models, text, **kw)
        mesh = create_mesh((2, 2, 2))
        sharded = replace(
            models, transformer_params=shard_params(models.transformer_params, mesh)
        )
        out = generate_video(sharded, text, mesh=mesh, **kw)
        np.testing.assert_allclose(out.latents, ref.latents, atol=5e-4)

    def test_batched_rejects_audio_and_conditioning(self, models):
        text = _text(models.transformer_config)
        with pytest.raises(ValueError, match="audio"):
            generate_video(
                models, text, num_videos=2, audio=True,
                height=64, width=64, num_frames=9, decode_latents_only=True,
            )
        with pytest.raises(ValueError, match="conditioning"):
            generate_video(
                models, text, num_videos=2, images=[("x.png", 0, 1.0)],
                height=64, width=64, num_frames=9, decode_latents_only=True,
            )
