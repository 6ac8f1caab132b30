"""Parity package tests: ltx_core components, ltx_pipelines, ltx_trainer shims."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ltx_core.components import (
    BetaScheduler,
    CFGGuider,
    CFGStarRescalingGuider,
    EulerDiffusionStep,
    GaussianNoiser,
    LinearQuadraticScheduler,
    LTX2Scheduler,
    LtxAPGGuider,
    STGGuider,
    VideoLatentPatchifier,
    get_pixel_coords,
)
from ltx_core.guidance.perturbations import (
    BatchedPerturbationConfig,
    Perturbation,
    PerturbationConfig,
    PerturbationType,
)
from ltx_core.tools import AudioLatentTools, VideoLatentTools
from ltx_core.types import (
    AudioLatentShape,
    SpatioTemporalScaleFactors,
    VideoLatentShape,
    VideoPixelShape,
)
from ltx_core.utils import to_denoised, to_velocity


class TestGuiders:
    def test_cfg_matches_engine(self, rng):
        cond = jnp.asarray(rng.normal(size=(1, 8, 4)).astype(np.float32))
        uncond = jnp.asarray(rng.normal(size=(1, 8, 4)).astype(np.float32))
        g = CFGGuider(scale=4.0)
        np.testing.assert_allclose(
            np.asarray(g.delta(cond, uncond)), 3.0 * np.asarray(cond - uncond), atol=1e-6
        )
        assert g.enabled() and not CFGGuider(1.0).enabled()

    def test_cfg_star_projects(self, rng):
        cond = jnp.asarray(rng.normal(size=(2, 4, 4)).astype(np.float32))
        g = CFGStarRescalingGuider(scale=4.0)
        # uncond == cond => rescaled_neg == cond => delta == 0
        np.testing.assert_allclose(np.asarray(g.delta(cond, cond)), 0.0, atol=1e-5)

    def test_stg(self, rng):
        a = jnp.asarray(rng.normal(size=(1, 4)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(1, 4)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(STGGuider(2.0).delta(a, b)), 2.0 * np.asarray(a - b), atol=1e-6
        )

    def test_apg_orthogonal_decomposition(self, rng):
        cond = jnp.asarray(rng.normal(size=(1, 2, 3, 4)).astype(np.float32))
        uncond = jnp.asarray(rng.normal(size=(1, 2, 3, 4)).astype(np.float32))
        # eta=1, no threshold => plain CFG delta
        g = LtxAPGGuider(scale=4.0, eta=1.0, norm_threshold=0.0)
        np.testing.assert_allclose(
            np.asarray(g.delta(cond, uncond)), 3.0 * np.asarray(cond - uncond), atol=1e-4
        )
        # eta=0 removes the parallel component
        g0 = LtxAPGGuider(scale=4.0, eta=0.0, norm_threshold=0.0)
        delta = np.asarray(g0.delta(cond, uncond)).reshape(1, -1)
        c = np.asarray(cond).reshape(1, -1)
        assert abs(float((delta @ c.T).item())) / (np.linalg.norm(delta) * np.linalg.norm(c)) < 1e-4


class TestSchedulers:
    def test_ltx2_matches_engine(self):
        from mlx_video_tpu.pipelines.schedulers import ltx2_scheduler

        latent = jnp.zeros((1, 128, 5, 16, 16))
        sched = LTX2Scheduler().execute(20, latent=latent)
        np.testing.assert_allclose(sched, ltx2_scheduler(20, num_tokens=5 * 16 * 16), atol=1e-7)

    def test_linear_quadratic(self):
        s = LinearQuadraticScheduler().execute(10)
        assert s.shape == (11,)
        assert s[0] == 1.0 and s[-1] == 0.0
        assert np.all(np.diff(s) <= 1e-6)

    def test_beta(self):
        s = BetaScheduler().execute(10)
        assert s[-1] == 0.0 and s[0] > 0.9
        assert np.all(np.diff(s) < 0)


class TestDiffusionStep:
    def test_euler_step(self, rng):
        sample = jnp.asarray(rng.normal(size=(1, 4, 4)).astype(np.float32))
        denoised = jnp.asarray(rng.normal(size=(1, 4, 4)).astype(np.float32))
        sigmas = jnp.asarray([1.0, 0.5])
        out = EulerDiffusionStep().execute(sample, denoised, sigmas, 0)
        # euler: x + v*dt with v=(x-x0)/sigma, dt=-0.5 => x0 + 0.5*(x - x0)
        expected = np.asarray(denoised) + 0.5 * (np.asarray(sample) - np.asarray(denoised))
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)

    def test_velocity_denoised_inverse(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 3)).astype(np.float32))
        x0 = jnp.asarray(rng.normal(size=(2, 3)).astype(np.float32))
        v = to_velocity(x, x0, 0.7)
        np.testing.assert_allclose(np.asarray(to_denoised(x, v, 0.7)), np.asarray(x0), atol=1e-5)


class TestPatchifiers:
    def test_video_round_trip(self, rng):
        shape = VideoLatentShape(1, 8, 2, 4, 4)
        p = VideoLatentPatchifier(patch_size=1)
        lat = jnp.asarray(rng.normal(size=shape.to_shape()).astype(np.float32))
        tokens = p.patchify(lat)
        assert tokens.shape == (1, 32, 8)
        np.testing.assert_allclose(np.asarray(p.unpatchify(tokens, shape)), np.asarray(lat))
        assert p.get_token_count(shape) == 32

    def test_grid_bounds_match_engine_positions(self):
        from mlx_video_tpu.pipelines.positions import create_position_grid

        shape = VideoLatentShape(1, 128, 3, 4, 5)
        p = VideoLatentPatchifier(patch_size=1)
        coords = p.get_patch_grid_bounds(shape)
        pixel = get_pixel_coords(coords, SpatioTemporalScaleFactors.default(), causal_fix=True)
        pixel = pixel.at[:, 0].divide(24.0)
        ref = create_position_grid(1, 3, 4, 5, fps=24.0)
        np.testing.assert_allclose(np.asarray(pixel), ref, atol=1e-5)

    def test_latent_shape_math(self):
        px = VideoPixelShape(batch=1, frames=33, height=512, width=768, fps=24)
        lat = VideoLatentShape.from_pixel_shape(px)
        assert lat == VideoLatentShape(1, 128, 5, 16, 24)


class TestTools:
    def test_video_tools_state(self):
        shape = VideoLatentShape(1, 8, 2, 4, 4)
        tools = VideoLatentTools(target_shape=shape)
        state = tools.create_initial_state(key=jax.random.key(0))
        assert state.latent.shape == shape.to_shape()
        assert state.positions.shape == (1, 3, 32, 2)
        patched = tools.patchify(state)
        assert patched.latent.shape == (1, 32, 8)
        restored = tools.unpatchify(patched)
        np.testing.assert_allclose(np.asarray(restored.latent), np.asarray(state.latent))

    def test_audio_tools_state(self):
        shape = AudioLatentShape(1, 8, 6, 16)
        tools = AudioLatentTools(target_shape=shape)
        state = tools.create_initial_state(key=jax.random.key(0))
        assert state.latent.shape == (1, 8, 6, 16)
        patched = tools.patchify(state)
        assert patched.latent.shape == (1, 6, 128)


class TestPerturbations:
    def test_masks(self):
        cfg = BatchedPerturbationConfig(
            [
                PerturbationConfig([Perturbation(PerturbationType.SKIP_VIDEO_SELF_ATTN, [1, 2])]),
                PerturbationConfig.empty(),
            ]
        )
        mask = np.asarray(cfg.mask(PerturbationType.SKIP_VIDEO_SELF_ATTN, 1))
        np.testing.assert_array_equal(mask, [0.0, 1.0])
        assert cfg.any_in_batch(PerturbationType.SKIP_VIDEO_SELF_ATTN, 2)
        assert not cfg.any_in_batch(PerturbationType.SKIP_VIDEO_SELF_ATTN, 5)
        assert not cfg.all_in_batch(PerturbationType.SKIP_VIDEO_SELF_ATTN, 1)


class TestHelpers:
    def test_euler_loop_with_fake_denoiser(self, rng):
        from dataclasses import replace

        from ltx_core.types import LatentState
        from ltx_pipelines.utils.helpers import euler_denoising_loop

        v_lat = jnp.asarray(rng.normal(size=(1, 8, 4)).astype(np.float32))
        a_lat = jnp.asarray(rng.normal(size=(1, 4, 4)).astype(np.float32))

        def mk(lat):
            return LatentState(
                latent=lat, clean_latent=jnp.zeros_like(lat),
                denoise_mask=jnp.ones_like(lat[..., :1]),
            )

        def fake_denoise(vs, as_, sigmas, idx):
            return vs.latent * 0.5, as_.latent * 0.5

        sigmas = np.array([1.0, 0.5, 0.0], dtype=np.float32)
        v_out, a_out = euler_denoising_loop(sigmas, mk(v_lat), mk(a_lat), EulerDiffusionStep(), fake_denoise)
        assert np.all(np.isfinite(np.asarray(v_out.latent)))
        assert v_out.latent.shape == v_lat.shape

    def test_gradient_estimating_loop(self, rng):
        from ltx_core.types import LatentState
        from ltx_pipelines.utils.helpers import gradient_estimating_euler_denoising_loop

        lat = jnp.asarray(rng.normal(size=(1, 8, 4)).astype(np.float32))

        def mk(lat):
            return LatentState(
                latent=lat, clean_latent=jnp.zeros_like(lat),
                denoise_mask=jnp.ones_like(lat[..., :1]),
            )

        def fake_denoise(vs, as_, sigmas, idx):
            return vs.latent * 0.9, as_.latent * 0.9

        sigmas = np.array([1.0, 0.6, 0.3, 0.0], dtype=np.float32)
        v_out, _ = gradient_estimating_euler_denoising_loop(
            sigmas, mk(lat), mk(lat), EulerDiffusionStep(), fake_denoise
        )
        assert np.all(np.isfinite(np.asarray(v_out.latent)))

    def test_assert_resolution(self):
        from ltx_pipelines.utils.helpers import assert_resolution

        assert_resolution(512, 768, is_two_stage=True)
        with pytest.raises(ValueError):
            assert_resolution(500, 768, is_two_stage=False)


class TestWrappersAndShims:
    def test_pipeline_wrappers_construct(self):
        from ltx_pipelines import (
            DistilledPipeline,
            ICLoraPipeline,
            KeyframeInterpolationPipeline,
            TI2VidOneStage,
            TI2VidTwoStages,
        )

        assert DistilledPipeline(height=64).height == 64
        assert TI2VidOneStage().steps == 40
        assert TI2VidTwoStages().stage1_steps == 8
        assert ICLoraPipeline().tiling == "auto"
        assert KeyframeInterpolationPipeline().num_frames == 33

    def test_trainer_shims_import(self):
        import ltx_trainer
        import ltx_trainer.config
        import ltx_trainer.datasets
        import ltx_trainer.progress
        import ltx_trainer.timestep_samplers
        import ltx_trainer.training_strategies
        import ltx_trainer.validation_sampler

        assert ltx_trainer.TrainingConfig is not None

    def test_scripts_importable(self):
        from ltx_trainer.scripts import (  # noqa: F401
            caption_videos,
            compute_reference,
            decode_latents,
            process_captions,
            process_dataset,
            process_videos,
            split_scenes,
        )

    def test_scene_cut_detection(self, tmp_path, rng):
        import cv2

        from ltx_trainer.scripts.split_scenes import detect_scene_cuts

        path = tmp_path / "scene.mp4"
        w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 24, (64, 64))
        # scene 1: black frames; scene 2: white noise frames
        for _ in range(20):
            w.write(np.zeros((64, 64, 3), np.uint8))
        for _ in range(20):
            w.write((rng.uniform(size=(64, 64, 3)) * 255).astype(np.uint8))
        w.release()
        cuts = detect_scene_cuts(path, threshold=0.5)
        assert len(cuts) >= 3  # start, the cut, end
        assert any(18 <= c <= 22 for c in cuts[1:-1])

    def test_bridge_normalizers(self):
        from ltx_pipelines.bridge import normalize_images, normalize_loras

        assert normalize_loras(["a.st", ("b.st", 0.5)]) == [("a.st", 1.0), ("b.st", 0.5)]
        assert normalize_images([("img.png", 3, 0.9), "x.png"]) == [
            ("img.png", 3, 0.9), ("x.png", 0, 1.0),
        ]


class TestDeepImportPaths:
    """Every deep import path a reference user might use must resolve
    (reference module tree under ltx_core/ltx_pipelines/ltx_trainer)."""

    PATHS = [
        "ltx_core.loader.registry", "ltx_core.loader.primitives",
        "ltx_core.loader.fuse_loras", "ltx_core.loader.sft_loader",
        "ltx_core.loader.single_gpu_model_builder",
        "ltx_core.loader.kernels", "ltx_core.loader.module_ops",
        "ltx_core.loader.sd_ops",
        "ltx_core.model.model_protocol", "ltx_core.model.common",
        "ltx_core.model.common.normalization",
        "ltx_core.model.transformer.adaln",
        "ltx_core.model.transformer.attention",
        "ltx_core.model.transformer.feed_forward",
        "ltx_core.model.transformer.gelu_approx",
        "ltx_core.model.transformer.modality",
        "ltx_core.model.transformer.model",
        "ltx_core.model.transformer.model_configurator",
        "ltx_core.model.transformer.rope",
        "ltx_core.model.transformer.text_projection",
        "ltx_core.model.transformer.timestep_embedding",
        "ltx_core.model.transformer.transformer",
        "ltx_core.model.transformer.transformer_args",
        "ltx_core.model.video_vae.convolution",
        "ltx_core.model.video_vae.decoder", "ltx_core.model.video_vae.encoder",
        "ltx_core.model.video_vae.enums",
        "ltx_core.model.video_vae.model_configurator",
        "ltx_core.model.video_vae.normalization",
        "ltx_core.model.video_vae.ops", "ltx_core.model.video_vae.resnet",
        "ltx_core.model.video_vae.sampling", "ltx_core.model.video_vae.tiling",
        "ltx_core.model.video_vae.video_vae",
        "ltx_core.model.upsampler.blur_downsample",
        "ltx_core.model.upsampler.model",
        "ltx_core.model.upsampler.model_configurator",
        "ltx_core.model.upsampler.pixel_shuffle",
        "ltx_core.model.upsampler.res_block",
        "ltx_core.model.upsampler.spatial_rational_resampler",
        "ltx_core.model.audio_vae.attention",
        "ltx_core.model.audio_vae.audio_vae",
        "ltx_core.model.audio_vae.causal_conv_2d",
        "ltx_core.model.audio_vae.causality_axis",
        "ltx_core.model.audio_vae.downsample",
        "ltx_core.model.audio_vae.model_configurator",
        "ltx_core.model.audio_vae.normalization",
        "ltx_core.model.audio_vae.ops", "ltx_core.model.audio_vae.resnet",
        "ltx_core.model.audio_vae.upsample", "ltx_core.model.audio_vae.vocoder",
        "ltx_core.conditioning.exceptions", "ltx_core.conditioning.item",
        "ltx_core.conditioning.types", "ltx_core.conditioning.types.latent_cond",
        "ltx_core.conditioning.types.keyframe_cond",
        "ltx_core.text_encoders.gemma", "ltx_core.text_encoders.gemma.tokenizer",
        "ltx_core.text_encoders.gemma.feature_extractor",
        "ltx_core.text_encoders.gemma.embeddings_connector",
        "ltx_core.text_encoders.gemma.encoders.av_encoder",
        "ltx_core.text_encoders.gemma.encoders.base_encoder",
        "ltx_core.text_encoders.gemma.encoders.video_only_encoder",
        "ltx_trainer.training_strategies.base_strategy",
        "ltx_trainer.training_strategies.text_to_video",
        "ltx_trainer.training_strategies.video_to_video",
        "ltx_trainer.gemma_8bit",
    ]

    def test_deep_modules_import(self):
        import importlib

        for mod in self.PATHS:
            importlib.import_module(mod)

    def test_reference_names_resolve(self):
        from ltx_core.conditioning import ConditioningItem  # noqa: F401
        from ltx_core.components.schedulers import (  # noqa: F401
            BASE_SHIFT_ANCHOR, SchedulerProtocol,
        )
        from ltx_core.loader.registry import DummyRegistry, Registry
        from ltx_core.model import ModelConfigurator, ModelType  # noqa: F401
        from ltx_core.tools import LatentTools, Patchifier  # noqa: F401
        from ltx_pipelines import ModelLedger, TI2VidOneStagePipeline  # noqa: F401
        from ltx_pipelines.utils.constants import (  # noqa: F401
            DEFAULT_IMAGE_CRF, DEFAULT_LORA_STRENGTH, DEFAULT_NEGATIVE_PROMPT,
        )

        r = Registry()
        r.register("x", 1)
        assert r.get("x") == 1 and DummyRegistry().get("missing") is None

    def test_pipeline_mains_exist(self):
        import ltx_pipelines.distilled as d
        import ltx_pipelines.ic_lora as i
        import ltx_pipelines.keyframe_interpolation as k
        import ltx_pipelines.ti2vid_one_stage as o
        import ltx_pipelines.ti2vid_two_stages as t

        for mod in (d, i, k, o, t):
            assert callable(mod.main)

    def test_fuse_loras_merges(self, tmp_path, rng):
        """ltx_core.loader.fuse_loras actually merges (the reference raised)."""
        import jax

        from ltx_core.loader.fuse_loras import fuse_loras
        from mlx_video_tpu.config import LTXModelType, tiny_test_config
        from mlx_video_tpu.io.safetensors import save_safetensors
        from mlx_video_tpu.models.ltx.model import init_ltx_params

        cfg = tiny_test_config(LTXModelType.VideoOnly)
        params = init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32)
        inner = cfg.inner_dim
        a = rng.normal(size=(2, inner)).astype(np.float32)  # (r, in)
        b = rng.normal(size=(inner, 2)).astype(np.float32)  # (out, r)
        path = tmp_path / "l.safetensors"
        save_safetensors(
            path,
            {
                "transformer_blocks.0.attn1.to_q.lora_A.weight": a,
                "transformer_blocks.0.attn1.to_q.lora_B.weight": b,
            },
        )
        w0 = np.asarray(params["blocks"]["attn1"]["to_q"]["weight"][0])
        merged = fuse_loras(params, [(path, 2.0)])
        expected = w0 + 2.0 * (b @ a).T  # stored layout is (in, out)
        np.testing.assert_allclose(
            np.asarray(merged["blocks"]["attn1"]["to_q"]["weight"][0]),
            expected,
            atol=1e-4,
        )


class TestClassAdapters:
    """Reference class names over the functional engine: LTXModel/X0Model,
    VideoEncoder/Decoder, AudioEncoder/Decoder/Vocoder, LatentUpsampler,
    trainer samplers/strategies/captioner names."""

    def test_ltx_model_and_x0(self, rng):
        from ltx_core.model.transformer import LTXModel, X0Model
        from mlx_video_tpu.config import LTXModelType, tiny_test_config
        from mlx_video_tpu.models.ltx.model import Modality, ltx_apply, to_denoised
        from mlx_video_tpu.pipelines.positions import create_position_grid

        cfg = tiny_test_config(LTXModelType.VideoOnly)
        model = LTXModel(cfg, key=jax.random.key(0), dtype=jnp.float32)
        b, f, h, w = 1, 2, 4, 4
        video = Modality(
            latent=jnp.asarray(rng.normal(size=(b, f * h * w, cfg.in_channels)).astype(np.float32)),
            timesteps=jnp.full((b, f * h * w), 0.5),
            context=jnp.asarray(rng.normal(size=(b, 8, cfg.caption_channels)).astype(np.float32)),
            positions=jnp.asarray(create_position_grid(b, f, h, w)),
        )
        v_vel, _ = model(video=video)
        ref, _ = ltx_apply(model.params, cfg, video=video)
        np.testing.assert_allclose(np.asarray(v_vel), np.asarray(ref), atol=1e-6)

        x0, _ = X0Model(model)(video=video)
        np.testing.assert_allclose(
            np.asarray(x0),
            np.asarray(to_denoised(video.latent, ref, video.timesteps[..., None])),
            atol=1e-6,
        )

    def test_vae_classes(self, rng):
        from ltx_core.model.video_vae import VideoDecoder, VideoEncoder
        from mlx_video_tpu.config import VideoVAEConfig
        from mlx_video_tpu.models.ltx.video_vae.decoder import DecoderConfig

        enc = VideoEncoder(VideoVAEConfig(), key=jax.random.key(1))
        clip = jnp.asarray(rng.uniform(-1, 1, size=(1, 3, 9, 64, 64)).astype(np.float32))
        lat = enc(clip)
        assert lat.shape[1] == 128

        dec = VideoDecoder(
            DecoderConfig(in_channels=16, base_channels=32, num_layers_per_block=1, num_upsamples=2),
            key=jax.random.key(2),
        )
        px = dec(jnp.asarray(rng.normal(size=(1, 16, 2, 4, 4)).astype(np.float32)),
                 timestep=jnp.array([0.05]))
        assert px.shape[1] == 3 and np.isfinite(np.asarray(px)).all()

    def test_audio_classes(self, rng):
        from ltx_core.model.audio_vae import AudioDecoder, AudioEncoder, Vocoder
        from mlx_video_tpu.models.ltx.audio_vae.audio_vae import AudioVAEConfig
        from mlx_video_tpu.models.ltx.audio_vae.vocoder import VocoderConfig

        cfg = AudioVAEConfig(
            ch=16, ch_mult=(1, 2, 4), num_res_blocks=1, in_channels=2, out_ch=2,
            z_channels=4, mel_bins=16, resolution=64,
            decoder_attn_resolutions=(), mid_block_add_attention=True,
        )
        enc = AudioEncoder(cfg, key=jax.random.key(0))
        mel = jnp.asarray(rng.normal(size=(1, 2, 12, 16)).astype(np.float32))
        lat = enc(mel)
        dec = AudioDecoder(cfg, key=jax.random.key(1))
        spec = dec(lat)
        assert np.isfinite(np.asarray(spec)).all()

        voc = Vocoder(
            VocoderConfig(
                upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
                resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
                upsample_initial_channel=32, stereo=True, mel_in_channels=8,
            ),
            key=jax.random.key(2),
        )
        wav = voc(jnp.asarray(rng.normal(size=(1, 2, 10, 4)).astype(np.float32)))
        assert np.isfinite(np.asarray(wav)).all()

    def test_upsampler_class(self, rng):
        from ltx_core.model.upsampler import LatentUpsampler

        ups = LatentUpsampler(key=jax.random.key(0), in_channels=16, mid_channels=32, num_blocks=1)
        lat = jnp.asarray(rng.normal(size=(1, 16, 2, 4, 4)).astype(np.float32))
        out = ups(lat)
        assert out.shape == (1, 16, 2, 8, 8)

    def test_trainer_parity_names(self):
        from ltx_trainer.captioning import Captioner, CaptionConfig, MlxCaptioner  # noqa: F401
        from ltx_trainer.timestep_samplers import (
            ShiftedLogitNormalSampler,
            UniformSampler,
            get_timestep_sampler,
        )
        from ltx_trainer.trainer import MLXTrainer, Trainer, TrainingConfig  # noqa: F401
        from ltx_trainer.training_strategies.base_strategy import TrainingStrategy
        from ltx_trainer.training_strategies.text_to_video import TextToVideoStrategy
        from ltx_trainer.training_strategies.video_to_video import VideoToVideoStrategy

        assert MLXTrainer is Trainer
        lat = jnp.zeros((2, 10, 4))
        s = get_timestep_sampler("shifted_logit_normal", std=0.5)
        assert isinstance(s, ShiftedLogitNormalSampler)
        sig = s.sample_for(lat)
        assert sig.shape == (2, 1, 1) and (np.asarray(sig) > 0).all()
        assert UniformSampler().sample_for(lat).shape == (2, 1, 1)

        t2v = TextToVideoStrategy(TrainingConfig(with_audio=True))
        assert t2v.requires_audio and "audio_latents" in t2v.get_data_sources()
        v2v = VideoToVideoStrategy(TrainingConfig())
        assert "reference_latents" in v2v.get_data_sources()
        assert isinstance(t2v, TrainingStrategy)


class TestMediaIO:
    """ltx_pipelines.utils.media_io surface (reference: media_io.py:16-299)."""

    def test_resize_and_center_crop_layout(self):
        from ltx_pipelines.utils import media_io

        img = np.random.default_rng(0).uniform(0, 255, (30, 50, 3)).astype(np.float32)
        out = media_io.resize_and_center_crop(img, 16, 16)
        assert out.shape == (1, 3, 1, 16, 16)
        vid = np.random.default_rng(1).uniform(0, 255, (4, 30, 50, 3)).astype(np.float32)
        out = media_io.resize_and_center_crop(vid, 16, 24)
        assert out.shape == (1, 3, 4, 16, 24)
        with pytest.raises(ValueError):
            media_io.resize_and_center_crop(np.zeros((3, 4)), 8, 8)

    def test_resize_aspect_ratio_preserving(self):
        from ltx_pipelines.utils import media_io

        img = np.zeros((30, 60, 3), np.float32)
        out = media_io.resize_aspect_ratio_preserving(img, 20)
        assert out.shape == (10, 20, 3)

    def test_normalize_latent_range(self):
        from ltx_pipelines.utils import media_io

        x = np.array([0.0, 127.5, 255.0])
        out = np.asarray(media_io.normalize_latent(x, jnp.float32))
        np.testing.assert_allclose(out, [-1.0, 0.0, 1.0], atol=1e-6)

    def test_encode_video_chunks_and_decode(self, tmp_path):
        from ltx_pipelines.utils import media_io

        rng = np.random.default_rng(0)
        chunks = [rng.integers(0, 255, (3, 32, 32, 3), dtype=np.uint8) for _ in range(2)]
        out = tmp_path / "vid.mp4"
        media_io.encode_video(iter(chunks), 8.0, None, None, str(out), 2)
        assert out.exists() and out.stat().st_size > 0
        frames = list(media_io.decode_video_from_file(str(out), frame_cap=4))
        assert len(frames) == 4 and frames[0].shape == (1, 32, 32, 3)

    def test_encode_video_plain_list_and_empty(self, tmp_path):
        from ltx_pipelines.utils import media_io

        rng = np.random.default_rng(0)
        chunks = [rng.integers(0, 255, (2, 32, 32, 3), dtype=np.uint8) for _ in range(2)]
        out = tmp_path / "list.mp4"
        media_io.encode_video(chunks, 8.0, None, None, str(out), 2)  # plain list
        assert out.exists() and out.stat().st_size > 0
        with pytest.raises(ValueError, match="no frames"):
            media_io.encode_video(iter([]), 8.0, None, None, str(tmp_path / "e.mp4"), 0)

    def test_decode_image_grayscale(self, tmp_path):
        from PIL import Image

        from ltx_pipelines.utils import media_io

        p = tmp_path / "gray.png"
        Image.fromarray(np.zeros((10, 20), dtype=np.uint8), mode="L").save(p)
        out = media_io.decode_image(str(p))
        assert out.shape == (10, 20, 3)

    def test_encode_video_with_audio_track(self, tmp_path):
        from ltx_pipelines.utils import media_io

        rng = np.random.default_rng(0)
        video = rng.integers(0, 255, (4, 32, 32, 3), dtype=np.uint8)
        audio = rng.uniform(-0.5, 0.5, (2400, 2)).astype(np.float32)
        out = tmp_path / "av.mp4"
        media_io.encode_video(video, 8.0, audio, 24000, str(out), 1)
        # ffmpeg is absent in this environment: mux falls back to video-only,
        # but the container must exist either way.
        assert out.exists() and out.stat().st_size > 0

    def test_wav_roundtrip(self, tmp_path):
        from ltx_pipelines.utils import media_io

        rng = np.random.default_rng(0)
        audio = rng.uniform(-0.5, 0.5, (1000, 2)).astype(np.float32)
        wav = tmp_path / "a.wav"
        media_io._write_wav(str(wav), audio, 16000)
        back = np.asarray(media_io.decode_audio_from_file(str(wav)))
        assert back.shape == (1000, 2)
        np.testing.assert_allclose(back, audio, atol=1e-3)

    def test_wav_channel_layouts(self, tmp_path):
        from ltx_pipelines.utils import media_io

        wav = tmp_path / "m.wav"
        media_io._write_wav(str(wav), np.zeros((2, 500), np.float32), 16000)  # (2, N)
        assert np.asarray(media_io.decode_audio_from_file(str(wav))).shape == (500, 2)
        media_io._write_wav(str(wav), np.zeros((500,), np.float32), 16000)  # mono
        assert np.asarray(media_io.decode_audio_from_file(str(wav))).shape == (500, 2)

    def test_preprocess_crf_zero_is_identity(self):
        from ltx_pipelines.utils import media_io

        img = np.random.default_rng(0).integers(0, 255, (32, 32, 3)).astype(np.uint8)
        out = media_io.preprocess(img, crf=0)
        np.testing.assert_array_equal(out, img)

    def test_preprocess_roundtrip_shape(self):
        from ltx_pipelines.utils import media_io

        img = np.random.default_rng(0).integers(0, 255, (33, 35, 3)).astype(np.uint8)
        out = media_io.preprocess(img, crf=33)
        # crf round-trip crops to even dims (reference: media_io.py:268-270)
        assert out.shape[2] == 3 and out.shape[0] in (32, 33) and out.shape[1] in (34, 35)

    def test_load_image_conditioning(self, tmp_path):
        from PIL import Image

        from ltx_pipelines.utils import media_io

        img_path = tmp_path / "img.png"
        Image.fromarray(
            np.random.default_rng(0).integers(0, 255, (40, 40, 3), dtype=np.uint8).astype(np.uint8)
        ).save(img_path)
        out = media_io.load_image_conditioning(str(img_path), 32, 32, jnp.float32)
        assert out.shape == (1, 3, 1, 32, 32)
        assert float(jnp.max(jnp.abs(out))) <= 1.0 + 1e-6


class TestArgsParity:
    """Flag-for-flag parity of the reference parser builders
    (reference: ltx_pipelines/utils/args.py:81-277). The expected table is
    pinned FROM the reference source: (flag, nargs, required, default)."""

    BASIC = {
        "--checkpoint-path": (None, True, None),
        "--gemma-root": (None, True, None),
        "--prompt": (None, True, None),
        "--output-path": (None, True, None),
        "--seed": (None, False, 10),
        "--height": (None, False, 512),
        "--width": (None, False, 768),
        "--num-frames": (None, False, 121),
        "--frame-rate": (None, False, 24.0),
        "--num-inference-steps": (None, False, 40),
        "--image": (3, False, []),
        "--lora": ("+", False, []),
        "--enable-fp8": (0, False, False),
        "--enhance-prompt": (0, False, False),
    }

    @staticmethod
    def _table(parser):
        import argparse

        out = {}
        for a in parser._actions:
            if not a.option_strings or a.option_strings == ["-h", "--help"]:
                continue
            nargs = 0 if isinstance(a, argparse._StoreTrueAction) else a.nargs
            out[a.option_strings[0]] = (nargs, bool(a.required), a.default)
        return out

    def test_basic_parser(self):
        from ltx_pipelines.utils.args import basic_arg_parser

        assert self._table(basic_arg_parser()) == self.BASIC

    def test_1_stage_parser(self):
        from ltx_pipelines.utils.args import default_1_stage_arg_parser
        from ltx_pipelines.utils.constants import DEFAULT_NEGATIVE_PROMPT

        t = self._table(default_1_stage_arg_parser())
        expected = dict(self.BASIC)
        expected["--cfg-guidance-scale"] = (None, False, 4.0)
        expected["--negative-prompt"] = (None, False, DEFAULT_NEGATIVE_PROMPT)
        assert t == expected

    def test_2_stage_parser(self):
        from ltx_pipelines.utils.args import default_2_stage_arg_parser
        from ltx_pipelines.utils.constants import DEFAULT_NEGATIVE_PROMPT

        t = self._table(default_2_stage_arg_parser())
        expected = dict(self.BASIC)
        expected["--cfg-guidance-scale"] = (None, False, 4.0)
        expected["--negative-prompt"] = (None, False, DEFAULT_NEGATIVE_PROMPT)
        expected["--distilled-lora"] = ("+", True, None)
        expected["--spatial-upsampler-path"] = (None, True, None)
        # 2-stage dims double (reference: args.py:216 set_defaults)
        expected["--height"] = (None, False, 1024)
        expected["--width"] = (None, False, 1536)
        assert t == expected

    def test_2_stage_distilled_parser(self):
        from ltx_pipelines.utils.args import default_2_stage_distilled_arg_parser

        t = self._table(default_2_stage_distilled_arg_parser())
        expected = dict(self.BASIC)
        expected["--spatial-upsampler-path"] = (None, True, None)
        expected["--height"] = (None, False, 1024)
        expected["--width"] = (None, False, 1536)
        # no CFG flags on the distilled builder (reference: args.py:255)
        assert "--cfg-guidance-scale" not in t and "--negative-prompt" not in t
        assert t == expected

    def test_actions_accumulate(self, tmp_path):
        from ltx_core.loader import LoraPathStrengthAndSDOps
        from ltx_pipelines.utils.args import default_2_stage_arg_parser

        args = default_2_stage_arg_parser().parse_args([
            "--checkpoint-path", str(tmp_path / "m.safetensors"),
            "--gemma-root", str(tmp_path),
            "--prompt", "p",
            "--output-path", str(tmp_path / "o.mp4"),
            "--image", "a.png", "0", "0.8",
            "--image", "b.png", "8", "0.9",
            "--lora", "l1.safetensors", "0.5",
            "--lora", "l2.safetensors",
            "--distilled-lora", "d.safetensors",
            "--spatial-upsampler-path", str(tmp_path / "u.safetensors"),
        ])
        assert len(args.images) == 2 and args.images[0][1] == 0 and args.images[1][2] == 0.9
        assert [l.strength for l in args.lora] == [0.5, 1.0]
        assert all(isinstance(l, LoraPathStrengthAndSDOps) for l in args.lora)
        assert len(args.distilled_lora) == 1

    def test_lora_action_rejects_three_values(self, tmp_path):
        import pytest as _pytest

        from ltx_pipelines.utils.args import default_1_stage_arg_parser

        with _pytest.raises(SystemExit):
            default_1_stage_arg_parser().parse_args([
                "--checkpoint-path", "m", "--gemma-root", "g",
                "--prompt", "p", "--output-path", "o",
                "--lora", "a", "0.5", "extra",
            ])


class TestComposedHelpers:
    """The ltx_pipelines helper tail (reference helpers.py:38-348):
    token-domain conditioning, denoising-func factories, and the composed
    denoise_audio_video — checked for equivalence against the engine paths."""

    def _video_tools(self, shape=(1, 8, 2, 4, 4)):
        return VideoLatentTools(target_shape=VideoLatentShape(*shape))

    def test_state_with_conditionings_appends_tokens(self, rng):
        from ltx_core.conditioning import VideoConditionByLatentIndex
        from ltx_pipelines.utils.helpers import state_with_conditionings

        tools = self._video_tools()
        state = tools.patchify(tools.create_initial_state(key=jax.random.key(0)))
        n0 = state.latent.shape[1]
        cond_latent = jnp.asarray(rng.normal(size=(1, 8, 1, 4, 4)).astype(np.float32))
        item = VideoConditionByLatentIndex(latent=cond_latent, frame_idx=1, strength=0.8)
        out = state_with_conditionings(state, [item], tools)

        extra = tools.patchifier.get_token_count(VideoLatentShape(1, 8, 1, 4, 4))
        assert out.latent.shape[1] == n0 + extra
        # appended clean tokens ARE the patchified conditioning latent
        np.testing.assert_allclose(
            np.asarray(out.clean_latent[:, n0:]),
            np.asarray(tools.patchifier.patchify(cond_latent)),
            atol=1e-6,
        )
        # appended mask = 1 - strength; original tokens untouched
        np.testing.assert_allclose(np.asarray(out.denoise_mask[:, n0:]), 0.2, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(out.latent[:, :n0]), np.asarray(state.latent), atol=1e-6
        )
        # time coordinate of appended positions is shifted by frame_idx / fps
        np.testing.assert_allclose(
            np.asarray(out.positions[:, 0, n0:]),
            (np.asarray(tools.patchifier.get_patch_grid_bounds(
                VideoLatentShape(1, 8, 1, 4, 4))).astype(np.float32)[:, 0] + 1.0) / tools.fps,
            atol=1e-6,
        )
        # clear_conditioning trims back to the target token count
        cleared = tools.clear_conditioning(out)
        assert cleared.latent.shape[1] == n0
        assert cleared.positions.shape[2] == n0

    def test_keyframe_apply_to_pixel_positions(self, rng):
        from ltx_core.conditioning import VideoConditionByKeyframeIndex
        from ltx_pipelines.utils.helpers import state_with_conditionings

        tools = self._video_tools()
        state = tools.patchify(tools.create_initial_state(key=jax.random.key(0)))
        n0 = state.latent.shape[1]
        kf = jnp.asarray(rng.normal(size=(1, 8, 1, 4, 4)).astype(np.float32))
        out = state_with_conditionings(
            state, [VideoConditionByKeyframeIndex(keyframes=kf, frame_idx=0, strength=1.0)], tools
        )
        # frame_idx == 0 keyframes use pixel coords WITH the causal fix, so
        # the appended position block equals the state's first-frame block
        np.testing.assert_allclose(
            np.asarray(out.positions[:, :, n0:]),
            np.asarray(state.positions[:, :, : out.positions.shape[2] - n0]),
            atol=1e-6,
        )
        np.testing.assert_allclose(np.asarray(out.denoise_mask[:, n0:]), 0.0, atol=1e-6)

    def test_image_conditionings_factories(self, rng, tmp_path):
        from PIL import Image

        from ltx_core.conditioning import (
            VideoConditionByKeyframeIndex,
            VideoConditionByLatentIndex,
        )
        from ltx_pipelines.utils.helpers import (
            image_conditionings_by_adding_guiding_latent,
            image_conditionings_by_replacing_latent,
        )
        from mlx_video_tpu.pipelines.conditioning import (
            VideoConditionByKeyframeIndex as EngineKF,
            VideoConditionByLatentIndex as EngineLat,
        )

        path = tmp_path / "img.png"
        Image.fromarray((rng.random((64, 64, 3)) * 255).astype(np.uint8)).save(path)

        def fake_encoder(pixels):
            # pixel (1, 3, 1, H, W) -> latent (1, 8, 1, H//32, W//32)
            b, c, f, h, w = pixels.shape
            pooled = pixels.reshape(b, c, f, h // 32, 32, w // 32, 32).mean((4, 6))
            return jnp.concatenate([pooled] * 3, axis=1)[:, :8]

        reps = image_conditionings_by_replacing_latent(
            [(str(path), 2, 0.9)], 64, 64, fake_encoder, jnp.float32
        )
        guides = image_conditionings_by_adding_guiding_latent(
            [(str(path), 3, 0.7)], 64, 64, fake_encoder, jnp.float32
        )
        assert len(reps) == 1 and isinstance(reps[0], VideoConditionByLatentIndex)
        assert len(guides) == 1 and isinstance(guides[0], VideoConditionByKeyframeIndex)
        # the parity classes ARE engine conditioning items (the monolithic
        # pipeline's isinstance dispatch sees them transparently)
        assert isinstance(reps[0], EngineLat) and isinstance(guides[0], EngineKF)
        assert reps[0].frame_idx == 2 and reps[0].strength == 0.9
        assert guides[0].frame_idx == 3 and guides[0].strength == 0.7
        assert reps[0].latent.shape == (1, 8, 1, 2, 2)

    def test_guider_denoising_func_matches_manual_cfg(self, rng):
        from ltx_pipelines.utils.helpers import (
            guider_denoising_func,
            simple_denoising_func,
        )
        from ltx_core.types import LatentState

        def mk(lat):
            return LatentState(
                latent=lat, clean_latent=jnp.zeros_like(lat),
                denoise_mask=jnp.ones_like(lat[..., :1]),
                positions=jnp.zeros((1, 3, lat.shape[1], 2)),
            )

        v = mk(jnp.asarray(rng.normal(size=(1, 6, 4)).astype(np.float32)))
        a = mk(jnp.asarray(rng.normal(size=(1, 3, 4)).astype(np.float32)))
        ctx_p = jnp.ones((1, 2, 4))
        ctx_n = jnp.zeros((1, 2, 4))

        def fake_transformer(video=None, audio=None, perturbations=None):
            # "denoised" depends on the context so CFG has a signal
            scale = jnp.mean(video.context)
            return video.latent * (0.5 + scale), audio.latent * (0.5 + scale)

        sigmas = np.array([1.0, 0.0], dtype=np.float32)
        dv_s, da_s = simple_denoising_func(ctx_p, ctx_p, fake_transformer)(v, a, sigmas, 0)
        np.testing.assert_allclose(np.asarray(dv_s), np.asarray(v.latent) * 1.5, atol=1e-6)

        g = CFGGuider(scale=4.0)
        dv, da = guider_denoising_func(g, ctx_p, ctx_n, ctx_p, ctx_n, fake_transformer)(
            v, a, sigmas, 0
        )
        cond, uncond = np.asarray(v.latent) * 1.5, np.asarray(v.latent) * 0.5
        np.testing.assert_allclose(np.asarray(dv), cond + 3.0 * (cond - uncond), atol=1e-5)
        cond_a, uncond_a = np.asarray(a.latent) * 1.5, np.asarray(a.latent) * 0.5
        np.testing.assert_allclose(np.asarray(da), cond_a + 3.0 * (cond_a - uncond_a), atol=1e-5)

    def test_denoise_audio_video_composed(self, rng):
        from ltx_core.conditioning import VideoConditionByLatentIndex
        from ltx_pipelines.utils.helpers import (
            denoise_audio_video,
            euler_denoising_loop,
            simple_denoising_func,
        )
        from ltx_pipelines.utils.types import PipelineComponents

        out_shape = VideoPixelShape(batch=1, frames=9, height=64, width=64, fps=24.0)
        components = PipelineComponents(dtype=jnp.float32)
        components.video_latent_channels = 8  # tiny-model channel count
        cond_latent = jnp.asarray(rng.normal(size=(1, 8, 1, 2, 2)).astype(np.float32))

        def fake_transformer(video=None, audio=None, perturbations=None):
            return video.latent * 0.5, audio.latent * 0.5

        v_state, a_state = denoise_audio_video(
            output_shape=out_shape,
            conditionings=[VideoConditionByLatentIndex(latent=cond_latent, frame_idx=0, strength=1.0)],
            noiser=GaussianNoiser(seed=0),
            sigmas=np.array([1.0, 0.5, 0.0], dtype=np.float32),
            stepper=EulerDiffusionStep(),
            denoising_loop_fn=euler_denoising_loop,
            components=components,
            dtype=jnp.float32,
            denoise_fn=simple_denoising_func(jnp.ones((1, 2, 4)), jnp.ones((1, 2, 4)), fake_transformer),
        )
        assert v_state.latent.shape == (1, 8, 2, 2, 2)  # unpatchified video latent
        expected_audio = AudioLatentShape.from_video_pixel_shape(out_shape)._replace(channels=8)
        assert v_state.denoise_mask.shape[0] == 1
        assert a_state.latent.shape[0] == 1 and a_state.latent.ndim == 4
        assert a_state.latent.shape[2] == expected_audio.frames
        assert np.all(np.isfinite(np.asarray(v_state.latent)))
        assert np.all(np.isfinite(np.asarray(a_state.latent)))

    def test_audio_shape_from_video_pixel_shape(self):
        # 16000 / 160 / 4 = 25 latents/sec; 48 frames @ 24 fps = 2 s -> 50
        shape = AudioLatentShape.from_video_pixel_shape(
            VideoPixelShape(batch=1, frames=48, height=64, width=64, fps=24.0)
        )
        assert shape == AudioLatentShape(1, 8, 50, 16)

    def test_clean_response_reference_semantics(self):
        from ltx_pipelines.utils.helpers import clean_response

        assert clean_response("“hello”") == 'hello"'
        assert clean_response("123 ... drop leading: Words") == "drop leading: Words"
        assert clean_response("<start_of_turn>model\nA cat") == "A cat"
        assert clean_response("—–") == "--"  # no alpha at all: translated text returned

    def test_helpers_name_parity(self):
        """Name-for-name: every public function of the reference helpers
        module exists here (reference ltx_pipelines/utils/helpers.py:29-389)."""
        import ltx_pipelines.utils.helpers as h

        for name in [
            "get_device", "cleanup_memory",
            "image_conditionings_by_replacing_latent",
            "image_conditionings_by_adding_guiding_latent",
            "euler_denoising_loop", "gradient_estimating_euler_denoising_loop",
            "noise_video_state", "noise_audio_state", "create_noised_state",
            "state_with_conditionings", "post_process_latent",
            "modality_from_latent_state", "timesteps_from_mask",
            "simple_denoising_func", "guider_denoising_func",
            "denoise_audio_video", "clean_response", "assert_resolution",
            "generate_enhanced_prompt",
        ]:
            assert callable(getattr(h, name)), name

    def test_generate_enhanced_prompt(self, tmp_path):
        """Wrapper composition (reference helpers.py:363-381): t2v path calls
        enhance_t2v, i2v path decodes+resizes the image and calls enhance_i2v;
        both responses go through clean_response."""
        import numpy as np
        from PIL import Image

        from ltx_pipelines.utils.helpers import generate_enhanced_prompt

        calls = {}

        class StubEncoder:
            def enhance_t2v(self, prompt, seed=None):
                calls["t2v"] = (prompt, seed)
                return "<start_of_turn>model\n“Enhanced” text"

            def enhance_i2v(self, prompt, image, seed=None):
                calls["i2v"] = (prompt, np.asarray(image).shape, seed)
                return "... 1: An image prompt"

        out = generate_enhanced_prompt(StubEncoder(), "a cat", seed=7)
        assert out == 'Enhanced" text'
        assert calls["t2v"] == ("a cat", 7)

        img = tmp_path / "cond.png"
        Image.fromarray(np.zeros((100, 200, 3), dtype=np.uint8)).save(img)
        out = generate_enhanced_prompt(
            StubEncoder(), "a dog", image_path=str(img), image_long_side=64
        )
        assert out == "An image prompt"
        prompt, shape, seed = calls["i2v"]
        assert prompt == "a dog" and seed == 42
        assert max(shape[:2]) == 64  # long side hit image_long_side
