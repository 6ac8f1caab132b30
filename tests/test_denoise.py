"""Denoise loop, conditioning, and upsampler tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_video_tpu.config import LTXModelType, LTXRopeType, tiny_test_config
from mlx_video_tpu.models.ltx.model import Modality, init_ltx_params, ltx_apply, to_denoised
from mlx_video_tpu.models.ltx.upsampler import (
    init_latent_upsampler,
    latent_upsampler_apply,
    upsample_latents,
)
from mlx_video_tpu.pipelines import denoise as dn
from mlx_video_tpu.pipelines.conditioning import (
    LatentState,
    VideoConditionByKeyframeIndex,
    VideoConditionByLatentIndex,
    add_noise_with_state,
    apply_conditioning,
    apply_denoise_mask,
    create_initial_state,
)
from mlx_video_tpu.pipelines.positions import create_audio_position_grid, create_position_grid
from mlx_video_tpu.pipelines.schedulers import STAGE_1_SIGMAS, subsample_sigmas


@pytest.fixture(scope="module")
def video_setup():
    cfg = tiny_test_config(LTXModelType.VideoOnly)
    params = init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32)
    b, f, h, w = 1, 2, 3, 4
    rng = np.random.default_rng(0)
    latents = jnp.asarray(rng.normal(size=(b, cfg.in_channels, f, h, w)).astype(np.float32))
    positions = jnp.asarray(create_position_grid(b, f, h, w))
    context = jnp.asarray(rng.normal(size=(b, 8, cfg.caption_channels)).astype(np.float32))
    neg_context = jnp.asarray(rng.normal(size=(b, 8, cfg.caption_channels)).astype(np.float32))
    return cfg, params, latents, positions, context, neg_context


class TestConditioning:
    def _state(self, rng, b=1, c=4, f=5, h=2, w=2):
        return create_initial_state((b, c, f, h, w), key=jax.random.key(0))

    def test_initial_state(self, rng):
        st = self._state(rng)
        assert st.latent.shape == (1, 4, 5, 2, 2)
        assert st.denoise_mask.shape == (1, 1, 5, 1, 1)
        np.testing.assert_array_equal(np.asarray(st.denoise_mask), 1.0)
        np.testing.assert_array_equal(np.asarray(st.clean_latent), 0.0)

    def test_replace_mode(self, rng):
        st = self._state(rng)
        cond = jnp.asarray(rng.normal(size=(1, 4, 1, 2, 2)).astype(np.float32))
        out = apply_conditioning(st, [VideoConditionByLatentIndex(latent=cond, frame_idx=0, strength=0.8)])
        np.testing.assert_allclose(np.asarray(out.latent[:, :, 0]), np.asarray(cond[:, :, 0]))
        np.testing.assert_allclose(np.asarray(out.clean_latent[:, :, 0]), np.asarray(cond[:, :, 0]))
        np.testing.assert_allclose(np.asarray(out.denoise_mask[0, 0, 0, 0, 0]), 0.2, rtol=1e-6)
        # untouched frames keep original noise + full mask
        np.testing.assert_allclose(np.asarray(out.latent[:, :, 1:]), np.asarray(st.latent[:, :, 1:]))
        np.testing.assert_array_equal(np.asarray(out.denoise_mask[:, :, 1:]), 1.0)

    def test_guide_mode_keeps_noisy_latent(self, rng):
        st = self._state(rng)
        kf = jnp.asarray(rng.normal(size=(1, 4, 2, 2, 2)).astype(np.float32))
        out = apply_conditioning(st, [VideoConditionByKeyframeIndex(keyframes=kf, frame_idx=2, strength=1.0)])
        np.testing.assert_allclose(np.asarray(out.latent), np.asarray(st.latent))
        np.testing.assert_allclose(np.asarray(out.clean_latent[:, :, 2:4]), np.asarray(kf))
        np.testing.assert_array_equal(np.asarray(out.denoise_mask[:, :, 2:4]), 0.0)

    def test_conditioning_clipped_at_end(self, rng):
        st = self._state(rng)
        cond = jnp.asarray(rng.normal(size=(1, 4, 3, 2, 2)).astype(np.float32))
        out = apply_conditioning(st, [VideoConditionByLatentIndex(latent=cond, frame_idx=3)])
        np.testing.assert_allclose(np.asarray(out.latent[:, :, 3:]), np.asarray(cond[:, :, :2]))

    def test_shape_validation(self, rng):
        st = self._state(rng)
        bad = jnp.zeros((1, 4, 1, 3, 3))
        with pytest.raises(ValueError, match="does not match"):
            apply_conditioning(st, [VideoConditionByLatentIndex(latent=bad)])
        with pytest.raises(ValueError, match="out of bounds"):
            apply_conditioning(st, [VideoConditionByLatentIndex(latent=jnp.zeros((1, 4, 1, 2, 2)), frame_idx=9)])

    def test_apply_denoise_mask(self, rng):
        d = jnp.ones((1, 2, 3, 1, 1))
        c = jnp.zeros((1, 2, 3, 1, 1))
        m = jnp.asarray([1.0, 0.5, 0.0]).reshape(1, 1, 3, 1, 1)
        out = np.asarray(apply_denoise_mask(d, c, m))
        np.testing.assert_allclose(out[0, 0, :, 0, 0], [1.0, 0.5, 0.0])

    def test_add_noise_respects_mask(self, rng):
        st = self._state(rng)
        st = st._replace(denoise_mask=st.denoise_mask.at[:, :, 0].set(0.0))
        out = add_noise_with_state(st, jax.random.key(3), noise_scale=0.9)
        # masked frame unchanged; unmasked frames renoised
        np.testing.assert_allclose(np.asarray(out.latent[:, :, 0]), np.asarray(st.latent[:, :, 0]))
        assert np.max(np.abs(np.asarray(out.latent[:, :, 1:]) - np.asarray(st.latent[:, :, 1:]))) > 1e-3


class TestDenoise:
    def test_distilled_loop_shapes(self, video_setup):
        cfg, params, latents, positions, context, _ = video_setup
        sigmas = subsample_sigmas(STAGE_1_SIGMAS, 3)
        v, a = dn.denoise(params, cfg, latents, positions, context, sigmas)
        assert a is None
        assert v.shape == latents.shape
        assert np.all(np.isfinite(np.asarray(v)))

    def test_uniform_mask_fast_path_matches_per_token(self, video_setup):
        """With no conditioning state the (B, 1) timestep mask must produce
        the same denoised output as explicit per-token (B, S) timesteps
        (broadcast equivalence of the adaLN modulation)."""
        cfg, params, latents, positions, context, _ = video_setup
        assert dn.video_timesteps_mask(None, latents.shape, latents.dtype).shape == (
            latents.shape[0], 1,
        )
        sigma = 0.8
        tokens = dn.flatten_video_latents(latents)
        ts_one = jnp.full((tokens.shape[0], 1), sigma, dtype=latents.dtype)
        ts_full = jnp.full(tokens.shape[:2], sigma, dtype=latents.dtype)
        v_one, _ = ltx_apply(params, cfg, video=Modality(tokens, ts_one, context, positions))
        v_full, _ = ltx_apply(params, cfg, video=Modality(tokens, ts_full, context, positions))
        np.testing.assert_allclose(np.asarray(v_one), np.asarray(v_full), atol=2e-5)

    def test_progress_callback_matches_scan(self, video_setup):
        cfg, params, latents, positions, context, _ = video_setup
        sigmas = subsample_sigmas(STAGE_1_SIGMAS, 2)
        v_scan, _ = dn.denoise(params, cfg, latents, positions, context, sigmas)
        calls = []
        v_loop, _ = dn.denoise(
            params, cfg, latents, positions, context, sigmas,
            progress_callback=lambda i, n: calls.append((i, n)),
        )
        assert calls == [(1, 2), (2, 2)]
        np.testing.assert_allclose(np.asarray(v_scan), np.asarray(v_loop), atol=2e-5)

    def test_scan_progress_events(self, video_setup, monkeypatch, capsys):
        """With echo enabled the scanned loop streams per-step progress via
        jax.debug.callback — same result, no python loop."""
        cfg, params, latents, positions, context, _ = video_setup
        sigmas = subsample_sigmas(STAGE_1_SIGMAS, 3)
        base, _ = dn.denoise(params, cfg, latents, positions, context, sigmas)
        monkeypatch.setenv("MLX_VIDEO_PROGRESS_ECHO", "1")
        out, _ = dn.denoise(params, cfg, latents, positions, context, sigmas)
        jax.effects_barrier()
        lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("progress:")]
        assert [l.split()[3] for l in lines] == ["1/3", "2/3", "3/3"]
        np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=2e-5)

    def test_cfg_batched_matches_two_forwards(self, video_setup):
        """One batched 2B CFG forward must equal two separate forwards."""
        cfg, params, latents, positions, context, neg = video_setup
        scale = 4.0
        sigma = 0.9
        sigmas = [sigma, 0.5]
        v_cfg, _ = dn.denoise(
            params, cfg, latents, positions, context, sigmas, neg_context=neg, cfg_scale=scale
        )
        # manual two-forward reference
        tokens = dn.flatten_video_latents(latents)
        ts = jnp.full(tokens.shape[:2], sigma, dtype=latents.dtype)
        vel_p, _ = ltx_apply(params, cfg, video=Modality(tokens, ts, context, positions))
        vel_n, _ = ltx_apply(params, cfg, video=Modality(tokens, ts, neg, positions))
        vel = vel_p + (scale - 1.0) * (vel_p - vel_n)
        vel = dn.unflatten_video_latents(vel, latents.shape)
        denoised = to_denoised(latents, vel, sigma)
        expected = np.asarray(denoised, dtype=np.float64) + 0.5 * (
            np.asarray(latents, dtype=np.float64) - np.asarray(denoised, dtype=np.float64)
        ) / sigma
        np.testing.assert_allclose(np.asarray(v_cfg), expected, atol=5e-4)

    def test_cfg_scale_one_equals_no_cfg(self, video_setup):
        cfg, params, latents, positions, context, neg = video_setup
        sigmas = [1.0, 0.5, 0.0]
        v1, _ = dn.denoise(params, cfg, latents, positions, context, sigmas)
        v2, _ = dn.denoise(
            params, cfg, latents, positions, context, sigmas, neg_context=neg, cfg_scale=1.0
        )
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-6)

    def test_conditioned_frames_stay_clean(self, video_setup):
        cfg, params, latents, positions, context, _ = video_setup
        clean = jnp.asarray(
            np.random.default_rng(5).normal(size=latents.shape).astype(np.float32)
        )
        mask = jnp.ones((1, 1, latents.shape[2], 1, 1)).at[:, :, 0].set(0.0)
        state = LatentState(latent=latents, clean_latent=clean, denoise_mask=mask)
        v, _ = dn.denoise(params, cfg, latents, positions, context, [1.0, 0.5, 0.0], state=state)
        # Fully-conditioned frame 0 must equal the clean latent at the end
        # (final step: denoised blended with clean, sigma_next = 0).
        np.testing.assert_allclose(np.asarray(v[:, :, 0]), np.asarray(clean[:, :, 0]), atol=1e-5)

    def test_av_joint_loop(self):
        cfg = tiny_test_config(LTXModelType.AudioVideo)
        params = init_ltx_params(jax.random.key(1), cfg, dtype=jnp.float32)
        rng = np.random.default_rng(0)
        b, f, h, w, t = 1, 2, 2, 2, 6
        latents = jnp.asarray(rng.normal(size=(b, cfg.in_channels, f, h, w)).astype(np.float32))
        positions = jnp.asarray(create_position_grid(b, f, h, w))
        context = jnp.asarray(rng.normal(size=(b, 8, cfg.caption_channels)).astype(np.float32))
        a_latents = jnp.asarray(rng.normal(size=(b, 8, t, cfg.audio_in_channels // 8)).astype(np.float32))
        a_positions = jnp.asarray(create_audio_position_grid(b, t))
        a_context = jnp.asarray(rng.normal(size=(b, 8, cfg.audio_caption_channels)).astype(np.float32))
        v, a = dn.denoise(
            params, cfg, latents, positions, context, [1.0, 0.5, 0.0],
            audio_latents=a_latents, audio_positions=a_positions, audio_context=a_context,
        )
        assert v.shape == latents.shape and a.shape == a_latents.shape
        assert np.all(np.isfinite(np.asarray(v))) and np.all(np.isfinite(np.asarray(a)))

    def test_audio_only_loop(self):
        cfg = tiny_test_config(LTXModelType.AudioVideo)
        params = init_ltx_params(jax.random.key(1), cfg, dtype=jnp.float32)
        rng = np.random.default_rng(0)
        b, t = 1, 6
        a_latents = jnp.asarray(rng.normal(size=(b, 8, t, cfg.audio_in_channels // 8)).astype(np.float32))
        a_positions = jnp.asarray(create_audio_position_grid(b, t))
        a_context = jnp.asarray(rng.normal(size=(b, 8, cfg.audio_caption_channels)).astype(np.float32))
        a = dn.denoise_audio_only(params, cfg, a_latents, a_positions, a_context, [1.0, 0.5, 0.0])
        assert a.shape == a_latents.shape
        assert np.all(np.isfinite(np.asarray(a)))

    def test_segmented_scan_matches_single(self, video_setup, monkeypatch):
        """MLX_VIDEO_SCAN_SEGMENT chunks the schedule into several dispatches
        of the same compiled scan (TPU-worker-watchdog workaround, r4);
        step_offset + dial-carry threading must keep every mode bit-exact
        against the single-scan form."""
        cfg, params, latents, positions, context, neg_context = video_setup
        sigmas = [1.0, 0.9, 0.7, 0.5, 0.3, 0.15, 0.0]  # 6 steps

        cases = [
            ("distilled", dict()),
            ("cfg", dict(neg_context=neg_context, cfg_scale=3.0)),
            ("cfg_cache", dict(neg_context=neg_context, cfg_scale=3.0,
                               cfg_cache_interval=2)),
            ("pab", dict(neg_context=neg_context, cfg_scale=3.0,
                         attn_broadcast_interval=2)),
            ("teacache", dict(teacache_threshold=0.05)),
        ]
        for name, kw in cases:
            monkeypatch.setenv("MLX_VIDEO_SCAN_SEGMENT", "0")
            v1, _ = dn.denoise(params, cfg, latents, positions, context, sigmas, **kw)
            monkeypatch.setenv("MLX_VIDEO_SCAN_SEGMENT", "2")
            v2, _ = dn.denoise(params, cfg, latents, positions, context, sigmas, **kw)
            # 2 does not divide 6 evenly? it does; also test a remainder split
            monkeypatch.setenv("MLX_VIDEO_SCAN_SEGMENT", "4")  # 4 + 2 remainder
            v3, _ = dn.denoise(params, cfg, latents, positions, context, sigmas, **kw)
            np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2), err_msg=name)
            np.testing.assert_array_equal(np.asarray(v1), np.asarray(v3), err_msg=name)

    def test_segmented_av_joint_matches_single(self, monkeypatch):
        cfg = tiny_test_config(LTXModelType.AudioVideo)
        params = init_ltx_params(jax.random.key(1), cfg, dtype=jnp.float32)
        rng = np.random.default_rng(0)
        b, f, h, w, t = 1, 2, 2, 2, 6
        latents = jnp.asarray(rng.normal(size=(b, cfg.in_channels, f, h, w)).astype(np.float32))
        positions = jnp.asarray(create_position_grid(b, f, h, w))
        context = jnp.asarray(rng.normal(size=(b, 8, cfg.caption_channels)).astype(np.float32))
        a_latents = jnp.asarray(rng.normal(size=(b, 8, t, cfg.audio_in_channels // 8)).astype(np.float32))
        a_positions = jnp.asarray(create_audio_position_grid(b, t))
        a_context = jnp.asarray(rng.normal(size=(b, 8, cfg.audio_caption_channels)).astype(np.float32))
        args = (params, cfg, latents, positions, context, [1.0, 0.7, 0.4, 0.2, 0.0])
        kw = dict(audio_latents=a_latents, audio_positions=a_positions, audio_context=a_context)
        monkeypatch.setenv("MLX_VIDEO_SCAN_SEGMENT", "0")
        v1, a1 = dn.denoise(*args, **kw)
        monkeypatch.setenv("MLX_VIDEO_SCAN_SEGMENT", "3")  # 3 + 1 remainder
        v2, a2 = dn.denoise(*args, **kw)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))

    def test_latent_flatten_round_trip(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 4, 3, 2, 5)).astype(np.float32))
        t = dn.flatten_video_latents(x)
        assert t.shape == (2, 30, 4)
        np.testing.assert_allclose(np.asarray(dn.unflatten_video_latents(t, x.shape)), np.asarray(x))
        a = jnp.asarray(rng.normal(size=(2, 8, 5, 16)).astype(np.float32))
        ta = dn.flatten_audio_latents(a)
        assert ta.shape == (2, 5, 128)
        np.testing.assert_allclose(np.asarray(dn.unflatten_audio_latents(ta, a.shape)), np.asarray(a))


class TestUpsampler:
    def test_shapes_and_finite(self, rng):
        params = init_latent_upsampler(jax.random.key(0), in_channels=8, mid_channels=32, num_blocks=1)
        latent = jnp.asarray(rng.normal(size=(1, 8, 2, 4, 4)).astype(np.float32))
        out = latent_upsampler_apply(params, latent)
        assert out.shape == (1, 8, 2, 8, 8)
        assert np.all(np.isfinite(np.asarray(out)))



    def test_blur_down_constant_preserved(self, rng):
        from mlx_video_tpu.models.ltx.upsampler import blur_down

        x = jnp.full((1, 8, 8, 3), 2.5, dtype=jnp.float32)
        out = blur_down(x, factor=2)
        assert out.shape == (1, 4, 4, 3)
        # interior of a constant field is unchanged by a box blur
        np.testing.assert_allclose(np.asarray(out[:, 1:-1, 1:-1]), 2.5, atol=1e-6)

    def test_rational_resample_scales(self, rng):
        from mlx_video_tpu.models.ltx.upsampler import spatial_rational_resample

        params = init_latent_upsampler(jax.random.key(0), in_channels=8, mid_channels=32, num_blocks=1)
        x = jnp.asarray(rng.normal(size=(1, 2, 4, 4, 32)).astype(np.float32))
        up2 = spatial_rational_resample(params["upsampler"], x, scale=2.0)
        assert up2.shape == (1, 2, 8, 8, 32)
        same = spatial_rational_resample(params["upsampler"], x, scale=1.0)
        assert same.shape == (1, 2, 4, 4, 32)
        import pytest as _pytest

        with _pytest.raises(ValueError):
            spatial_rational_resample(params["upsampler"], x, scale=1.7)

    def test_upsample_latents_identity_stats(self, rng):
        params = init_latent_upsampler(jax.random.key(0), in_channels=8, mid_channels=32, num_blocks=1)
        latent = jnp.asarray(rng.normal(size=(1, 8, 2, 4, 4)).astype(np.float32))
        mean = jnp.zeros((8,))
        std = jnp.ones((8,))
        a = upsample_latents(params, latent, mean, std)
        b = latent_upsampler_apply(params, latent)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_upsample_latents_denorm_renorm(self, rng):
        params = init_latent_upsampler(jax.random.key(0), in_channels=8, mid_channels=32, num_blocks=1)
        latent = jnp.asarray(rng.normal(size=(1, 8, 2, 4, 4)).astype(np.float32))
        mean = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
        std = jnp.asarray(rng.uniform(0.5, 2.0, size=(8,)).astype(np.float32))
        out = upsample_latents(params, latent, mean, std)
        # oracle: (upsampler(latent*std+mean) - mean)/std
        m = np.asarray(mean).reshape(1, -1, 1, 1, 1)
        s = np.asarray(std).reshape(1, -1, 1, 1, 1)
        raw = np.asarray(latent_upsampler_apply(params, latent * jnp.asarray(s) + jnp.asarray(m)))
        np.testing.assert_allclose(np.asarray(out), (raw - m) / s, atol=1e-5)

    def test_pixel_shuffle_order(self):
        from mlx_video_tpu.models.ltx.upsampler import pixel_shuffle_2d

        # channel packing (c, rh, rw): channel index c*4 + i*2 + j lands at (h*2+i, w*2+j)
        x = jnp.arange(4, dtype=jnp.float32).reshape(1, 1, 1, 4)
        out = np.asarray(pixel_shuffle_2d(x, 2))[0, :, :, 0]
        np.testing.assert_array_equal(out, [[0, 1], [2, 3]])


class TestCFGDeltaCaching:
    """cfg_cache_interval: recompute the guidance delta every k-th step,
    reuse in between (cached steps run batch-1 instead of batched-2B)."""

    def _setup(self):
        from mlx_video_tpu.config import LTXModelType, LTXRopeType, tiny_test_config
        from mlx_video_tpu.models.ltx.model import init_ltx_params
        from mlx_video_tpu.pipelines.positions import create_position_grid

        cfg = tiny_test_config(LTXModelType.VideoOnly, rope_type=LTXRopeType.SPLIT)
        params = init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32)
        rng = np.random.default_rng(0)
        b, f, h, w = 1, 2, 2, 2
        lat = jnp.asarray(rng.normal(size=(b, cfg.in_channels, f, h, w)).astype(np.float32))
        pos = jnp.asarray(create_position_grid(b, f, h, w))
        ctx = jnp.asarray(rng.normal(size=(b, 6, cfg.caption_channels)).astype(np.float32))
        neg = jnp.asarray(rng.normal(size=(b, 6, cfg.caption_channels)).astype(np.float32))
        return cfg, params, lat, pos, ctx, neg

    SIGMAS = [1.0, 0.8, 0.6, 0.4, 0.2, 0.0]

    def test_identical_contexts_reduce_to_uncond(self):
        """pos == neg -> delta is exactly 0 -> cached CFG == no-CFG result
        (an exactness proof of the caching arithmetic)."""
        cfg, params, lat, pos, ctx, _ = self._setup()
        v0, _ = dn.denoise(params, cfg, lat, pos, ctx, self.SIGMAS)
        v1, _ = dn.denoise(params, cfg, lat, pos, ctx, self.SIGMAS,
                           neg_context=ctx, cfg_scale=4.0, cfg_cache_interval=2)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v0), atol=1e-4)

    def test_interval_one_is_plain_cfg(self):
        cfg, params, lat, pos, ctx, neg = self._setup()
        a, _ = dn.denoise(params, cfg, lat, pos, ctx, self.SIGMAS,
                          neg_context=neg, cfg_scale=4.0)
        b, _ = dn.denoise(params, cfg, lat, pos, ctx, self.SIGMAS,
                          neg_context=neg, cfg_scale=4.0, cfg_cache_interval=1)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_interval_two_small_drift(self):
        cfg, params, lat, pos, ctx, neg = self._setup()
        full, _ = dn.denoise(params, cfg, lat, pos, ctx, self.SIGMAS,
                             neg_context=neg, cfg_scale=4.0)
        cached, _ = dn.denoise(params, cfg, lat, pos, ctx, self.SIGMAS,
                               neg_context=neg, cfg_scale=4.0, cfg_cache_interval=2)
        c = np.asarray(cached)
        assert np.isfinite(c).all()
        rel = np.linalg.norm(c - np.asarray(full)) / np.linalg.norm(np.asarray(full))
        assert 0 < rel < 0.1, rel  # reuses stale deltas, but stays close

    def test_audio_rejected(self):
        cfg, params, lat, pos, ctx, neg = self._setup()
        with pytest.raises(ValueError, match="video-only"):
            dn.denoise(params, cfg, lat, pos, ctx, self.SIGMAS,
                       neg_context=neg, cfg_scale=4.0, cfg_cache_interval=2,
                       audio_latents=jnp.zeros((1, 8, 4, 16)),
                       audio_positions=jnp.zeros((1, 1, 4, 2)),
                       audio_context=ctx)


class TestCfgSequential:
    """cfg_sequential=True runs cond/uncond as two batch-B forwards instead
    of one batched 2B pass — same math, half the activation memory."""

    SIGMAS = [1.0, 0.7, 0.4, 0.0]

    def test_matches_batched_video_only(self, video_setup):
        cfg, params, latents, positions, context, neg = video_setup
        batched, _ = dn.denoise(params, cfg, latents, positions, context,
                                self.SIGMAS, neg_context=neg, cfg_scale=4.0)
        seq, _ = dn.denoise(params, cfg, latents, positions, context,
                            self.SIGMAS, neg_context=neg, cfg_scale=4.0,
                            cfg_sequential=True)
        np.testing.assert_allclose(np.asarray(seq), np.asarray(batched), atol=5e-5)

    def test_matches_batched_av_joint(self):
        cfg = tiny_test_config(LTXModelType.AudioVideo)
        params = init_ltx_params(jax.random.key(1), cfg, dtype=jnp.float32)
        rng = np.random.default_rng(0)
        b, f, h, w, t = 1, 2, 2, 2, 6
        latents = jnp.asarray(rng.normal(size=(b, cfg.in_channels, f, h, w)).astype(np.float32))
        positions = jnp.asarray(create_position_grid(b, f, h, w))
        ctx = jnp.asarray(rng.normal(size=(b, 8, cfg.caption_channels)).astype(np.float32))
        neg = jnp.asarray(rng.normal(size=(b, 8, cfg.caption_channels)).astype(np.float32))
        a_latents = jnp.asarray(rng.normal(size=(b, 8, t, cfg.audio_in_channels // 8)).astype(np.float32))
        a_positions = jnp.asarray(create_audio_position_grid(b, t))
        a_ctx = jnp.asarray(rng.normal(size=(b, 8, cfg.audio_caption_channels)).astype(np.float32))
        a_neg = jnp.asarray(rng.normal(size=(b, 8, cfg.audio_caption_channels)).astype(np.float32))
        kwargs = dict(neg_context=neg, cfg_scale=4.0, audio_latents=a_latents,
                      audio_positions=a_positions, audio_context=a_ctx,
                      audio_neg_context=a_neg)
        vb, ab = dn.denoise(params, cfg, latents, positions, ctx, self.SIGMAS, **kwargs)
        vs, as_ = dn.denoise(params, cfg, latents, positions, ctx, self.SIGMAS,
                             cfg_sequential=True, **kwargs)
        np.testing.assert_allclose(np.asarray(vs), np.asarray(vb), atol=5e-5)
        np.testing.assert_allclose(np.asarray(as_), np.asarray(ab), atol=5e-5)

    def test_no_cfg_ignores_flag(self, video_setup):
        """Without a neg_context the flag is inert (distilled path)."""
        cfg, params, latents, positions, context, _ = video_setup
        a, _ = dn.denoise(params, cfg, latents, positions, context, self.SIGMAS)
        b, _ = dn.denoise(params, cfg, latents, positions, context, self.SIGMAS,
                          cfg_sequential=True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    @pytest.mark.parametrize("dial", [
        dict(cfg_cache_interval=2),
        dict(attn_broadcast_interval=2),
        dict(teacache_threshold=0.1),
    ])
    def test_conflicts_with_caching_dials(self, video_setup, dial):
        cfg, params, latents, positions, context, neg = video_setup
        with pytest.raises(ValueError, match="cfg_sequential"):
            dn.denoise(params, cfg, latents, positions, context, self.SIGMAS,
                       neg_context=neg, cfg_scale=4.0, cfg_sequential=True, **dial)


class TestAttentionBroadcast:
    """Pyramid Attention Broadcast (arXiv:2408.12588): per-layer attention
    outputs recomputed every k-th step, reused in between."""

    def _setup(self, b=1):
        import numpy as np

        config = tiny_test_config(LTXModelType.VideoOnly, rope_type=LTXRopeType.SPLIT, num_layers=4)
        params = init_ltx_params(jax.random.key(0), config, dtype=jnp.float32)
        rng = np.random.default_rng(0)
        lat = jnp.asarray(rng.normal(size=(b, 16, 2, 4, 4)).astype(np.float32))
        pos = jnp.asarray(create_position_grid(b, 2, 4, 4))
        ctx = jnp.asarray(rng.normal(size=(b, 8, config.caption_channels)).astype(np.float32))
        return config, params, lat, pos, ctx

    def test_mechanism_exact_on_same_inputs(self):
        """collect -> cached replay on identical inputs is bit-exact: the
        cached forward consumes exactly what the full forward produced."""
        from mlx_video_tpu.models.ltx.model import Modality, ltx_apply

        config, params, lat, pos, ctx = self._setup()
        tok = dn.flatten_video_latents(lat)
        ts = jnp.full(tok.shape[:2], 0.7, dtype=jnp.float32)
        mod = Modality(latent=tok, timesteps=ts, context=ctx, positions=pos)
        ref, _ = ltx_apply(params, config, video=mod)
        v1, _, cache = ltx_apply(params, config, video=mod, pab="collect")
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(ref))
        assert cache["self"].shape == (4, 1, 32, config.inner_dim)
        # cross-attn is recomputed, never cached: caching it would double
        # the (L, B, S, dim) scan-carry HBM for a small compute saving
        assert set(cache.keys()) == {"self"}
        v2, _ = ltx_apply(params, config, video=mod, pab=cache)
        np.testing.assert_array_equal(np.asarray(v2), np.asarray(ref))

    def test_k1_is_exactly_plain(self):
        config, params, lat, pos, ctx = self._setup()
        sig = [1.0, 0.6, 0.3, 0.0]
        ref, _ = dn.denoise(params, config, lat, pos, ctx, sig)
        out, _ = dn.denoise(params, config, lat, pos, ctx, sig, attn_broadcast_interval=1)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_k2_small_drift_distilled_and_cfg(self):
        config, params, lat, pos, ctx = self._setup()
        sig = [1.0, 0.7, 0.45, 0.25, 0.1, 0.0]
        ref, _ = dn.denoise(params, config, lat, pos, ctx, sig)
        out, _ = dn.denoise(params, config, lat, pos, ctx, sig, attn_broadcast_interval=2)
        rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
        assert 0 < rel < 0.05, rel  # broadcast drift, small but nonzero

        neg = ctx * 0.5
        refc, _ = dn.denoise(params, config, lat, pos, ctx, sig, neg_context=neg, cfg_scale=3.0)
        outc, _ = dn.denoise(params, config, lat, pos, ctx, sig, neg_context=neg,
                             cfg_scale=3.0, attn_broadcast_interval=2)
        relc = float(jnp.linalg.norm(outc - refc) / jnp.linalg.norm(refc))
        assert 0 < relc < 0.05, relc

    def test_validation(self):
        config, params, lat, pos, ctx = self._setup()
        a_lat = jnp.zeros((1, 8, 5, 16))
        with pytest.raises(ValueError, match="video-only"):
            dn.denoise(params, config, lat, pos, ctx, [1.0, 0.0],
                       audio_latents=a_lat, audio_positions=pos, audio_context=ctx,
                       attn_broadcast_interval=2)
        with pytest.raises(ValueError, match="cannot be combined"):
            dn.denoise(params, config, lat, pos, ctx, [1.0, 0.0],
                       neg_context=ctx, cfg_scale=3.0,
                       cfg_cache_interval=2, attn_broadcast_interval=2)
        # PAB + sequence parallelism: data-dependent lax.cond around
        # shard_map bodies — must fail LOUDLY at the API, like teacache
        with pytest.raises(ValueError, match="sequence"):
            dn.denoise(params, config, lat, pos, ctx, [1.0, 0.0],
                       sequence_parallel=("fake_mesh", "fsdp"),
                       attn_broadcast_interval=2)


class TestTeaCache:
    """teacache_threshold: adaptive full-forward reuse (arXiv:2411.19108).
    The relative L1 change of block-0's timestep-modulated input accumulates
    across steps; the transformer only runs when it crosses the threshold."""

    def _setup(self, b=1):
        config = tiny_test_config(LTXModelType.VideoOnly, rope_type=LTXRopeType.SPLIT, num_layers=4)
        params = init_ltx_params(jax.random.key(0), config, dtype=jnp.float32)
        rng = np.random.default_rng(0)
        lat = jnp.asarray(rng.normal(size=(b, 16, 2, 4, 4)).astype(np.float32))
        pos = jnp.asarray(create_position_grid(b, 2, 4, 4))
        ctx = jnp.asarray(rng.normal(size=(b, 8, config.caption_channels)).astype(np.float32))
        return config, params, lat, pos, ctx

    def _signal_and_step(self, config, params, lat, pos, ctx, sigma, sigma_next):
        """One manual full denoise step + the TeaCache signal at its input.

        Returns (signal, velocity, next_latents) using the same primitives the
        scan uses, so threshold arithmetic in the tests is exact."""
        tok = dn.flatten_video_latents(lat)
        ts = jnp.full((lat.shape[0], 1), sigma, dtype=lat.dtype)
        sig = dn._tc_signal(params, config, tok, ts)
        mod = Modality(latent=tok, timesteps=ts, context=ctx, positions=pos)
        vel, _ = ltx_apply(params, config, video=mod)
        vel_t = dn.unflatten_video_latents(vel, lat.shape)
        den = to_denoised(lat, vel_t, sigma)
        nxt = dn._euler_step(lat, den, jnp.float32(sigma), jnp.float32(sigma_next))
        return sig, vel_t, nxt

    def test_threshold_zero_is_plain(self):
        config, params, lat, pos, ctx = self._setup()
        sig = [1.0, 0.6, 0.3, 0.0]
        ref, _ = dn.denoise(params, config, lat, pos, ctx, sig)
        out, _ = dn.denoise(params, config, lat, pos, ctx, sig, teacache_threshold=0.0)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_threshold_values_share_one_compile(self):
        """teacache_threshold and cfg_scale are traced operands: sweeping
        values must NOT grow the _denoise_scan jit cache (each recompile is
        minutes at real geometry and unbounded on a server)."""
        config, params, lat, pos, ctx = self._setup()
        sched = [1.0, 0.6, 0.3, 0.0]
        neg = ctx * 0.5
        dn.denoise(params, config, lat, pos, ctx, sched, teacache_threshold=0.05)
        base = dn._denoise_scan._cache_size()
        for thr in (0.1, 0.15, 0.2):
            dn.denoise(params, config, lat, pos, ctx, sched, teacache_threshold=thr)
        assert dn._denoise_scan._cache_size() == base, "threshold value recompiled the scan"
        dn.denoise(params, config, lat, pos, ctx, sched, neg_context=neg, cfg_scale=3.0)
        base = dn._denoise_scan._cache_size()
        for s in (3.5, 4.0, 4.5):
            dn.denoise(params, config, lat, pos, ctx, sched, neg_context=neg, cfg_scale=s)
        assert dn._denoise_scan._cache_size() == base, "cfg_scale value recompiled the scan"

    def test_threshold_crossing_routes_full_vs_cached(self):
        """Derive the exact step-0 -> step-1 signal change, then show a
        threshold just below it runs step 1 full (== plain loop) and a
        threshold just above it caches step 1 (== frozen-velocity oracle)."""
        config, params, lat, pos, ctx = self._setup()
        s0, s1 = 1.0, 0.6
        sig0, vel0, lat1 = self._signal_and_step(config, params, lat, pos, ctx, s0, s1)
        tok1 = dn.flatten_video_latents(lat1)
        ts1 = jnp.full((lat.shape[0], 1), s1, dtype=lat.dtype)
        sig1 = dn._tc_signal(params, config, tok1, ts1)
        rel01 = float(jnp.mean(jnp.abs(sig1 - sig0)) / (jnp.mean(jnp.abs(sig0)) + 1e-8))
        assert rel01 > 0

        sched = [s0, s1, 0.0]
        plain, _ = dn.denoise(params, config, lat, pos, ctx, sched)
        below, _ = dn.denoise(params, config, lat, pos, ctx, sched,
                              teacache_threshold=rel01 * 0.5)
        np.testing.assert_allclose(np.asarray(below), np.asarray(plain), atol=1e-5)

        # above the change: step 1 reuses step 0's velocity exactly
        den1 = to_denoised(lat1, vel0, s1)
        oracle = dn._euler_step(lat1, den1, jnp.float32(s1), jnp.float32(0.0))
        above, _ = dn.denoise(params, config, lat, pos, ctx, sched,
                              teacache_threshold=rel01 * 1.5)
        np.testing.assert_allclose(np.asarray(above), np.asarray(oracle), atol=1e-5)
        # and the two sides genuinely differ
        assert not np.allclose(np.asarray(above), np.asarray(below), atol=1e-5)

    def test_tiny_threshold_matches_plain_cfg(self):
        """A threshold below every per-step change -> every step runs full ->
        bit-level agreement with the plain CFG loop."""
        config, params, lat, pos, ctx = self._setup()
        neg = ctx * 0.5
        sig = [1.0, 0.7, 0.4, 0.0]
        ref, _ = dn.denoise(params, config, lat, pos, ctx, sig,
                            neg_context=neg, cfg_scale=3.0)
        out, _ = dn.denoise(params, config, lat, pos, ctx, sig,
                            neg_context=neg, cfg_scale=3.0, teacache_threshold=1e-9)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_huge_threshold_freezes_velocity(self):
        """thr=1e9 -> only step 0 runs the transformer; the rest integrate the
        frozen step-0 velocity. Oracle built from the module's own pieces."""
        config, params, lat, pos, ctx = self._setup()
        sched = [1.0, 0.7, 0.4, 0.2, 0.0]
        _, vel0, _ = self._signal_and_step(config, params, lat, pos, ctx, 1.0, 0.7)
        cur = lat
        for s, sn in zip(sched[:-1], sched[1:]):
            den = to_denoised(cur, vel0, s)
            cur = dn._euler_step(cur, den, jnp.float32(s), jnp.float32(sn))
        out, _ = dn.denoise(params, config, lat, pos, ctx, sched, teacache_threshold=1e9)
        np.testing.assert_allclose(np.asarray(out), np.asarray(cur), atol=1e-5)

    def test_conditioning_state_respected(self):
        """With a conditioning state the cached steps must still re-apply the
        denoise mask: the conditioned tokens stay pinned to the clean latent."""
        config, params, lat, pos, ctx = self._setup()
        state = create_initial_state(lat.shape, key=jax.random.key(1))
        state = apply_conditioning(
            state, [VideoConditionByLatentIndex(latent=lat[:, :, :1], frame_idx=0, strength=1.0)]
        )
        sched = [1.0, 0.6, 0.3, 0.0]
        out, _ = dn.denoise(params, config, lat, pos, ctx, sched,
                            state=state, teacache_threshold=1e9)
        ref, _ = dn.denoise(params, config, lat, pos, ctx, sched, state=state)
        # frame 0 is fully conditioned (strength 1): identical under any dial
        np.testing.assert_allclose(
            np.asarray(out[:, :, 0]), np.asarray(ref[:, :, 0]), atol=1e-5
        )
        assert np.isfinite(np.asarray(out)).all()

    def test_validation(self):
        config, params, lat, pos, ctx = self._setup()
        a_lat = jnp.zeros((1, 8, 5, 16))
        with pytest.raises(ValueError, match="video-only"):
            dn.denoise(params, config, lat, pos, ctx, [1.0, 0.0],
                       audio_latents=a_lat, audio_positions=pos, audio_context=ctx,
                       teacache_threshold=0.1)
        with pytest.raises(ValueError, match="one caching dial"):
            dn.denoise(params, config, lat, pos, ctx, [1.0, 0.0],
                       neg_context=ctx, cfg_scale=3.0,
                       cfg_cache_interval=2, teacache_threshold=0.1)
        with pytest.raises(ValueError, match="one caching dial"):
            dn.denoise(params, config, lat, pos, ctx, [1.0, 0.0],
                       attn_broadcast_interval=2, teacache_threshold=0.1)
        with pytest.raises(ValueError, match="progress_callback"):
            dn.denoise(params, config, lat, pos, ctx, [1.0, 0.0],
                       teacache_threshold=0.1, progress_callback=lambda i, n: None)


class TestHostStreaming:
    """MLX_VIDEO_STREAM_HOST=1: streaming via per-step dispatches of the
    callback-free program (r5 — the in-scan debug-callback variant fails
    remote TPU compile at 19B). Must be bit-identical to the plain loop and
    emit one completion event per step."""

    def test_matches_plain_and_emits_events(self, monkeypatch):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from mlx_video_tpu.config import LTXModelType, tiny_test_config
        from mlx_video_tpu.models.ltx.model import init_ltx_params
        from mlx_video_tpu.pipelines import denoise as dn
        from mlx_video_tpu.pipelines.positions import create_position_grid
        from mlx_video_tpu.utils import profiling

        cfg = tiny_test_config(LTXModelType.VideoOnly, num_layers=2)
        params = init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32)
        b, f, h, w = 1, 2, 4, 4
        latents = jax.random.normal(jax.random.key(1), (b, cfg.in_channels, f, h, w))
        positions = jnp.asarray(create_position_grid(b, f, h, w))
        context = jax.random.normal(jax.random.key(2), (b, 8, cfg.caption_channels))
        sched = [1.0, 0.8, 0.55, 0.3, 0.1, 0.0]

        monkeypatch.setenv("MLX_VIDEO_STREAM_HOST", "0")
        ref, _ = dn.denoise(params, cfg, latents, positions, context, sched)

        events = []
        profiling.add_event_sink(events.append)
        try:
            monkeypatch.setenv("MLX_VIDEO_STREAM_HOST", "1")
            out, _ = dn.denoise(params, cfg, latents, positions, context, sched)
        finally:
            profiling.remove_event_sink(events.append)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
        steps = [e for e in events if e.get("kind") == "denoise_step"]
        assert [e["step"] for e in steps] == [1, 2, 3, 4, 5]
        assert all(e["total"] == 5 for e in steps)
        assert abs(steps[0]["sigma"] - 1.0) < 1e-6
