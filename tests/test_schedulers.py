"""Scheduler / position-grid / CFG tests (mirrors reference tests/test_generate_dev.py)."""

import numpy as np
import pytest

from mlx_video_tpu.pipelines.schedulers import (
    STAGE_1_SIGMAS,
    STAGE_2_SIGMAS,
    cfg_delta,
    ltx2_scheduler,
    subsample_refinement_sigmas,
    subsample_sigmas,
)
from mlx_video_tpu.pipelines.positions import (
    AUDIO_LATENTS_PER_SECOND,
    AUDIO_SAMPLE_RATE,
    compute_audio_frames,
    create_audio_position_grid,
    create_position_grid,
)


class TestLTX2Scheduler:
    def test_shape_and_endpoints(self):
        for steps in [5, 10, 20, 40, 50]:
            sigmas = ltx2_scheduler(steps=steps)
            assert sigmas.shape == (steps + 1,)
            assert abs(sigmas[0] - 1.0) < 1e-5
            assert abs(sigmas[-1]) < 1e-5

    def test_monotonically_decreasing(self):
        sigmas = ltx2_scheduler(steps=20)
        assert np.all(np.diff(sigmas) <= 0)

    def test_dtype(self):
        assert ltx2_scheduler(steps=20).dtype == np.float32

    def test_token_shift_changes_schedule(self):
        a = ltx2_scheduler(steps=20, num_tokens=1024)
        b = ltx2_scheduler(steps=20, num_tokens=4096)
        assert np.max(np.abs(a - b)) > 1e-4

    def test_token_shift_caps_at_anchor(self):
        a = ltx2_scheduler(steps=20, num_tokens=4096)
        b = ltx2_scheduler(steps=20, num_tokens=100000)
        np.testing.assert_allclose(a, b)

    def test_no_stretch(self):
        sigmas = ltx2_scheduler(steps=20, stretch=False)
        assert sigmas.shape == (21,)
        assert sigmas[0] > 0
        assert sigmas[-1] == 0.0

    def test_stretch_terminal(self):
        # With stretching, the last non-zero sigma is the terminal value.
        sigmas = ltx2_scheduler(steps=20, terminal=0.1)
        assert abs(sigmas[-2] - 0.1) < 1e-5


class TestSigmaSubsampling:
    def test_full_schedule_passthrough(self):
        assert subsample_sigmas(STAGE_1_SIGMAS, 8, "farthest") == STAGE_1_SIGMAS
        assert subsample_sigmas(STAGE_1_SIGMAS, 20, "uniform") == STAGE_1_SIGMAS

    def test_single_step(self):
        assert subsample_sigmas(STAGE_1_SIGMAS, 1, "farthest") == [1.0, 0.0]

    def test_endpoints_always_kept(self):
        for method in ("uniform", "farthest"):
            sub = subsample_sigmas(STAGE_1_SIGMAS, 4, method)
            assert sub[0] == STAGE_1_SIGMAS[0]
            assert sub[-1] == STAGE_1_SIGMAS[-1]
            assert len(sub) == 5

    def test_refinement_single_step_starts_low(self):
        sub = subsample_refinement_sigmas(STAGE_2_SIGMAS, 1, "farthest")
        assert sub == [STAGE_2_SIGMAS[-2], STAGE_2_SIGMAS[-1]]


class TestCFGDelta:
    def test_scale_one_is_zero(self, rng):
        cond = rng.normal(size=(1, 16, 8)).astype(np.float32)
        uncond = rng.normal(size=(1, 16, 8)).astype(np.float32)
        assert np.max(np.abs(cfg_delta(cond, uncond, 1.0))) < 1e-6

    def test_formula(self):
        cond = np.array([[[1.0, 2.0, 3.0]]])
        uncond = np.array([[[0.5, 1.0, 1.5]]])
        np.testing.assert_allclose(cfg_delta(cond, uncond, 4.0), 3.0 * (cond - uncond))


class TestCreatePositionGrid:
    def test_shape_dtype(self):
        pos = create_position_grid(2, 5, 16, 24)
        assert pos.shape == (2, 3, 5 * 16 * 24, 2)
        assert pos.dtype == np.float32

    def test_time_axis_in_seconds(self):
        pos = create_position_grid(1, 5, 16, 24, fps=24.0)
        assert np.max(pos[0, 0]) < 10

    def test_spatial_pixel_space(self):
        pos = create_position_grid(1, 5, 16, 24, spatial_scale=32)
        assert np.max(pos[0, 1]) == 16 * 32
        assert np.max(pos[0, 2]) == 24 * 32

    def test_causal_fix(self):
        causal = create_position_grid(1, 5, 16, 24, causal_fix=True)
        plain = create_position_grid(1, 5, 16, 24, causal_fix=False)
        assert np.max(np.abs(causal - plain)) > 0
        # First latent frame starts at pixel time 0 with causal fix.
        assert causal[0, 0, 0, 0] == 0.0

    def test_causal_fix_values(self):
        # Frame k>0 start: (8k + 1 - 8) / fps = (8k - 7) / fps.
        pos = create_position_grid(1, 3, 1, 1, fps=24.0)
        starts = pos[0, 0, :, 0]
        np.testing.assert_allclose(starts, np.array([0.0, 1.0, 9.0]) / 24.0, rtol=1e-6)

    def test_finite(self):
        pos = create_position_grid(1, 5, 16, 24)
        assert np.all(np.isfinite(pos))


class TestAudioPositions:
    def test_shape(self):
        pos = create_audio_position_grid(2, 34)
        assert pos.shape == (2, 1, 34, 2)
        assert pos.dtype == np.float32

    def test_values_in_seconds(self):
        pos = create_audio_position_grid(1, 34)
        assert 0 < np.max(pos) < 10
        # Causal fix: first latent frame starts at time 0.
        assert pos[0, 0, 0, 0] == 0.0

    def test_compute_audio_frames(self):
        assert compute_audio_frames(33, 24.0) == round(33 / 24.0 * AUDIO_LATENTS_PER_SECOND)
        assert compute_audio_frames(65, 24.0) > compute_audio_frames(33, 24.0)

    def test_constants(self):
        assert AUDIO_SAMPLE_RATE == 24000
        assert AUDIO_LATENTS_PER_SECOND == 25.0
