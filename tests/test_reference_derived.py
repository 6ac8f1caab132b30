"""Cross-implementation golden tests: expected values NOT produced by the code
under test.

Each ``_ref_*`` helper is an independent NumPy transcription of the reference
implementation's pure math, transcribed line-by-line from the cited
`/root/reference` source (VERDICT.md round 1, missing item 2: the repo's own
golden fixtures pin regressions but cannot catch a transcription error made
before they were first generated). Several scheduler outputs are additionally
pinned as hard literals so the tests survive edits to the transcriptions
themselves.

Reference sources transcribed:
- scheduler + sigma subsampling  mlx_video/generate.py:182-277, 410-467
- RoPE tables                    mlx_video/models/ltx/rope.py:175-416
- trapezoidal masks + intervals  mlx_video/models/ltx/video_vae/tiling.py:17-62, 223-270
- patchify channel order         mlx_video/models/ltx/video_vae/ops.py:9-45
- position grids                 mlx_video/generate.py:470-557
"""

import math

import numpy as np
import pytest

from mlx_video_tpu.config import LTXRopeType
from mlx_video_tpu.models.ltx import rope as rope_lib
from mlx_video_tpu.models.ltx.video_vae import ops as vae_ops
from mlx_video_tpu.models.ltx.video_vae import tiling
from mlx_video_tpu.pipelines import positions as pos_lib
from mlx_video_tpu.pipelines import schedulers


# ---------------------------------------------------------------------------
# Reference transcriptions (NumPy, structured after the reference lines)
# ---------------------------------------------------------------------------

def _ref_subsample_farthest(sigmas, steps):
    # generate.py:182-221
    max_steps = len(sigmas) - 1
    if steps >= max_steps:
        return list(sigmas)
    if steps == 1:
        return [sigmas[0], sigmas[-1]]
    eps = 1e-6
    pool = sigmas[:-1]
    xs = [math.log(max(s, eps)) for s in pool]
    chosen = {0, len(pool) - 1}
    while len(chosen) < steps:
        best_i, best_score = None, -1.0
        for i in range(len(pool)):
            if i in chosen:
                continue
            score = min(abs(xs[i] - xs[j]) for j in chosen)
            if score > best_score:
                best_score, best_i = score, i
        chosen.add(best_i)
    return [sigmas[i] for i in sorted(chosen)] + [sigmas[-1]]


def _ref_subsample_uniform(sigmas, steps):
    # generate.py:224-255
    max_steps = len(sigmas) - 1
    if steps >= max_steps:
        return list(sigmas)
    if steps == 1:
        return [sigmas[0], sigmas[-1]]
    pool = sigmas[:-1]
    last = len(pool) - 1
    idxs = [0] + [int(round(i * last / (steps - 1))) for i in range(1, steps - 1)] + [last]
    uniq = sorted(set(idxs))
    if len(uniq) < steps:
        for i in range(last + 1):
            if i in uniq:
                continue
            uniq.append(i)
            if len(uniq) == steps:
                break
        uniq = sorted(uniq)
    return [pool[i] for i in uniq] + [sigmas[-1]]


def _ref_ltx2_scheduler(steps, num_tokens=None, max_shift=2.05, base_shift=0.95,
                        stretch=True, terminal=0.1):
    # generate.py:410-467 (incl. the reference's `power = 1` exponent)
    BASE, MAX = 1024, 4096
    tokens = MAX if num_tokens is None else min(num_tokens, MAX)
    sigmas = np.linspace(1.0, 0.0, steps + 1)
    mm = (max_shift - base_shift) / (MAX - BASE)
    b = base_shift - mm * BASE
    sigma_shift = tokens * mm + b
    power = 1
    transformed = np.zeros_like(sigmas)
    non_zero = sigmas != 0
    nz = sigmas[non_zero]
    transformed[non_zero] = math.exp(sigma_shift) / (
        math.exp(sigma_shift) + (1 / nz - 1) ** power
    )
    sigmas = transformed
    if stretch:
        nzm = sigmas != 0
        one_minus_z = 1.0 - sigmas[nzm]
        scale_factor = one_minus_z[-1] / (1.0 - terminal)
        if np.isfinite(scale_factor) and scale_factor != 0:
            sigmas[nzm] = 1.0 - (one_minus_z / scale_factor)
    return sigmas.astype(np.float32)


def _ref_freq_grid(theta, n_pos_dims, inner_dim):
    # rope.py:175-211
    n_elem = 2 * n_pos_dims
    log_start = math.log(1.0) / math.log(theta)
    log_end = math.log(theta) / math.log(theta)
    num_indices = inner_dim // n_elem
    if num_indices == 0:
        num_indices = 1
    lin_space = np.linspace(log_start, log_end, num_indices, dtype=np.float32)
    return np.power(np.float32(theta), lin_space) * (math.pi / 2)


def _ref_generate_freqs(indices, indices_grid, max_pos, use_middle):
    # rope.py:241-290
    grid = np.asarray(indices_grid, dtype=np.float32)
    if use_middle:
        assert grid.ndim == 4 and grid.shape[-1] == 2
        grid = (grid[..., 0] + grid[..., 1]) / 2.0
    elif grid.ndim == 4:
        grid = grid[..., 0]
    n_pos_dims = grid.shape[1]
    fractional = np.stack(
        [grid[:, i] / max_pos[i] for i in range(n_pos_dims)], axis=-1
    )  # (B, T, n_dims)
    scaled = fractional * 2 - 1
    freqs = scaled[..., None] * indices[None, None, None, :]  # (B, T, n_dims, n_idx)
    freqs = np.swapaxes(freqs, -1, -2)  # (B, T, n_idx, n_dims)
    return freqs.reshape(freqs.shape[:-2] + (-1,))


def _ref_precompute_freqs_cis(indices_grid, dim, theta, max_pos, use_middle,
                              num_heads, rope_type):
    # rope.py:364-416 (fp32 path; "double precision" is also fp32, :419-444)
    n_pos_dims = indices_grid.shape[1]
    indices = _ref_freq_grid(theta, n_pos_dims, dim)
    freqs = _ref_generate_freqs(indices, indices_grid, max_pos, use_middle)
    cos_f, sin_f = np.cos(freqs), np.sin(freqs)
    if rope_type == "split":
        # rope.py:293-329
        pad = dim // 2 - freqs.shape[-1]
        if pad != 0:
            cos_f = np.concatenate([np.ones(cos_f.shape[:-1] + (pad,), cos_f.dtype), cos_f], -1)
            sin_f = np.concatenate([np.zeros(sin_f.shape[:-1] + (pad,), sin_f.dtype), sin_f], -1)
        b, t = cos_f.shape[0], cos_f.shape[1]
        cos_f = np.swapaxes(cos_f.reshape(b, t, num_heads, -1), 1, 2)
        sin_f = np.swapaxes(sin_f.reshape(b, t, num_heads, -1), 1, 2)
        return cos_f, sin_f
    # interleaved, rope.py:332-361: repeat each freq twice, pad FRONT
    cos_f = np.repeat(cos_f, 2, axis=-1)
    sin_f = np.repeat(sin_f, 2, axis=-1)
    pad = dim % (2 * n_pos_dims)
    if pad != 0:
        cos_f = np.concatenate([np.ones(cos_f.shape[:-1] + (pad,), cos_f.dtype), cos_f], -1)
        sin_f = np.concatenate([np.zeros(sin_f.shape[:-1] + (pad,), sin_f.dtype), sin_f], -1)
    return cos_f, sin_f


def _ref_trapezoid_mask(length, ramp_left, ramp_right, left_starts_from_0=False):
    # tiling.py:17-62 (Python-list form, as in the reference)
    ramp_left = max(0, min(ramp_left, length))
    ramp_right = max(0, min(ramp_right, length))
    mask = [1.0] * length
    if ramp_left > 0:
        interval_length = ramp_left + 1 if left_starts_from_0 else ramp_left + 2
        fade_in_full = [i / (interval_length - 1) for i in range(interval_length)]
        fade_in = fade_in_full[:-1]
        if not left_starts_from_0:
            fade_in = fade_in[1:]
        for i in range(min(ramp_left, len(fade_in))):
            mask[i] *= fade_in[i]
    if ramp_right > 0:
        fade_out = [(ramp_right + 1 - i) / (ramp_right + 1) for i in range(1, ramp_right + 1)]
        for i in range(ramp_right):
            mask[length - ramp_right + i] *= fade_out[i]
    return np.clip(np.asarray(mask, dtype=np.float32), 0, 1)


def _ref_split_in_spatial(size, overlap, dimension_size):
    # tiling.py:223-236 -> (starts, ends, left_ramps, right_ramps)
    if dimension_size <= size:
        return [0], [dimension_size], [0], [0]
    amount = (dimension_size + size - 2 * overlap - 1) // (size - overlap)
    starts = [i * (size - overlap) for i in range(amount)]
    ends = [s + size for s in starts]
    ends[-1] = dimension_size
    left_ramps = [0] + [overlap] * (amount - 1)
    right_ramps = [overlap] * (amount - 1) + [0]
    return starts, ends, left_ramps, right_ramps


def _ref_split_in_temporal(size, overlap, dimension_size):
    # tiling.py:238-255: causal -1 start / +1 left-ramp adjust on tiles 1..n
    if dimension_size <= size:
        return [0], [dimension_size], [0], [0]
    starts, ends, left_ramps, right_ramps = _ref_split_in_spatial(size, overlap, dimension_size)
    starts = [starts[0]] + [s - 1 for s in starts[1:]]
    left_ramps = [left_ramps[0]] + [r + 1 for r in left_ramps[1:]]
    return starts, ends, left_ramps, right_ramps


def _ref_patchify(x, patch_size_hw=4, patch_size_t=1):
    # ops.py:9-45: einops "(c p r q)" — width factor BEFORE height factor
    b, c, f, h, w = x.shape
    new_h, new_w, new_f = h // patch_size_hw, w // patch_size_hw, f // patch_size_t
    new_c = c * patch_size_hw * patch_size_hw * patch_size_t
    x = x.reshape(b, c, new_f, patch_size_t, new_h, patch_size_hw, new_w, patch_size_hw)
    x = np.transpose(x, (0, 1, 3, 7, 5, 2, 4, 6))
    return x.reshape(b, new_c, new_f, new_h, new_w)


def _ref_position_grid(batch_size, num_frames, height, width, temporal_scale=8,
                       spatial_scale=32, fps=24.0, causal_fix=True):
    # generate.py:470-525
    t_grid, h_grid, w_grid = np.meshgrid(
        np.arange(0, num_frames), np.arange(0, height), np.arange(0, width), indexing="ij"
    )
    patch_starts = np.stack([t_grid, h_grid, w_grid], axis=0)
    patch_ends = patch_starts + np.array([1, 1, 1]).reshape(3, 1, 1, 1)
    latent_coords = np.stack([patch_starts, patch_ends], axis=-1)
    latent_coords = latent_coords.reshape(3, num_frames * height * width, 2)
    latent_coords = np.tile(latent_coords[np.newaxis], (batch_size, 1, 1, 1))
    scale = np.array([temporal_scale, spatial_scale, spatial_scale]).reshape(1, 3, 1, 1)
    pixel = (latent_coords * scale).astype(np.float32)
    if causal_fix:
        pixel[:, 0, :, :] = np.clip(pixel[:, 0, :, :] + 1 - temporal_scale, a_min=0, a_max=None)
    pixel[:, 0, :, :] = pixel[:, 0, :, :] / fps
    return pixel


def _ref_audio_position_grid(batch_size, audio_frames, sample_rate=16000,
                             hop_length=160, downsample_factor=4, is_causal=True):
    # generate.py:528-551
    def times(start_idx, end_idx):
        latent_frame = np.arange(start_idx, end_idx, dtype=np.float32)
        mel_frame = latent_frame * downsample_factor
        if is_causal:
            mel_frame = np.clip(mel_frame + 1 - downsample_factor, 0, None)
        return mel_frame * hop_length / sample_rate

    positions = np.stack([times(0, audio_frames), times(1, audio_frames + 1)], axis=-1)
    return np.tile(positions[np.newaxis, np.newaxis], (batch_size, 1, 1, 1))


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------

class TestSchedulerReferenceDerived:
    # Literal pins: computed once from the transcriptions above (which are
    # plain NumPy, i.e. running them IS running the reference's math).
    PINNED_FARTHEST = {
        2: [1.0, 0.421875, 0.0],
        3: [1.0, 0.725, 0.421875, 0.0],
        4: [1.0, 0.909375, 0.725, 0.421875, 0.0],
        6: [1.0, 0.9875, 0.975, 0.909375, 0.725, 0.421875, 0.0],
    }
    PINNED_UNIFORM = {
        2: [1.0, 0.421875, 0.0],
        3: [1.0, 0.975, 0.421875, 0.0],
        4: [1.0, 0.9875, 0.909375, 0.421875, 0.0],
    }
    PINNED_SCHED = {
        (8, None): [1.0, 0.9657116, 0.9218749, 0.8638562, 0.7834453,
                    0.6645792, 0.47100273, 0.1, 0.0],
        (8, 600): [1.0, 0.92836314, 0.8453095, 0.7478735, 0.6319651,
                   0.4917812, 0.31880343, 0.1, 0.0],
        (5, 2880): [1.0, 0.9037679, 0.76216453, 0.5332054, 0.1, 0.0],
    }

    def test_stage_sigma_constants(self):
        # generate.py:339-340 (checkpoint-defined tables)
        assert schedulers.STAGE_1_SIGMAS == [
            1.0, 0.99375, 0.9875, 0.98125, 0.975, 0.909375, 0.725, 0.421875, 0.0
        ]
        assert schedulers.STAGE_2_SIGMAS == [0.909375, 0.725, 0.421875, 0.0]

    @pytest.mark.parametrize("steps", [1, 2, 3, 4, 6, 8])
    def test_farthest_matches_reference(self, steps):
        expected = _ref_subsample_farthest(schedulers.STAGE_1_SIGMAS, steps)
        got = schedulers.subsample_sigmas(schedulers.STAGE_1_SIGMAS, steps, "farthest")
        assert got == expected
        if steps in self.PINNED_FARTHEST:
            assert got == self.PINNED_FARTHEST[steps]

    @pytest.mark.parametrize("steps", [1, 2, 3, 4, 8])
    def test_uniform_matches_reference(self, steps):
        expected = _ref_subsample_uniform(schedulers.STAGE_1_SIGMAS, steps)
        got = schedulers.subsample_sigmas(schedulers.STAGE_1_SIGMAS, steps, "uniform")
        assert got == expected
        if steps in self.PINNED_UNIFORM:
            assert got == self.PINNED_UNIFORM[steps]

    def test_refinement_single_step_starts_low(self):
        # generate.py:266-277
        got = schedulers.subsample_refinement_sigmas(schedulers.STAGE_2_SIGMAS, 1)
        assert got == [0.421875, 0.0]

    @pytest.mark.parametrize("steps,tokens", [(8, None), (8, 600), (5, 2880), (40, 4096), (3, 1)])
    def test_ltx2_scheduler_matches_reference(self, steps, tokens):
        expected = _ref_ltx2_scheduler(steps, tokens)
        got = schedulers.ltx2_scheduler(steps, tokens)
        np.testing.assert_allclose(got, expected, atol=1e-6)
        if (steps, tokens) in self.PINNED_SCHED:
            np.testing.assert_allclose(got, self.PINNED_SCHED[(steps, tokens)], atol=1e-6)

    def test_ltx2_scheduler_no_stretch(self):
        expected = _ref_ltx2_scheduler(6, 2048, stretch=False)
        got = schedulers.ltx2_scheduler(6, 2048, stretch=False)
        np.testing.assert_allclose(got, expected, atol=1e-6)


class TestRopeReferenceDerived:
    # dim=64, 3 pos dims -> n_elem=6, num_indices=10, 30 freqs/token:
    # split pads 32-30=2 at the front, interleaved pads 64%6=4 — both
    # non-trivial padding paths are exercised.
    DIM, HEADS, THETA = 64, 4, 10000.0
    MAX_POS = [20, 2048, 2048]

    def _grid(self):
        return _ref_position_grid(2, 2, 3, 2)  # (2, 3, 12, 2) interval bounds

    def test_freq_grid_matches_reference(self):
        expected = _ref_freq_grid(self.THETA, 3, self.DIM)
        got = np.asarray(rope_lib.generate_freq_grid(self.THETA, 3, self.DIM))
        np.testing.assert_allclose(got, expected, rtol=1e-6)

    def test_freq_grid_tiny_dim_floor(self):
        # num_indices floors at 1 (rope.py:199-201)
        expected = _ref_freq_grid(self.THETA, 3, 4)
        got = np.asarray(rope_lib.generate_freq_grid(self.THETA, 3, 4))
        assert got.shape == (1,)
        np.testing.assert_allclose(got, expected, rtol=1e-6)

    @pytest.mark.parametrize("use_middle", [False, True])
    def test_split_tables_match_reference(self, use_middle):
        grid = self._grid()
        exp_cos, exp_sin = _ref_precompute_freqs_cis(
            grid, self.DIM, self.THETA, self.MAX_POS, use_middle, self.HEADS, "split"
        )
        cos, sin = rope_lib.precompute_freqs_cis(
            grid, self.DIM, self.THETA, self.MAX_POS, use_middle,
            self.HEADS, LTXRopeType.SPLIT,
        )
        assert np.asarray(cos).shape == exp_cos.shape == (2, self.HEADS, 12, self.DIM // 2 // self.HEADS)
        # atol 2e-4: fp32 ulp differences in theta**linspace between NumPy and
        # XLA; structural errors (wrong order/padding/axis) are O(1).
        np.testing.assert_allclose(np.asarray(cos), exp_cos, atol=2e-4)
        np.testing.assert_allclose(np.asarray(sin), exp_sin, atol=2e-4)

    @pytest.mark.parametrize("use_middle", [False, True])
    def test_interleaved_tables_match_reference(self, use_middle):
        grid = self._grid()
        exp_cos, exp_sin = _ref_precompute_freqs_cis(
            grid, self.DIM, self.THETA, self.MAX_POS, use_middle, self.HEADS, "interleaved"
        )
        cos, sin = rope_lib.precompute_freqs_cis(
            grid, self.DIM, self.THETA, self.MAX_POS, use_middle,
            self.HEADS, LTXRopeType.INTERLEAVED,
        )
        # atol 2e-4: fp32 ulp differences in theta**linspace between NumPy and
        # XLA; structural errors (wrong order/padding/axis) are O(1).
        np.testing.assert_allclose(np.asarray(cos), exp_cos, atol=2e-4)
        np.testing.assert_allclose(np.asarray(sin), exp_sin, atol=2e-4)

    def test_flagship_geometry_split(self):
        # 19B head geometry: dim 4096, 32 heads x 128 (config.py 19B defaults);
        # n_elem=6 -> 682 freqs, pad = 2048 - 2046 = 2.
        grid = _ref_position_grid(1, 2, 2, 2)
        exp_cos, exp_sin = _ref_precompute_freqs_cis(
            grid, 4096, self.THETA, self.MAX_POS, True, 32, "split"
        )
        cos, sin = rope_lib.precompute_freqs_cis(
            grid, 4096, self.THETA, self.MAX_POS, True, 32, LTXRopeType.SPLIT,
        )
        cos, sin = np.asarray(cos), np.asarray(sin)
        assert cos.shape == (1, 32, 8, 64)
        # atol 2e-2: the top frequency is theta*pi/2 ~ 1.6e4, where one fp32
        # ulp of the *argument* (NumPy vs XLA rounding of theta**linspace)
        # moves cos by up to ~8e-3 (measured). Structural errors (wrong
        # padding/order/axis) are O(1). The pad region is asserted exactly.
        np.testing.assert_allclose(cos, exp_cos, atol=2e-2)
        np.testing.assert_allclose(sin, exp_sin, atol=2e-2)
        # Front padding (2048 - 682*3 = 2 dims) lands in head 0, dims 0..1:
        np.testing.assert_array_equal(cos[:, 0, :, :2], 1.0)
        np.testing.assert_array_equal(sin[:, 0, :, :2], 0.0)


class TestTilingReferenceDerived:
    @pytest.mark.parametrize(
        "length,rl,rr,from0",
        [(10, 3, 3, False), (10, 3, 3, True), (8, 0, 4, False), (8, 4, 0, True),
         (5, 5, 5, False), (1, 1, 1, True), (64, 24, 24, False)],
    )
    def test_trapezoid_mask_matches_reference(self, length, rl, rr, from0):
        expected = _ref_trapezoid_mask(length, rl, rr, from0)
        got = tiling.compute_trapezoidal_mask_1d(length, rl, rr, from0)
        np.testing.assert_allclose(got, expected, atol=1e-6)

    @pytest.mark.parametrize("size,overlap,dim", [(16, 4, 40), (16, 4, 16), (8, 2, 30), (64, 24, 96)])
    def test_spatial_intervals_match_reference(self, size, overlap, dim):
        starts, ends, lr, rr = _ref_split_in_spatial(size, overlap, dim)
        got = tiling.split_in_spatial(size, overlap, dim)
        assert (list(got.starts), list(got.ends), list(got.left_ramps), list(got.right_ramps)) \
            == (starts, ends, lr, rr)

    @pytest.mark.parametrize("size,overlap,dim", [(8, 3, 20), (8, 3, 8), (4, 1, 9)])
    def test_temporal_intervals_match_reference(self, size, overlap, dim):
        starts, ends, lr, rr = _ref_split_in_temporal(size, overlap, dim)
        got = tiling.split_in_temporal(size, overlap, dim)
        assert (list(got.starts), list(got.ends), list(got.left_ramps), list(got.right_ramps)) \
            == (starts, ends, lr, rr)


class TestPatchifyReferenceDerived:
    # The repo's VAE runs channels-last (B, F, H, W, C) internally; the
    # reference is channels-first (B, C, F, H, W). Parity claim: the packed
    # channel ORDER (c p r q) is identical, so repo(x_cl) transposed back to
    # channels-first must equal the reference transcription on x_cf.
    @staticmethod
    def _cl(x):  # channels-first -> channels-last
        return np.transpose(x, (0, 2, 3, 4, 1))

    @staticmethod
    def _cf(x):  # channels-last -> channels-first
        return np.transpose(x, (0, 4, 1, 2, 3))

    def test_patchify_channel_order_matches_reference(self):
        x = np.arange(1 * 3 * 2 * 8 * 8, dtype=np.float32).reshape(1, 3, 2, 8, 8)
        expected = _ref_patchify(x, 4, 1)
        got = self._cf(np.asarray(vae_ops.patchify(self._cl(x), 4, 1)))
        np.testing.assert_array_equal(got, expected)

    def test_patchify_temporal_matches_reference(self):
        x = np.arange(1 * 2 * 4 * 4 * 4, dtype=np.float32).reshape(1, 2, 4, 4, 4)
        expected = _ref_patchify(x, 2, 2)
        got = self._cf(np.asarray(vae_ops.patchify(self._cl(x), 2, 2)))
        np.testing.assert_array_equal(got, expected)

    def test_unpatchify_inverts_reference_patchify(self):
        x = np.arange(1 * 3 * 2 * 8 * 8, dtype=np.float32).reshape(1, 3, 2, 8, 8)
        patched = _ref_patchify(x, 4, 1)
        got = self._cf(np.asarray(vae_ops.unpatchify(self._cl(patched), 4, 1)))
        np.testing.assert_array_equal(got, x)


class TestPositionGridReferenceDerived:
    @pytest.mark.parametrize("causal_fix", [True, False])
    def test_video_grid_matches_reference(self, causal_fix):
        expected = _ref_position_grid(2, 3, 4, 5, causal_fix=causal_fix)
        got = pos_lib.create_position_grid(2, 3, 4, 5, causal_fix=causal_fix)
        np.testing.assert_allclose(got, expected, atol=1e-7)

    def test_video_grid_fps(self):
        expected = _ref_position_grid(1, 3, 2, 2, fps=30.0)
        got = pos_lib.create_position_grid(1, 3, 2, 2, fps=30.0)
        np.testing.assert_allclose(got, expected, atol=1e-7)

    @pytest.mark.parametrize("is_causal", [True, False])
    def test_audio_grid_matches_reference(self, is_causal):
        expected = _ref_audio_position_grid(2, 7, is_causal=is_causal)
        got = pos_lib.create_audio_position_grid(2, 7, is_causal=is_causal)
        np.testing.assert_allclose(got, expected, atol=1e-7)

    def test_audio_frames_count(self):
        # generate.py:554-557: 25 latents/s
        assert pos_lib.compute_audio_frames(33, 24.0) == round(33 / 24.0 * 25)
        assert pos_lib.compute_audio_frames(65, 25.0) == 65
