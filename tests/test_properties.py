"""Property-based tests (hypothesis) for the pure-math surfaces.

The golden/reference-derived fixtures pin specific values; these pin the
INVARIANTS that must hold for every input — tile coverage, normalize-exact
constant blending, monotone schedules, quantization error bounds — so
shape-dependent
edge cases (ragged last tiles, tiny dims, odd step counts) can't regress
silently. All CPU/numpy; no jit compiles in the hot loop except quant.
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

settings.register_profile("suite", max_examples=30, deadline=None)
settings.load_profile("suite")


class TestPadRound:
    @given(h=st.integers(1, 4096), w=st.integers(1, 4096), d=st.sampled_from([8, 32, 64]))
    def test_pad_dimensions_invariants(self, h, w, d):
        from mlx_video_tpu.pipelines.generate import pad_dimensions

        H, W, crop = pad_dimensions(h, w, d)
        assert H % d == 0 and W % d == 0
        assert 0 <= H - h < d and 0 <= W - w < d
        if crop is None:
            assert (H, W) == (h, w)
        else:
            top, left, ch, cw = crop
            assert (ch, cw) == (h, w)
            assert 0 <= top <= H - h and 0 <= left <= W - w

    @given(n=st.integers(1, 10_000))
    def test_round_frames_minimal_1_plus_8k(self, n):
        from mlx_video_tpu.pipelines.generate import round_frames

        r = round_frames(n)
        assert r % 8 == 1 and r >= n and r - n < 8


class TestTiling:
    @given(
        size=st.integers(2, 64),
        overlap=st.integers(0, 16),
        dim=st.integers(1, 512),
    )
    def test_spatial_intervals_cover_and_overlap(self, size, overlap, dim):
        from mlx_video_tpu.models.ltx.video_vae.tiling import split_in_spatial

        if overlap >= size:
            overlap = size - 1
        iv = split_in_spatial(size, overlap, dim)
        assert iv.starts[0] == 0 and iv.ends[-1] == dim
        for s, e in zip(iv.starts, iv.ends):
            assert s < e
        # contiguous coverage (abutting allowed at overlap=0), and every
        # blend ramp fits inside the actual overlap with the previous tile
        for i in range(1, len(iv.starts)):
            assert iv.starts[i] <= iv.ends[i - 1], "gap between tiles"
            assert iv.ends[i - 1] - iv.starts[i] >= iv.left_ramps[i]

    @given(
        size=st.integers(3, 32),
        overlap=st.integers(1, 8),
        dim=st.integers(2, 128),
        scale=st.sampled_from([1, 8, 32]),
    )
    def test_spatial_masks_cover_every_position(self, size, overlap, dim, scale):
        """Every output position must receive POSITIVE total blend weight —
        decode normalizes by the accumulated weight (tiling.py
        decode_with_tiling), so positivity (not partition-of-unity) is the
        correctness condition; a zero-weight pixel would be garbage."""
        from mlx_video_tpu.models.ltx.video_vae.tiling import (
            map_spatial_slice,
            split_in_spatial,
        )

        if overlap >= size:
            overlap = size - 1
        iv = split_in_spatial(size, overlap, dim)
        acc = np.zeros(dim * scale, np.float64)
        for s, e, lr, rr in zip(iv.starts, iv.ends, iv.left_ramps, iv.right_ramps):
            sl, mask = map_spatial_slice(s, e, lr, rr, scale)
            acc[sl] += mask
        assert acc.min() > 1e-6, f"dead output positions: min weight {acc.min()}"

    @given(
        f=st.integers(2, 12),
        hw=st.integers(2, 5),
        t_tile=st.integers(2, 6),
        s_tile=st.integers(2, 4),
        overlap=st.integers(1, 3),
    )
    def test_constant_decode_blends_to_constant(self, f, hw, t_tile, s_tile, overlap):
        """End-to-end through decode_with_tiling: an identity decoder that
        returns all-ones tiles must reconstruct an all-ones video for ANY
        tile/overlap geometry — seams, causal temporal mapping, ragged last
        tiles and the normalize step all cancel exactly."""
        from mlx_video_tpu.models.ltx.video_vae.tiling import (
            SpatialTilingConfig,
            TemporalTilingConfig,
            TilingConfig,
            decode_with_tiling,
        )

        t_tile = max(2, min(t_tile, f))
        s_tile = max(2, min(s_tile, hw))
        t_ov = min(overlap, t_tile - 1)
        s_ov = min(overlap, s_tile - 1)
        # real scales: the config classes enforce the reference's pixel/frame
        # minimums (>=64 px / >=16 frames), which are latent 2 at (32, 8)
        ss, ts = 32, 8

        def ones_decoder(tile):
            b, c, tf, th, tw = tile.shape
            return np.ones((b, 3, 1 + (tf - 1) * ts, th * ss, tw * ss), np.float32)

        cfg = TilingConfig(
            spatial_config=SpatialTilingConfig(
                tile_size_in_pixels=s_tile * ss, tile_overlap_in_pixels=s_ov * ss
            ),
            temporal_config=TemporalTilingConfig(
                tile_size_in_frames=t_tile * ts, tile_overlap_in_frames=t_ov * ts
            ),
        )
        latents = np.zeros((1, 4, f, hw, hw), np.float32)
        out = decode_with_tiling(
            ones_decoder, latents, cfg, spatial_scale=ss, temporal_scale=ts
        )
        assert out.shape == (1, 3, 1 + (f - 1) * ts, hw * ss, hw * ss)
        np.testing.assert_allclose(out, 1.0, atol=1e-5)


class TestSchedulers:
    @given(steps=st.integers(1, 8), method=st.sampled_from(["farthest", "uniform"]))
    def test_subsample_monotone_and_bounded(self, steps, method):
        from mlx_video_tpu.pipelines.schedulers import STAGE_1_SIGMAS, subsample_sigmas

        sub = subsample_sigmas(STAGE_1_SIGMAS, steps, method)
        assert len(sub) == steps + 1
        assert sub[0] == STAGE_1_SIGMAS[0] and sub[-1] == STAGE_1_SIGMAS[-1]
        assert all(a > b for a, b in zip(sub, sub[1:])), "sigmas must decrease"
        assert set(sub) <= set(STAGE_1_SIGMAS), "subsample must pick existing sigmas"

    @given(steps=st.integers(1, 60), tokens=st.integers(64, 40_000))
    def test_ltx2_scheduler_shape_and_monotonicity(self, steps, tokens):
        from mlx_video_tpu.pipelines.schedulers import ltx2_scheduler

        sig = np.asarray(ltx2_scheduler(steps=steps, num_tokens=tokens), np.float64)
        assert sig.shape == (steps + 1,)
        assert sig[-1] == 0.0 and sig[0] <= 1.0
        assert np.all(np.diff(sig) < 0), "sigmas must strictly decrease"


class TestQuantization:
    @given(
        out_dim=st.integers(1, 8),
        groups=st.integers(1, 4),
        bits=st.sampled_from([2, 4, 8]),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_affine_round_trip_error_bound(self, out_dim, groups, bits, seed):
        """|w - dq(q(w))| <= scale/2 per group — the defining guarantee of
        round-to-nearest affine quantization in the MLX layout."""
        import jax.numpy as jnp

        from mlx_video_tpu.ops.quant import dequantize_affine, quantize_affine

        g = 32  # group size must divide in_dim; 32 keeps packing exact for all bits
        rng = np.random.default_rng(seed)
        w = rng.normal(size=(out_dim, groups * g)).astype(np.float32)
        packed, scales, biases = quantize_affine(jnp.asarray(w), group_size=g, bits=bits)
        deq = np.asarray(
            dequantize_affine(packed, scales, biases, bits=bits, dtype=jnp.float32),
            np.float32,
        )
        err = np.abs(w - deq).reshape(out_dim, groups, g)
        bound = np.asarray(scales)[..., None] * 0.5 + 1e-6
        assert np.all(err <= bound), (err.max(), bound.min())


class TestBatching:
    @given(
        n=st.integers(1, 40),
        bs=st.integers(1, 8),
        shuffle=st.booleans(),
        seed=st.integers(0, 1000),
    )
    def test_batch_groups_cover_and_pad(self, n, bs, shuffle, seed):
        from mlx_video_tpu.trainer.datasets import _batch_index_groups

        class _DS:
            def __len__(self):
                return n

        groups = _batch_index_groups(_DS(), bs, shuffle, seed)
        assert all(len(gr) == bs for gr in groups), "every batch padded to batch_size"
        seen = {i for gr in groups for i in gr}
        assert seen == set(range(n)), "every sample appears at least once"
        assert len(groups) == -(-n // bs)


class TestStreamingDecode:
    @given(
        f=st.integers(3, 12),
        t_tile=st.integers(2, 4),
        overlap=st.integers(1, 2),
        seed=st.integers(0, 100),
    )
    def test_streamed_chunks_reassemble_exactly(self, f, t_tile, overlap, seed):
        """on_frames_ready emissions are contiguous, cover every frame once,
        and concatenate bit-exactly to the returned full video — the
        streaming path must never emit a frame a future tile could still
        touch (or the mp4 writer would bake an unblended seam)."""
        from mlx_video_tpu.models.ltx.video_vae.tiling import (
            TemporalTilingConfig,
            TilingConfig,
            decode_with_tiling,
        )

        t_tile = max(2, min(t_tile, f))
        t_ov = min(overlap, t_tile - 1)
        ts = 8
        rng = np.random.default_rng(seed)

        def decoder(tile):
            b, c, tf, th, tw = tile.shape
            # deterministic content derived from the tile values so chunk
            # equality is meaningful
            base = np.asarray(tile, np.float32).mean()
            out = np.full((b, 3, 1 + (tf - 1) * ts, th * 4, tw * 4), base, np.float32)
            out += np.arange(out.shape[2], dtype=np.float32).reshape(1, 1, -1, 1, 1)
            return out

        cfg = TilingConfig(
            spatial_config=None,
            temporal_config=TemporalTilingConfig(
                tile_size_in_frames=t_tile * ts, tile_overlap_in_frames=t_ov * ts
            ),
        )
        latents = rng.normal(size=(1, 4, f, 2, 2)).astype(np.float32)

        chunks = []
        def on_ready(frames, start):
            chunks.append((start, frames.copy()))

        out = decode_with_tiling(
            decoder, latents, cfg, spatial_scale=4, temporal_scale=ts,
            on_frames_ready=on_ready,
        )
        assert chunks, "nothing streamed"
        pos = 0
        for start, frames in chunks:
            assert start == pos, f"non-contiguous emission at {start} (expected {pos})"
            np.testing.assert_array_equal(frames, out[:, :, start : start + frames.shape[2]])
            pos += frames.shape[2]
        assert pos == out.shape[2], "streamed chunks don't cover the video"
