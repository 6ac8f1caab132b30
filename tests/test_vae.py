"""Video VAE tests: conv causality, patchify order, tiling math, round trip.

Mirrors the intent of reference tests/test_vae_streaming.py with independent
oracles.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_video_tpu.config import VideoVAEConfig
from mlx_video_tpu.models.ltx.video_vae import ops
from mlx_video_tpu.models.ltx.video_vae.blocks import _depth_to_space, _space_to_depth
from mlx_video_tpu.models.ltx.video_vae.conv import causal_conv3d, init_conv3d, temporal_causal_pad
from mlx_video_tpu.models.ltx.video_vae.decoder import (
    DecoderConfig,
    init_video_decoder,
    video_decoder_apply,
)
from mlx_video_tpu.models.ltx.video_vae.encoder import init_video_encoder, video_encoder_apply
from mlx_video_tpu.models.ltx.video_vae.tiling import (
    SpatialTilingConfig,
    TemporalTilingConfig,
    TilingConfig,
    compute_trapezoidal_mask_1d,
    decode_with_tiling,
    map_spatial_slice,
    split_in_spatial,
    split_in_temporal,
)


TINY_ENCODER_BLOCKS = (
    ("res_x", {"num_layers": 1}),
    ("compress_space_res", {"multiplier": 2}),
    ("res_x", {"num_layers": 1}),
    ("compress_time_res", {"multiplier": 2}),
    ("compress_all_res", {"multiplier": 2}),
)


def tiny_vae_config():
    return VideoVAEConfig(
        in_channels=3, out_channels=8, latent_channels=8, patch_size=4,
        encoder_blocks=TINY_ENCODER_BLOCKS,
    )


def tiny_decoder_config():
    return DecoderConfig(
        in_channels=8, base_channels=32, num_layers_per_block=1, num_upsamples=3, patch_size=4,
    )


class TestCausalConv:
    def test_causal_output_independent_of_future(self, rng):
        """Frame t of a causal conv must not depend on frames > t."""
        params = init_conv3d(jax.random.key(0), 2, 3, 3)
        x = jnp.asarray(rng.normal(size=(1, 5, 4, 4, 2)).astype(np.float32))
        y_full = causal_conv3d(params, x, 3, 1, causal=True)
        x_mod = x.at[:, 3:].set(0.0)
        y_mod = causal_conv3d(params, x_mod, 3, 1, causal=True)
        np.testing.assert_allclose(np.asarray(y_full[:, :3]), np.asarray(y_mod[:, :3]), atol=1e-5)

    def test_temporal_pad_replicates_first_frame(self, rng):
        x = jnp.asarray(rng.normal(size=(1, 3, 2, 2, 1)).astype(np.float32))
        padded = temporal_causal_pad(x, 3, causal=True)
        assert padded.shape[1] == 5
        np.testing.assert_array_equal(np.asarray(padded[:, 0]), np.asarray(x[:, 0]))
        np.testing.assert_array_equal(np.asarray(padded[:, 1]), np.asarray(x[:, 0]))

    def test_shape_preserved_stride1(self, rng):
        params = init_conv3d(jax.random.key(0), 4, 6, 3)
        x = jnp.asarray(rng.normal(size=(2, 5, 8, 8, 4)).astype(np.float32))
        assert causal_conv3d(params, x, 3, 1, causal=True).shape == (2, 5, 8, 8, 6)
        assert causal_conv3d(params, x, 3, 1, causal=False).shape == (2, 5, 8, 8, 6)

    def test_strided_causal_downsample(self, rng):
        params = init_conv3d(jax.random.key(0), 4, 4, 3)
        x = jnp.asarray(rng.normal(size=(1, 9, 8, 8, 4)).astype(np.float32))
        y = causal_conv3d(params, x, 3, (2, 2, 2), causal=True)
        # (9 + 2 pad - 3) // 2 + 1 = 5 frames, spatial (8 + 2 - 3)//2 + 1 = 4
        assert y.shape == (1, 5, 4, 4, 4)

    @pytest.mark.parametrize("kd,stride", [(3, (1, 1, 1)), (3, (2, 2, 2)), (1, (1, 1, 1)), (3, (1, 2, 2))])
    def test_via_2d_matches_native_3d(self, rng, kd, stride):
        """conv3d_via_2d (the TPU-compile-friendly lowering) == native
        lax 3-D conv for every kernel/stride shape the VAE uses."""
        from jax import lax

        from mlx_video_tpu.models.ltx.video_vae.conv import conv3d_via_2d

        ci, co = 5, 7
        x = jnp.asarray(rng.normal(size=(2, 6 + kd - 1, 9, 9, ci)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(kd, 3, 3, ci, co)).astype(np.float32) * 0.1)
        got = conv3d_via_2d(x, w, stride)
        want = lax.conv_general_dilated(
            x, w, stride, "VALID", dimension_numbers=("NDHWC", "DHWIO", "NDHWC")
        )
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4)

    def test_reflect_padding_excludes_boundary(self):
        params = {"weight": jnp.zeros((1, 3, 1, 1, 1)).at[0, 0, 0, 0, 0].set(1.0),
                  "bias": jnp.zeros((1,))}
        # Kernel picks the TOP neighbor: at row 0 with reflect padding this is
        # row 1 mirrored (boundary excluded).
        x = jnp.arange(4, dtype=jnp.float32).reshape(1, 1, 4, 1, 1)
        y = causal_conv3d(params, x, (1, 3, 1), 1, causal=False, padding_mode="reflect")
        np.testing.assert_allclose(np.asarray(y)[0, 0, :, 0, 0], [1.0, 0.0, 1.0, 2.0])


class TestPatchify:
    def test_round_trip(self, rng):
        x = jnp.asarray(rng.normal(size=(1, 2, 8, 8, 3)).astype(np.float32))
        p = ops.patchify(x, 4, 1)
        assert p.shape == (1, 2, 2, 2, 48)
        np.testing.assert_allclose(np.asarray(ops.unpatchify(p, 4, 1)), np.asarray(x), atol=1e-6)

    def test_channel_order_width_before_height(self):
        """Packed channel order is (c, pt, width, height) — width-patch index
        varies slower than height-patch (reference ops.py:34-44 einops
        'b c (f p) (h q) (w r) -> b (c p r q) f h w')."""
        h = w = 2
        x = np.zeros((1, h * 2, w * 2, 1), dtype=np.float32)
        # encode pixel coordinates: value = 10*row + col
        for r in range(h * 2):
            for c in range(w * 2):
                x[0, r, c, 0] = 10 * r + c
        xt = jnp.asarray(x)[:, None]  # (B, F=1, H, W, C)
        p = np.asarray(ops.patchify(xt, patch_size_hw=2, patch_size_t=1))[0, 0, 0, 0]
        # channel index = (ir * q + iq) where ir = width-patch, iq = height-patch
        # pixel at patch-offset (iq, ir) within patch (0,0) is value 10*iq + ir
        expected = [10 * iq + ir for ir in range(2) for iq in range(2)]
        np.testing.assert_allclose(p, expected)

    def test_space_depth_round_trip(self, rng):
        x = jnp.asarray(rng.normal(size=(1, 4, 4, 4, 6)).astype(np.float32))
        d = _space_to_depth(x, (2, 2, 2))
        assert d.shape == (1, 2, 2, 2, 48)
        np.testing.assert_allclose(np.asarray(_depth_to_space(d, (2, 2, 2))), np.asarray(x), atol=1e-6)


class TestTrapezoidalMask:
    def test_no_ramps_all_ones(self):
        np.testing.assert_array_equal(compute_trapezoidal_mask_1d(5, 0, 0), np.ones(5))

    def test_values_in_range(self):
        m = compute_trapezoidal_mask_1d(20, 5, 5)
        assert np.all(m >= 0) and np.all(m <= 1)
        assert m[10] == 1.0

    def test_adjacent_tiles_sum_to_one(self):
        """Right fade-out of tile A + left fade-in of tile B must sum to 1 in
        the overlap (weighted blend is then a convex combination)."""
        overlap = 4
        a = compute_trapezoidal_mask_1d(12, 0, overlap)
        b = compute_trapezoidal_mask_1d(12, overlap, 0)
        np.testing.assert_allclose(a[-overlap:] + b[:overlap], np.ones(overlap), atol=1e-6)

    def test_left_starts_from_0(self):
        m = compute_trapezoidal_mask_1d(10, 3, 0, left_starts_from_0=True)
        assert m[0] == 0.0
        m2 = compute_trapezoidal_mask_1d(10, 3, 0, left_starts_from_0=False)
        assert m2[0] > 0.0


class TestIntervals:
    def test_spatial_no_split_needed(self):
        iv = split_in_spatial(16, 2, 10)
        assert iv.starts == [0] and iv.ends == [10]

    def test_spatial_cover_and_overlap(self):
        iv = split_in_spatial(8, 2, 20)
        assert iv.starts[0] == 0 and iv.ends[-1] == 20
        for s, e in zip(iv.starts[1:], iv.ends[:-1]):
            assert s < e  # consecutive tiles overlap

    def test_temporal_causal_adjustment(self):
        iv = split_in_temporal(8, 2, 20)
        sp = split_in_spatial(8, 2, 20)
        assert iv.starts[0] == sp.starts[0]
        for i in range(1, len(iv.starts)):
            assert iv.starts[i] == sp.starts[i] - 1
            assert iv.left_ramps[i] == sp.left_ramps[i] + 1

    def test_config_validation(self):
        with pytest.raises(ValueError):
            SpatialTilingConfig(100, 0)  # not divisible by 32
        with pytest.raises(ValueError):
            SpatialTilingConfig(512, 512)  # overlap >= size
        with pytest.raises(ValueError):
            TemporalTilingConfig(12, 0)  # < 16
        with pytest.raises(ValueError):
            TemporalTilingConfig(64, 63)  # not divisible by 8

    def test_auto_heuristics(self):
        assert TilingConfig.auto(256, 256, 33) is None
        cfg = TilingConfig.auto(1024, 1024, 33)
        assert cfg is not None and cfg.spatial_config is not None
        cfg = TilingConfig.auto(256, 256, 129)
        assert cfg is not None and cfg.temporal_config is not None
        big = TilingConfig.auto(1024, 1024, 257)
        assert big == TilingConfig.aggressive()


def _fake_decode(tile: np.ndarray, temporal_scale=8, spatial_scale=32) -> np.ndarray:
    """Shape-exact fake decoder with causal frame mapping: output frame 0 maps
    to latent frame 0; frame i>0 maps to latent 1 + (i-1)//ts."""
    b, c, f, h, w = tile.shape
    out_f = 1 + (f - 1) * temporal_scale
    t_index = np.concatenate([[0], 1 + (np.arange(out_f - 1) // temporal_scale)])
    up = tile[:, :3][:, :, t_index]
    up = np.repeat(np.repeat(up, spatial_scale, axis=3), spatial_scale, axis=4)
    return up


class TestTiledDecode:
    def test_tiled_matches_full_for_tilelocal_decoder(self, rng):
        """For a pointwise (tile-local) decoder, tiled blending must exactly
        reproduce the full decode — validates interval/mask/accounting."""
        latents = rng.normal(size=(1, 4, 12, 4, 4)).astype(np.float32)
        full = _fake_decode(latents)
        cfg = TilingConfig(temporal_config=TemporalTilingConfig(32, 8))
        tiled = decode_with_tiling(
            _fake_decode, latents, cfg, spatial_scale=32, temporal_scale=8
        )
        np.testing.assert_allclose(tiled, full, atol=1e-5)

    def test_spatial_and_temporal_tiling(self, rng):
        # Reduced scales keep the output buffer small while still exercising
        # 3-D tile splits with overlap in every dimension.
        latents = rng.normal(size=(1, 4, 10, 48, 48)).astype(np.float32)

        def fake(tile):
            return _fake_decode(tile, temporal_scale=4, spatial_scale=8)

        full = fake(latents)
        cfg = TilingConfig(
            spatial_config=SpatialTilingConfig(256, 64),
            temporal_config=TemporalTilingConfig(32, 8),
        )
        tiled = decode_with_tiling(fake, latents, cfg, spatial_scale=8, temporal_scale=4)
        np.testing.assert_allclose(tiled, full, atol=1e-5)

    def test_on_frames_ready_accounting(self, rng):
        """Streamed frame ranges must be contiguous, disjoint, complete, and
        identical to the final output (reference: tests/test_vae_streaming.py
        TestProgressiveFrameSaving intent)."""
        latents = rng.normal(size=(1, 4, 16, 2, 2)).astype(np.float32)
        cfg = TilingConfig(temporal_config=TemporalTilingConfig(32, 8))
        chunks = []

        def on_ready(frames, start):
            chunks.append((start, frames.copy()))

        out = decode_with_tiling(_fake_decode, latents, cfg, on_frames_ready=on_ready)
        assert len(chunks) > 1
        pos = 0
        for start, frames in chunks:
            assert start == pos
            pos += frames.shape[2]
        assert pos == out.shape[2] == 1 + (16 - 1) * 8
        streamed = np.concatenate([f for _, f in chunks], axis=2)
        np.testing.assert_allclose(streamed, out, atol=1e-5)

    def test_device_blend_matches_host_blend(self, rng):
        """decode_with_tiling_device (device-canvas blending, r5 readback
        optimization) must reproduce the host-blend path: same interval math,
        same fp32 accumulation, same emission points."""
        from mlx_video_tpu.models.ltx.video_vae.tiling import decode_with_tiling_device

        latents = rng.normal(size=(1, 4, 10, 48, 48)).astype(np.float32)

        def fake(tile):
            return _fake_decode(np.asarray(tile), temporal_scale=4, spatial_scale=8)

        cfg = TilingConfig(
            spatial_config=SpatialTilingConfig(256, 64),
            temporal_config=TemporalTilingConfig(32, 8),
        )
        host = decode_with_tiling(fake, latents, cfg, spatial_scale=8, temporal_scale=4)

        chunks = []

        def on_ready(frames, start):
            chunks.append((start, frames.copy()))

        dev = decode_with_tiling_device(
            fake, latents, cfg, spatial_scale=8, temporal_scale=4,
            on_frames_ready=on_ready,
        )
        assert dev.dtype == np.float32
        np.testing.assert_allclose(dev, host, atol=1e-4)
        # emission accounting identical to the host path
        pos = 0
        for start, frames in chunks:
            assert start == pos
            pos += frames.shape[2]
        assert pos == dev.shape[2]
        np.testing.assert_allclose(
            np.concatenate([f for _, f in chunks], axis=2), dev, atol=1e-6
        )

    def test_device_blend_fp16_fetch_close(self, rng):
        from mlx_video_tpu.models.ltx.video_vae.tiling import decode_with_tiling_device

        latents = rng.normal(size=(1, 4, 10, 24, 24)).astype(np.float32)

        def fake(tile):
            return _fake_decode(np.asarray(tile), temporal_scale=4, spatial_scale=8)

        cfg = TilingConfig(spatial_config=SpatialTilingConfig(128, 64))
        host = decode_with_tiling(fake, latents, cfg, spatial_scale=8, temporal_scale=4)
        dev = decode_with_tiling_device(
            fake, latents, cfg, spatial_scale=8, temporal_scale=4,
            fetch_dtype=np.float16,
        )
        assert dev.dtype == np.float32
        # fp16 fetch rounding ~2^-11 relative on a ~N(0,1) signal
        np.testing.assert_allclose(dev, host, atol=5e-3)


class TestVideoVAE:
    def test_encoder_shapes(self, rng):
        cfg = tiny_vae_config()
        params = init_video_encoder(jax.random.key(0), cfg)
        # tiny blocks: patchify/4, space x2, time x2, all x2 => spatial /16, temporal /4
        video = jnp.asarray(rng.normal(size=(1, 3, 9, 32, 32)).astype(np.float32))
        latents = video_encoder_apply(params, cfg, video)
        assert latents.shape == (1, 8, 3, 2, 2)
        assert np.all(np.isfinite(np.asarray(latents)))

    def test_encoder_chunked_matches_monolithic(self, rng):
        from mlx_video_tpu.models.ltx.video_vae.encoder import video_encoder_apply_chunked

        cfg = tiny_vae_config()
        params = init_video_encoder(jax.random.key(0), cfg)
        video = jnp.asarray(rng.normal(size=(1, 3, 9, 32, 32)).astype(np.float32))
        mono = video_encoder_apply(params, cfg, video)
        chunked = video_encoder_apply_chunked(params, cfg, video)
        np.testing.assert_allclose(np.asarray(chunked), np.asarray(mono), atol=1e-5)

    def test_encoder_compress_all_x_y_block(self, rng):
        """compress_all_x_y = strided CausalConv3d with channel multiplier
        (reference video_vae.py:108-118); must work in both apply paths."""
        from mlx_video_tpu.models.ltx.video_vae.encoder import video_encoder_apply_chunked

        cfg = VideoVAEConfig(
            in_channels=3, out_channels=8, latent_channels=8, patch_size=4,
            encoder_blocks=(
                ("res_x", {"num_layers": 1}),
                ("compress_all_x_y", {"multiplier": 2}),
                ("compress_all_res", {"multiplier": 2}),
            ),
        )
        params = init_video_encoder(jax.random.key(0), cfg)
        video = jnp.asarray(rng.normal(size=(1, 3, 9, 32, 32)).astype(np.float32))
        mono = video_encoder_apply(params, cfg, video)
        chunked = video_encoder_apply_chunked(params, cfg, video)
        assert mono.shape == (1, 8, 3, 2, 2)
        np.testing.assert_allclose(np.asarray(chunked), np.asarray(mono), atol=1e-5)

    def test_encoder_frame_validation(self, rng):
        cfg = tiny_vae_config()
        params = init_video_encoder(jax.random.key(0), cfg)
        video = jnp.asarray(rng.normal(size=(1, 3, 8, 32, 32)).astype(np.float32))
        with pytest.raises(ValueError, match="1 \\+ 8\\*k"):
            video_encoder_apply(params, cfg, video)

    def test_decoder_shapes(self, rng):
        cfg = tiny_decoder_config()
        params = init_video_decoder(jax.random.key(0), cfg)
        latents = jnp.asarray(rng.normal(size=(1, 8, 2, 2, 2)).astype(np.float32))
        out = video_decoder_apply(params, cfg, latents, noise_key=jax.random.key(1))
        # temporal: 1 + (2*2*2 - 1 frames) ... three (2,2,2) upsamples each drop
        # first frame: f' = 2 -> 4-1=3 -> 6-1=5 -> 10-1=9; spatial 2*8*4 = 64
        assert out.shape == (1, 3, 9, 64, 64)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_decoder_jit_and_determinism(self, rng):
        cfg = tiny_decoder_config()
        params = init_video_decoder(jax.random.key(0), cfg)
        latents = jnp.asarray(rng.normal(size=(1, 8, 2, 2, 2)).astype(np.float32))
        fn = jax.jit(lambda p, x: video_decoder_apply(p, cfg, x, noise_key=jax.random.key(7)))
        out1 = fn(params, latents)
        out2 = fn(params, latents)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=0)

    def test_decoder_no_noise_without_key(self, rng):
        cfg = tiny_decoder_config()
        params = init_video_decoder(jax.random.key(0), cfg)
        latents = jnp.asarray(rng.normal(size=(1, 8, 2, 2, 2)).astype(np.float32))
        a = video_decoder_apply(params, cfg, latents, noise_key=None)
        b = video_decoder_apply(params, cfg, latents, noise_key=None)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)

    def test_round_trip_geometry(self, rng):
        """Encoder latents feed the decoder: shape contract check."""
        enc_cfg = tiny_vae_config()
        enc = init_video_encoder(jax.random.key(0), enc_cfg)
        video = jnp.asarray(rng.normal(size=(1, 3, 9, 32, 32)).astype(np.float32))
        latents = video_encoder_apply(enc, enc_cfg, video)
        dec_cfg = tiny_decoder_config()
        dec = init_video_decoder(jax.random.key(1), dec_cfg)
        out = video_decoder_apply(dec, dec_cfg, latents)
        assert out.shape[0:2] == (1, 3)
        assert np.all(np.isfinite(np.asarray(out)))


class TestChunkedDecode:
    def test_chunked_matches_monolithic(self, rng):
        from mlx_video_tpu.models.ltx.video_vae.decoder import (
            DecoderConfig,
            init_video_decoder,
            video_decoder_apply,
            video_decoder_apply_chunked,
        )

        cfg = DecoderConfig(in_channels=8, base_channels=32, num_layers_per_block=2,
                            num_upsamples=3, patch_size=4)
        params = init_video_decoder(jax.random.key(0), cfg, dtype=jnp.float32)
        lat = jnp.asarray(rng.normal(size=(1, 8, 2, 4, 4)).astype(np.float32))
        a = video_decoder_apply(params, cfg, lat, timestep=jnp.array([0.05]),
                                noise_key=jax.random.key(2))
        b = video_decoder_apply_chunked(params, cfg, lat, timestep=jnp.array([0.05]),
                                        noise_key=jax.random.key(2))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_chunked_no_conditioning(self, rng):
        from mlx_video_tpu.models.ltx.video_vae.decoder import (
            DecoderConfig,
            init_video_decoder,
            video_decoder_apply,
            video_decoder_apply_chunked,
        )

        cfg = DecoderConfig(in_channels=8, base_channels=32, num_layers_per_block=1,
                            num_upsamples=2, patch_size=4, timestep_conditioning=False)
        params = init_video_decoder(jax.random.key(0), cfg, dtype=jnp.float32)
        lat = jnp.asarray(rng.normal(size=(1, 8, 2, 4, 4)).astype(np.float32))
        np.testing.assert_array_equal(
            np.asarray(video_decoder_apply(params, cfg, lat)),
            np.asarray(video_decoder_apply_chunked(params, cfg, lat)),
        )
