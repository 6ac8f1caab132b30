"""int8 transfer parking for low_memory aux stages (io/staging.py).

The staging transfer IS the low_memory phase cost once compute is
AOT-cached (PERF.md r3); these tests pin the codec's round-trip error
bound, pass-through behavior for small leaves, and the e2e drift of a
tiny low_memory generate with the codec on vs off.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_video_tpu.io import staging


def _host():
    return jax.devices("cpu")[0]


class TestParkUnpark:
    def test_round_trip_error_bound(self):
        # Per-group symmetric int8: worst-case abs error is half an LSB of
        # the GROUP's scale = group_amax/254 per element — verify against the
        # same grouping the codec uses.
        w = jax.random.normal(jax.random.key(0), (64, 32, 64)) * 3.0
        tree = {"conv": {"weight": w}}
        old = staging._MIN_QUANT_SIZE
        staging._MIN_QUANT_SIZE = 1024
        try:
            parked = staging.park_int8(tree, _host())
            assert staging.is_parked(parked)
            back = staging.unpark_int8(parked, jax.devices()[0])
        finally:
            staging._MIN_QUANT_SIZE = old
        wv = np.asarray(w, np.float32)
        bv = np.asarray(back["conv"]["weight"], np.float32)
        assert bv.dtype == wv.dtype
        g = staging._GROUP_SIZE
        r = wv.reshape(-1, wv.shape[-1])
        rows = r.shape[0]
        n_groups = -(-rows // g)
        pad = n_groups * g - rows
        rp = np.concatenate([r, np.zeros((pad, r.shape[-1]), np.float32)]) if pad else r
        group_amax = np.max(np.abs(rp.reshape(n_groups, g, -1)), axis=1)
        bound = np.repeat(group_amax, g, axis=0)[:rows].reshape(wv.shape) / 254.0
        assert np.max(np.abs(wv - bv) / (bound + 1e-12)) <= 1.001

    def test_group_scales_beat_per_channel(self):
        # The reason this codec exists: a channel whose amax is dominated by
        # one outlier still round-trips the rest of the channel accurately,
        # because only the outlier's GROUP pays the large scale.
        w = np.asarray(jax.random.normal(jax.random.key(2), (4096, 8))) * 0.01
        w[0, :] = 50.0  # one outlier row per channel
        old = staging._MIN_QUANT_SIZE
        staging._MIN_QUANT_SIZE = 1024
        try:
            parked = staging.park_int8({"w": jnp.asarray(w)}, _host())
            back = np.asarray(staging.unpark_int8(parked, jax.devices()[0])["w"])
        finally:
            staging._MIN_QUANT_SIZE = old
        # per-channel scale would be 50/127 ≈ 0.39 → rel err ~2000% on the
        # 0.01-magnitude bulk; per-group bounds the bulk's error by its own
        # group amax (~0.04/254)
        bulk = slice(staging._GROUP_SIZE, None)
        rel = np.abs(w[bulk] - back[bulk]) / (np.abs(w[bulk]) + 1e-12)
        assert np.median(rel) < 0.05

    def test_device_quantize_branch(self, monkeypatch):
        # On the real accelerator the params are device-resident at the
        # first park (generate.py low_memory flow): the jitted quantize must
        # not try to return Python strings. Force the branch on CPU.
        monkeypatch.setattr(staging, "_leaf_on_accelerator", lambda leaf: True)
        w = jax.random.normal(jax.random.key(3), (128, 1024)) * 2.0
        old = staging._MIN_QUANT_SIZE
        staging._MIN_QUANT_SIZE = 1024
        try:
            parked = staging.park_int8({"w": w}, _host())
            assert staging.is_parked(parked)
            back = staging.unpark_int8(parked, jax.devices()[0])
        finally:
            staging._MIN_QUANT_SIZE = old
        np.testing.assert_allclose(
            np.asarray(back["w"]), np.asarray(w), atol=float(jnp.max(jnp.abs(w))) / 60
        )

    def test_repark_already_parked_passes_through(self):
        # Bundle reuse: a second low_memory run parks a tree the first run
        # left parked. Must be a commit-to-host no-op, not a crash or a
        # double quantization.
        w = jax.random.normal(jax.random.key(4), (64, 2048))
        old = staging._MIN_QUANT_SIZE
        staging._MIN_QUANT_SIZE = 1024
        try:
            p1 = staging.park_int8({"w": w}, _host())
            p2 = staging.park_int8(p1, _host())
            assert staging.is_parked(p2)
            b1 = np.asarray(staging.unpark_int8(p1, jax.devices()[0])["w"])
            b2 = np.asarray(staging.unpark_int8(p2, jax.devices()[0])["w"])
        finally:
            staging._MIN_QUANT_SIZE = old
        np.testing.assert_array_equal(b1, b2)

    def test_unpark_begin_finish_matches_unpark(self):
        w = jax.random.normal(jax.random.key(5), (256, 512))
        old = staging._MIN_QUANT_SIZE
        staging._MIN_QUANT_SIZE = 1024
        try:
            parked = staging.park_int8({"w": w, "bias": jnp.ones((4,))}, _host())
            handle = staging.unpark_begin(parked, jax.devices()[0])
            out = staging.unpark_finish(handle)
            ref = staging.unpark_int8(parked, jax.devices()[0])
        finally:
            staging._MIN_QUANT_SIZE = old
        np.testing.assert_array_equal(np.asarray(out["w"]), np.asarray(ref["w"]))
        np.testing.assert_array_equal(np.asarray(out["bias"]), np.asarray(ref["bias"]))

    def test_small_and_int_leaves_pass_through_exact(self):
        tree = {
            "bias": jnp.arange(8, dtype=jnp.float32),
            "norm": {"weight": jnp.ones((16, 4))},  # 2D but tiny
            "idx": jnp.arange(6, dtype=jnp.int32),
        }
        parked = staging.park_int8(tree, _host())
        assert not staging.is_parked(parked)
        back = staging.unpark_int8(parked, jax.devices()[0])
        for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(back)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_bf16_dtype_restored(self):
        w = (jax.random.normal(jax.random.key(1), (32, 2048)) * 0.1).astype(jnp.bfloat16)
        old = staging._MIN_QUANT_SIZE
        staging._MIN_QUANT_SIZE = 1024
        try:
            parked = staging.park_int8({"w": w}, _host())
            back = staging.unpark_int8(parked, jax.devices()[0])
        finally:
            staging._MIN_QUANT_SIZE = old
        assert back["w"].dtype == jnp.bfloat16

    def test_none_tree(self):
        assert staging.park_int8(None, _host()) is None
        assert staging.unpark_int8(None, jax.devices()[0]) is None


class TestGenerateWithInt8Staging:
    def _bundle(self):
        from mlx_video_tpu.config import LTXModelType, tiny_test_config
        from mlx_video_tpu.models.ltx.model import init_ltx_params
        from mlx_video_tpu.models.ltx.upsampler import init_latent_upsampler
        from mlx_video_tpu.models.ltx.video_vae.decoder import (
            DecoderConfig,
            init_video_decoder,
        )
        from mlx_video_tpu.pipelines.generate import ModelBundle

        cfg = tiny_test_config(LTXModelType.VideoOnly)
        dec_cfg = DecoderConfig(
            in_channels=cfg.in_channels, base_channels=32,
            num_layers_per_block=1, num_upsamples=3, patch_size=4,
        )
        return cfg, ModelBundle(
            transformer_params=init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32),
            transformer_config=cfg,
            vae_decoder_params=init_video_decoder(jax.random.key(1), dec_cfg),
            vae_decoder_config=dec_cfg,
            upsampler_params=init_latent_upsampler(
                jax.random.key(3), in_channels=cfg.in_channels, mid_channels=32, num_blocks=1
            ),
        )

    def test_e2e_drift_vs_bf16_staging(self, tmp_path):
        """Force the codec onto every conv weight (threshold down) and bound
        the decoded-frame drift vs plain low_memory staging."""
        from mlx_video_tpu.pipelines.generate import PipelineType, generate_video
        from tests.test_generate import _text

        cfg, bundle = self._bundle()
        t_params = bundle.transformer_params
        kw = dict(
            height=64, width=64, num_frames=9, seed=0,
            pipeline=PipelineType.DISTILLED, stage1_steps=1, stage2_steps=1,
            tiling="none", dtype=jnp.float32, low_memory=True,
        )
        ref = generate_video(
            bundle, _text(cfg), output_path=tmp_path / "ref.mp4", **kw
        )
        from dataclasses import replace

        bundle2 = replace(bundle, transformer_params=t_params)
        old = staging._MIN_QUANT_SIZE
        staging._MIN_QUANT_SIZE = 256
        try:
            q = generate_video(
                bundle2, _text(cfg), output_path=tmp_path / "q.mp4",
                aux_int8_staging=True, **kw,
            )
        finally:
            staging._MIN_QUANT_SIZE = old
        assert np.all(np.isfinite(q.video))
        a = ref.video.astype(np.float32)
        b = q.video.astype(np.float32)
        mse = float(np.mean((a - b) ** 2))
        # videos are in [-1, 1]; PSNR vs 2.0 peak
        psnr = 10 * np.log10(4.0 / max(mse, 1e-12))
        assert psnr > 35.0, f"int8 staging drift too high: PSNR={psnr:.1f} dB"

    def test_two_consecutive_runs_reuse_bundle(self, tmp_path):
        """The serve pattern: two low_memory+aux_int8_staging generates on
        the SAME bundle. Run 1 leaves the aux trees host-parked; run 2 must
        re-park (pass-through) and unpark them without crashing, and produce
        the identical video."""
        from mlx_video_tpu.pipelines.generate import PipelineType, generate_video
        from tests.test_generate import _text

        cfg, bundle = self._bundle()
        kw = dict(
            height=64, width=64, num_frames=9, seed=0,
            pipeline=PipelineType.DISTILLED, stage1_steps=1, stage2_steps=1,
            tiling="none", dtype=jnp.float32, low_memory=True,
            aux_int8_staging=True,
        )
        t_params = bundle.transformer_params
        old = staging._MIN_QUANT_SIZE
        staging._MIN_QUANT_SIZE = 256
        try:
            r1 = generate_video(bundle, _text(cfg), output_path=tmp_path / "a.mp4", **kw)
            assert staging.is_parked(bundle.upsampler_params)
            # low_memory frees the transformer from the bundle after decode;
            # the caller restores it (the aux trees stay host-parked).
            bundle.transformer_params = t_params
            r2 = generate_video(bundle, _text(cfg), output_path=tmp_path / "b.mp4", **kw)
        finally:
            staging._MIN_QUANT_SIZE = old
        np.testing.assert_array_equal(r1.video, r2.video)

    @pytest.mark.parametrize("int8", [False, True])
    def test_overlap_staging_bit_exact(self, tmp_path, int8):
        """overlap_staging only changes WHEN the transfers are issued, never
        the values: on vs off must be bit-identical, int8 codec or not."""
        from mlx_video_tpu.pipelines.generate import PipelineType, generate_video
        from tests.test_generate import _text

        cfg, bundle = self._bundle()
        t_params = bundle.transformer_params
        kw = dict(
            height=64, width=64, num_frames=9, seed=0,
            pipeline=PipelineType.DISTILLED, stage1_steps=1, stage2_steps=1,
            tiling="none", dtype=jnp.float32, low_memory=True,
            aux_int8_staging=int8,
        )
        old = staging._MIN_QUANT_SIZE
        staging._MIN_QUANT_SIZE = 256
        try:
            a = generate_video(
                bundle, _text(cfg), output_path=tmp_path / "on.mp4",
                overlap_staging=True, **kw,
            )
            bundle.transformer_params = t_params
            b = generate_video(
                bundle, _text(cfg), output_path=tmp_path / "off.mp4",
                overlap_staging=False, **kw,
            )
        finally:
            staging._MIN_QUANT_SIZE = old
        np.testing.assert_array_equal(a.video, b.video)

    def test_decode_warmup_bit_exact(self, tmp_path, monkeypatch):
        """The decode-program warmup (zeros params, dummy tiles) must not
        change the output — it only pre-loads executables."""
        from mlx_video_tpu.pipelines.generate import PipelineType, generate_video
        from tests.test_generate import _text

        cfg, bundle = self._bundle()
        t_params = bundle.transformer_params
        kw = dict(
            height=64, width=64, num_frames=9, seed=0,
            pipeline=PipelineType.DISTILLED, stage1_steps=1, stage2_steps=1,
            tiling="none", dtype=jnp.float32, low_memory=True,
        )
        monkeypatch.setenv("MLX_VIDEO_WARM_DECODE", "force")
        a = generate_video(bundle, _text(cfg), output_path=tmp_path / "w.mp4", **kw)
        monkeypatch.setenv("MLX_VIDEO_WARM_DECODE", "0")
        bundle.transformer_params = t_params
        b = generate_video(bundle, _text(cfg), output_path=tmp_path / "n.mp4", **kw)
        np.testing.assert_array_equal(a.video, b.video)

    def test_tile_latent_shapes_match_dispatches(self):
        """tile_latent_shapes must enumerate exactly the distinct shapes the
        tiled decode dispatches (the warmup pre-loads one executable per
        shape)."""
        from mlx_video_tpu.models.ltx.video_vae.tiling import (
            TilingConfig,
            decode_with_tiling,
            tile_latent_shapes,
        )

        cfg = TilingConfig.default()
        lat = np.zeros((1, 4, 9, 32, 48), np.float32)
        seen = []

        def fake_decode(tile):
            seen.append(tile.shape[2:])
            f, h, w = tile.shape[2:]
            return np.zeros((1, 3, 1 + (f - 1) * 8, h * 32, w * 32), np.float32)

        decode_with_tiling(fake_decode, lat, cfg)
        assert set(seen) == set(tile_latent_shapes(lat.shape, cfg))

    def test_aux_park_device_bit_exact(self, tmp_path):
        """Parking the int8 aux trees on the compute device (no wire) must
        produce the identical video to the host park."""
        from mlx_video_tpu.pipelines.generate import PipelineType, generate_video
        from tests.test_generate import _text

        cfg, bundle = self._bundle()
        t_params = bundle.transformer_params
        kw = dict(
            height=64, width=64, num_frames=9, seed=0,
            pipeline=PipelineType.DISTILLED, stage1_steps=1, stage2_steps=1,
            tiling="none", dtype=jnp.float32, low_memory=True,
            aux_int8_staging=True,
        )
        old = staging._MIN_QUANT_SIZE
        staging._MIN_QUANT_SIZE = 256
        try:
            a = generate_video(
                bundle, _text(cfg), output_path=tmp_path / "dev.mp4",
                aux_park_device=True, **kw,
            )
            bundle.transformer_params = t_params
            b = generate_video(
                bundle, _text(cfg), output_path=tmp_path / "host.mp4",
                aux_park_device=False, **kw,
            )
        finally:
            staging._MIN_QUANT_SIZE = old
        np.testing.assert_array_equal(a.video, b.video)

    def test_flag_requires_low_memory(self):
        from mlx_video_tpu.pipelines.generate import PipelineType, generate_video
        from tests.test_generate import _text

        cfg, bundle = self._bundle()
        with pytest.raises(ValueError, match="aux_int8_staging"):
            generate_video(
                bundle, _text(cfg), height=64, width=64, num_frames=9,
                pipeline=PipelineType.DISTILLED, stage1_steps=1, stage2_steps=1,
                decode_latents_only=True, dtype=jnp.float32,
                aux_int8_staging=True,
            )
