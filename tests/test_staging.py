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
        # Per-output-channel symmetric int8: worst-case abs error is half an
        # LSB = scale/2 = amax_channel/254 per element.
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
        amax = np.max(np.abs(wv), axis=(0, 1))
        assert bv.dtype == wv.dtype
        assert np.max(np.abs(wv - bv) / (amax / 254.0 + 1e-12)) <= 1.001

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
