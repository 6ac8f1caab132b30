"""Golden-fixture regression tests (SURVEY §7.1: golden-fixture harness).

fixtures.npz pins the seeded tiny-model numerics; any refactor of the
model/VAE/scheduler/RoPE code must reproduce these to tight fp32 tolerance.
Regenerate deliberately with tests/golden/generate_fixtures.py when a
numerics change is intended, and say why in the commit.
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

FIXTURES = Path(__file__).parent / "golden" / "fixtures.npz"


@pytest.fixture(scope="module")
def golden():
    return dict(np.load(FIXTURES))


def _dit_velocity(rope_name):
    from mlx_video_tpu.config import LTXModelType, LTXRopeType, tiny_test_config
    from mlx_video_tpu.models.ltx.model import Modality, init_ltx_params, ltx_apply
    from mlx_video_tpu.pipelines.positions import create_position_grid

    rt = LTXRopeType.SPLIT if rope_name == "split" else LTXRopeType.INTERLEAVED
    cfg = tiny_test_config(LTXModelType.VideoOnly, rope_type=rt, num_layers=2)
    params = init_ltx_params(jax.random.key(7), cfg, dtype=jnp.float32)
    b, f, h, w = 1, 2, 4, 4
    rng = np.random.default_rng(7)
    tokens = jnp.asarray(rng.normal(size=(b, f * h * w, cfg.in_channels)).astype(np.float32))
    pos = jnp.asarray(create_position_grid(b, f, h, w))
    ctx = jnp.asarray(rng.normal(size=(b, 8, cfg.caption_channels)).astype(np.float32))
    ts = jnp.full((b, f * h * w), 0.7, dtype=jnp.float32)
    v, _ = ltx_apply(
        params, cfg, video=Modality(latent=tokens, timesteps=ts, context=ctx, positions=pos)
    )
    return np.asarray(v)


@pytest.mark.parametrize("rope_name", ["split", "interleaved"])
def test_dit_velocity(golden, rope_name):
    np.testing.assert_allclose(
        _dit_velocity(rope_name), golden[f"dit_velocity_{rope_name}"], atol=2e-5, rtol=1e-5
    )


def test_av_forward(golden):
    from mlx_video_tpu.config import LTXModelType, LTXRopeType, tiny_test_config
    from mlx_video_tpu.models.ltx.model import Modality, init_ltx_params, ltx_apply
    from mlx_video_tpu.pipelines.positions import (
        create_audio_position_grid,
        create_position_grid,
    )

    cfg = tiny_test_config(LTXModelType.AudioVideo, rope_type=LTXRopeType.SPLIT, num_layers=2)
    params = init_ltx_params(jax.random.key(9), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(9)
    b, f, h, w = 1, 2, 4, 4
    vtok = jnp.asarray(rng.normal(size=(b, f * h * w, cfg.in_channels)).astype(np.float32))
    atok = jnp.asarray(rng.normal(size=(b, 5, cfg.audio_in_channels)).astype(np.float32))
    vpos = jnp.asarray(create_position_grid(b, f, h, w))
    apos = jnp.asarray(create_audio_position_grid(b, 5))
    vctx = jnp.asarray(rng.normal(size=(b, 8, cfg.caption_channels)).astype(np.float32))
    actx = jnp.asarray(rng.normal(size=(b, 8, cfg.audio_caption_channels)).astype(np.float32))
    ts_v = jnp.full((b, f * h * w), 0.5, dtype=jnp.float32)
    ts_a = jnp.full((b, 5), 0.5, dtype=jnp.float32)
    vv, aa = ltx_apply(
        params, cfg,
        video=Modality(latent=vtok, timesteps=ts_v, context=vctx, positions=vpos),
        audio=Modality(latent=atok, timesteps=ts_a, context=actx, positions=apos),
    )
    np.testing.assert_allclose(np.asarray(vv), golden["av_video_velocity"], atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(aa), golden["av_audio_velocity"], atol=2e-5, rtol=1e-5)


def test_vae_encode(golden):
    from mlx_video_tpu.config import VideoVAEConfig
    from mlx_video_tpu.models.ltx.video_vae.encoder import (
        init_video_encoder,
        video_encoder_apply,
    )

    vcfg = VideoVAEConfig()
    rng = np.random.default_rng(3)
    enc = init_video_encoder(jax.random.key(3), vcfg, dtype=jnp.float32)
    clip = jnp.asarray(rng.uniform(-1, 1, size=(1, 3, 9, 64, 64)).astype(np.float32))
    lat = video_encoder_apply(enc, vcfg, clip)
    np.testing.assert_allclose(np.asarray(lat), golden["vae_latents"], atol=5e-5, rtol=1e-4)


def test_vae_decode(golden):
    from mlx_video_tpu.models.ltx.video_vae.decoder import (
        DecoderConfig,
        init_video_decoder,
        video_decoder_apply,
    )

    rng = np.random.default_rng(3)
    rng.uniform(-1, 1, size=(1, 3, 9, 64, 64))  # keep RNG stream aligned with generator
    dcfg = DecoderConfig(base_channels=32, num_layers_per_block=1, num_upsamples=2, in_channels=16)
    dec = init_video_decoder(jax.random.key(4), dcfg, dtype=jnp.float32)
    small_lat = jnp.asarray(rng.normal(size=(1, dcfg.in_channels, 2, 4, 4)).astype(np.float32))
    px = video_decoder_apply(dec, dcfg, small_lat, timestep=jnp.array([0.05]))
    np.testing.assert_allclose(np.asarray(px), golden["vae_decoded"], atol=5e-5, rtol=1e-4)


def test_scheduler_sigmas(golden):
    from mlx_video_tpu.pipelines.schedulers import ltx2_scheduler

    np.testing.assert_allclose(
        np.asarray(ltx2_scheduler(40, 2880)), golden["ltx2_sigmas_40_2880"], atol=1e-6
    )


def test_rope_tables(golden):
    from mlx_video_tpu.config import LTXRopeType
    from mlx_video_tpu.models.ltx import rope
    from mlx_video_tpu.pipelines.positions import create_position_grid

    pos = jnp.asarray(create_position_grid(1, 2, 4, 4))
    pe = rope.precompute_freqs_cis(
        pos, dim=64, rope_type=LTXRopeType.SPLIT, num_attention_heads=4
    )
    np.testing.assert_allclose(np.asarray(pe[0]), golden["rope_split_cos"], atol=1e-6)
    np.testing.assert_allclose(np.asarray(pe[1]), golden["rope_split_sin"], atol=1e-6)
