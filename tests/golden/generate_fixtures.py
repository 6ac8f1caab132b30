"""Regenerate golden fixtures (run on CPU; commit the .npz).

Pins the seeded tiny-model numerics across refactors: DiT velocity,
VAE encode/decode round trip, scheduler sigmas, RoPE tables.
"""
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from pathlib import Path

from mlx_video_tpu.config import LTXModelType, LTXRopeType, VideoVAEConfig, tiny_test_config
from mlx_video_tpu.models.ltx.model import Modality, init_ltx_params, ltx_apply
from mlx_video_tpu.models.ltx.video_vae.decoder import DecoderConfig, init_video_decoder, video_decoder_apply
from mlx_video_tpu.models.ltx.video_vae.encoder import init_video_encoder, video_encoder_apply
from mlx_video_tpu.pipelines.positions import create_position_grid
from mlx_video_tpu.pipelines.schedulers import ltx2_scheduler
from mlx_video_tpu.models.ltx import rope

out = {}

# --- DiT velocity (SPLIT + INTERLEAVED rope) ---
for name, rt in (("split", LTXRopeType.SPLIT), ("interleaved", LTXRopeType.INTERLEAVED)):
    cfg = tiny_test_config(LTXModelType.VideoOnly, rope_type=rt, num_layers=2)
    params = init_ltx_params(jax.random.key(7), cfg, dtype=jnp.float32)
    b, f, h, w = 1, 2, 4, 4
    rng = np.random.default_rng(7)
    tokens = jnp.asarray(rng.normal(size=(b, f * h * w, cfg.in_channels)).astype(np.float32))
    pos = jnp.asarray(create_position_grid(b, f, h, w))
    ctx = jnp.asarray(rng.normal(size=(b, 8, cfg.caption_channels)).astype(np.float32))
    ts = jnp.full((b, f * h * w), 0.7, dtype=jnp.float32)
    v, _ = ltx_apply(params, cfg, video=Modality(latent=tokens, timesteps=ts, context=ctx, positions=pos))
    out[f"dit_velocity_{name}"] = np.asarray(v)

# --- AV (audio+video) forward ---
cfg = tiny_test_config(LTXModelType.AudioVideo, rope_type=LTXRopeType.SPLIT, num_layers=2)
params = init_ltx_params(jax.random.key(9), cfg, dtype=jnp.float32)
rng = np.random.default_rng(9)
b, f, h, w = 1, 2, 4, 4
vtok = jnp.asarray(rng.normal(size=(b, f * h * w, cfg.in_channels)).astype(np.float32))
atok = jnp.asarray(rng.normal(size=(b, 5, cfg.audio_in_channels)).astype(np.float32))
vpos = jnp.asarray(create_position_grid(b, f, h, w))
from mlx_video_tpu.pipelines.positions import create_audio_position_grid
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
out["av_video_velocity"] = np.asarray(vv)
out["av_audio_velocity"] = np.asarray(aa)

# --- VAE encode/decode ---
vcfg = VideoVAEConfig()
rng = np.random.default_rng(3)
enc = init_video_encoder(jax.random.key(3), vcfg, dtype=jnp.float32)
clip = jnp.asarray(rng.uniform(-1, 1, size=(1, 3, 9, 64, 64)).astype(np.float32))
lat = video_encoder_apply(enc, vcfg, clip)
out["vae_latents"] = np.asarray(lat)
dcfg = DecoderConfig(base_channels=32, num_layers_per_block=1, num_upsamples=2, in_channels=16)
dec = init_video_decoder(jax.random.key(4), dcfg, dtype=jnp.float32)
small_lat = jnp.asarray(rng.normal(size=(1, dcfg.in_channels, 2, 4, 4)).astype(np.float32))
px = video_decoder_apply(dec, dcfg, small_lat, timestep=jnp.array([0.05]))
out["vae_decoded"] = np.asarray(px)

# --- Scheduler + RoPE tables ---
out["ltx2_sigmas_40_2880"] = np.asarray(ltx2_scheduler(40, 2880))
pos = jnp.asarray(create_position_grid(1, 2, 4, 4))
pe = rope.precompute_freqs_cis(pos, dim=64, rope_type=LTXRopeType.SPLIT, num_attention_heads=4)
out["rope_split_cos"] = np.asarray(pe[0])
out["rope_split_sin"] = np.asarray(pe[1])

path = Path(__file__).parent / "fixtures.npz"
np.savez_compressed(path, **out)
print("wrote", path, {k: v.shape for k, v in out.items()})
