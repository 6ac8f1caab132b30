"""Composed-pipeline cross-framework parity with a PSNR gate.

Every component is torch-cross-checked individually (DiT, VAEs, upsampler,
Gemma), but per-component tests cannot see error ACCUMULATION across the
stage seams. This composes the full distilled two-stage pipeline —
stage1 denoise (2 steps) -> 2x latent upsample (de/re-normalize) ->
renoise -> stage2 refine (1 step) -> tiled VAE decode — in BOTH frameworks
on shared weights and identical noise, and gates per-frame latent and RGB
PSNR at >= 35 dB (the north-star bar; real-weight PSNR vs the MLX
reference is environment-blocked, PERF.md "Real-weight access attempt" —
this is the closest buildable proxy).

Pipeline spec: reference mlx_video/generate.py:3126-3372 (two-stage
distilled orchestration); torch transcriptions reused from
test_torch_cross_dit.py / test_torch_cross_vae.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from test_torch_cross_dit import t_ltx_forward
from test_torch_cross_vae import t_latent_upsampler, t_video_decoder

from mlx_video_tpu.config import LTXModelType, LTXRopeType, tiny_test_config
from mlx_video_tpu.models.ltx.model import init_ltx_params
from mlx_video_tpu.models.ltx.upsampler import init_latent_upsampler, upsample_latents
from mlx_video_tpu.models.ltx.video_vae.decoder import DecoderConfig, init_video_decoder
from mlx_video_tpu.models.ltx.video_vae.tiling import TilingConfig, decode_with_tiling
from mlx_video_tpu.pipelines import denoise as dn
from mlx_video_tpu.pipelines.generate import decode_latents  # noqa: F401 (spec anchor)
from mlx_video_tpu.pipelines.positions import create_position_grid
from mlx_video_tpu.pipelines.schedulers import (
    STAGE_1_SIGMAS,
    STAGE_2_SIGMAS,
    subsample_refinement_sigmas,
    subsample_sigmas,
)


def psnr(a: np.ndarray, b: np.ndarray, peak: float) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)


def _torch_denoise(params, cfg, latents, positions, context, sigmas):
    """Independent Euler flow-matching loop (reference: generate.py:564-881):
    velocity = f(x_t, sigma); x0 = x_t - sigma*v; x_{next} = x0 + s_next*(x_t - x0)/s."""
    b, c, f, h, w = latents.shape
    x = latents
    for sigma, sigma_next in zip(sigmas[:-1], sigmas[1:]):
        tokens = x.reshape(b, c, -1).permute(0, 2, 1)  # (B, S, C)
        ts = torch.full(tokens.shape[:2], float(sigma), dtype=torch.float32)
        vel = t_ltx_forward(params, cfg, tokens, ts, context, positions)
        vel = vel.permute(0, 2, 1).reshape(b, c, f, h, w).double()
        xd = x.double()
        denoised = xd - float(sigma) * vel
        if sigma_next == 0.0:
            x = denoised.float()
        else:
            x = (denoised + float(sigma_next) * (xd - denoised) / float(sigma)).float()
    return x


class TestComposedPipelinePSNR:
    def test_two_stage_pipeline_psnr_gate(self):
        cfg = tiny_test_config(LTXModelType.VideoOnly, rope_type=LTXRopeType.SPLIT)
        params = init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32)
        dec_cfg = DecoderConfig(
            in_channels=16, base_channels=32, num_layers_per_block=1,
            num_upsamples=3, patch_size=4,
        )
        rng = np.random.default_rng(7)
        dec_params = init_video_decoder(jax.random.key(1), dec_cfg, dtype=jnp.float32)
        # randomize stats/tables so wrong indices can't hide behind zeros
        dec_params["latents_mean"] = jnp.asarray(rng.normal(size=(16,)).astype(np.float32) * 0.2)
        dec_params["latents_std"] = jnp.asarray(rng.uniform(0.8, 1.5, size=(16,)).astype(np.float32))
        ups_params = init_latent_upsampler(
            jax.random.key(2), in_channels=16, mid_channels=32, num_blocks=1,
            dtype=jnp.float32,
        )

        b, f0, h0, w0 = 1, 2, 2, 2
        latents0 = rng.normal(size=(b, 16, f0, h0, w0)).astype(np.float32)
        context = rng.normal(size=(b, 8, cfg.caption_channels)).astype(np.float32)
        renoise = rng.normal(size=(b, 16, f0, 2 * h0, 2 * w0)).astype(np.float32)
        s1 = subsample_sigmas(STAGE_1_SIGMAS, 2, "farthest")
        s2 = subsample_refinement_sigmas(STAGE_2_SIGMAS, 1, "farthest")
        pos1 = np.asarray(create_position_grid(b, f0, h0, w0), np.float32)
        pos2 = np.asarray(create_position_grid(b, f0, 2 * h0, 2 * w0), np.float32)
        tiling = TilingConfig.spatial_only(tile_size=64, overlap=32)  # 2 tiles/axis

        # ---------------- JAX pipeline ----------------
        v1, _ = dn.denoise(params, cfg, jnp.asarray(latents0), jnp.asarray(pos1),
                           jnp.asarray(context), s1)
        up = upsample_latents(
            ups_params, v1, dec_params["latents_mean"], dec_params["latents_std"]
        )
        lat2 = jnp.asarray(renoise) * s2[0] + up * (1.0 - s2[0])
        v2, _ = dn.denoise(params, cfg, lat2, jnp.asarray(pos2), jnp.asarray(context), s2)
        jax_latent = np.asarray(v2, np.float32)

        from mlx_video_tpu.models.ltx.video_vae.decoder import video_decoder_apply

        ts = jnp.full((b,), 0.05, dtype=jnp.float32)
        jax_rgb = decode_with_tiling(
            lambda tile: np.asarray(video_decoder_apply(
                dec_params, dec_cfg, jnp.asarray(tile), causal=True, timestep=ts
            )),
            jax_latent, tiling,
        )

        # ---------------- torch pipeline ----------------
        tv1 = _torch_denoise(params, cfg, torch.from_numpy(latents0), pos1,
                             torch.from_numpy(context), s1)
        mean = torch.as_tensor(np.asarray(dec_params["latents_mean"])).reshape(1, 16, 1, 1, 1)
        std = torch.as_tensor(np.asarray(dec_params["latents_std"])).reshape(1, 16, 1, 1, 1)
        tup = t_latent_upsampler(ups_params, tv1 * std + mean)
        tup = (tup - mean) / std
        tlat2 = torch.from_numpy(renoise) * s2[0] + tup * (1.0 - s2[0])
        tv2 = _torch_denoise(params, cfg, tlat2, pos2, torch.from_numpy(context), s2)
        torch_latent = tv2.numpy()

        torch_rgb = decode_with_tiling(
            lambda tile: t_video_decoder(
                dec_params, dec_cfg, torch.as_tensor(tile),
                torch.full((b,), 0.05), causal=True,
            ).numpy(),
            torch_latent, tiling,
        )

        # ---------------- PSNR gates ----------------
        assert jax_latent.shape == torch_latent.shape == (b, 16, f0, 4, 4)
        assert jax_rgb.shape == torch_rgb.shape == (b, 3, 9, 128, 128)
        lat_peak = float(np.abs(torch_latent).max())
        per_frame_latent = [
            psnr(jax_latent[:, :, i], torch_latent[:, :, i], lat_peak)
            for i in range(f0)
        ]
        rgb_peak = 2.0  # decoder output range [-1, 1]
        per_frame_rgb = [
            psnr(jax_rgb[:, :, i], torch_rgb[:, :, i], rgb_peak)
            for i in range(jax_rgb.shape[2])
        ]
        assert min(per_frame_latent) >= 35.0, per_frame_latent
        assert min(per_frame_rgb) >= 35.0, per_frame_rgb
