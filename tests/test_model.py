"""DiT model tests: shapes, jit-compile, modality combinations, adaLN math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_video_tpu.config import LTXModelType, LTXRopeType, tiny_test_config
from mlx_video_tpu.models.ltx.model import (
    Modality,
    init_ltx_params,
    ltx_apply,
    timestep_embedding,
    to_denoised,
)
from mlx_video_tpu.pipelines.positions import create_audio_position_grid, create_position_grid


def _video_inputs(cfg, b=1, f=2, h=3, w=4, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    s = f * h * w
    latent = jnp.asarray(rng.normal(size=(b, s, cfg.in_channels)).astype(np.float32), dtype=dtype)
    positions = jnp.asarray(create_position_grid(b, f, h, w))
    context = jnp.asarray(rng.normal(size=(b, 8, cfg.caption_channels)).astype(np.float32), dtype=dtype)
    timesteps = jnp.full((b, s), 0.5, dtype=dtype)
    return Modality(latent=latent, timesteps=timesteps, context=context, positions=positions)


def _audio_inputs(cfg, b=1, t=6, dtype=jnp.float32, seed=1):
    rng = np.random.default_rng(seed)
    latent = jnp.asarray(rng.normal(size=(b, t, cfg.audio_in_channels)).astype(np.float32), dtype=dtype)
    positions = jnp.asarray(create_audio_position_grid(b, t))
    context = jnp.asarray(
        rng.normal(size=(b, 8, cfg.audio_caption_channels)).astype(np.float32), dtype=dtype
    )
    timesteps = jnp.full((b, t), 0.5, dtype=dtype)
    return Modality(latent=latent, timesteps=timesteps, context=context, positions=positions)


@pytest.mark.parametrize("rope_type", [LTXRopeType.INTERLEAVED, LTXRopeType.SPLIT])
def test_video_only_forward_shapes(rope_type):
    cfg = tiny_test_config(LTXModelType.VideoOnly, rope_type=rope_type)
    params = init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32)
    video = _video_inputs(cfg)
    v, a = ltx_apply(params, cfg, video=video)
    assert a is None
    assert v.shape == (1, 2 * 3 * 4, cfg.out_channels)
    assert np.all(np.isfinite(np.asarray(v)))


def test_audio_video_forward_shapes():
    cfg = tiny_test_config(LTXModelType.AudioVideo)
    params = init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32)
    video = _video_inputs(cfg)
    audio = _audio_inputs(cfg)
    v, a = ltx_apply(params, cfg, video=video, audio=audio)
    assert v.shape == (1, 24, cfg.out_channels)
    assert a.shape == (1, 6, cfg.audio_out_channels)
    assert np.all(np.isfinite(np.asarray(v)))
    assert np.all(np.isfinite(np.asarray(a)))


def test_audio_only_forward():
    cfg = tiny_test_config(LTXModelType.AudioOnly)
    params = init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32)
    audio = _audio_inputs(cfg)
    v, a = ltx_apply(params, cfg, audio=audio)
    assert v is None
    assert a.shape == (1, 6, cfg.audio_out_channels)


def test_av_cross_attention_changes_video():
    """Audio presence must change the video prediction (bidirectional A/V attn)."""
    cfg = tiny_test_config(LTXModelType.AudioVideo)
    params = init_ltx_params(jax.random.key(3), cfg, dtype=jnp.float32)
    # Gates are zero-init; give the cross tables a nonzero gate so the path is live.
    params["blocks"]["scale_shift_table_a2v_ca_video"] = (
        params["blocks"]["scale_shift_table_a2v_ca_video"].at[:, 4].set(1.0)
    )
    video = _video_inputs(cfg)
    audio1 = _audio_inputs(cfg, seed=1)
    audio2 = _audio_inputs(cfg, seed=2)
    v1, _ = ltx_apply(params, cfg, video=video, audio=audio1)
    v2, _ = ltx_apply(params, cfg, video=video, audio=audio2)
    assert np.max(np.abs(np.asarray(v1) - np.asarray(v2))) > 1e-6


def test_jit_compiles_and_matches_eager():
    cfg = tiny_test_config(LTXModelType.VideoOnly)
    params = init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32)
    video = _video_inputs(cfg)
    eager_v, _ = ltx_apply(params, cfg, video=video)
    jitted = jax.jit(lambda p, m: ltx_apply(p, cfg, video=m)[0])
    jit_v = jitted(params, video)
    np.testing.assert_allclose(np.asarray(eager_v), np.asarray(jit_v), atol=1e-5)


def test_context_mask_ignores_masked_tokens():
    cfg = tiny_test_config(LTXModelType.VideoOnly)
    params = init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32)
    video = _video_inputs(cfg)
    mask = jnp.ones((1, 8), dtype=jnp.int32).at[0, 4:].set(0)
    rng = np.random.default_rng(9)
    ctx2 = np.asarray(video.context).copy()
    ctx2[:, 4:] = rng.normal(size=ctx2[:, 4:].shape)
    v1, _ = ltx_apply(params, cfg, video=video._replace(context_mask=mask))
    v2, _ = ltx_apply(
        params, cfg, video=video._replace(context=jnp.asarray(ctx2), context_mask=mask)
    )
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-5)


def test_scalar_timestep_broadcast():
    """(B, 1) timesteps behave like uniform per-token timesteps."""
    cfg = tiny_test_config(LTXModelType.VideoOnly)
    params = init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32)
    video = _video_inputs(cfg)
    v_full, _ = ltx_apply(params, cfg, video=video)
    v_scalar, _ = ltx_apply(
        params, cfg, video=video._replace(timesteps=jnp.full((1, 1), 0.5))
    )
    np.testing.assert_allclose(np.asarray(v_full), np.asarray(v_scalar), atol=1e-4)


def test_precomputed_pe_matches_positions():
    from mlx_video_tpu.models.ltx import rope as rope_lib

    cfg = tiny_test_config(LTXModelType.VideoOnly)
    params = init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32)
    video = _video_inputs(cfg)
    pe = rope_lib.precompute_freqs_cis(
        video.positions,
        dim=cfg.inner_dim,
        theta=cfg.positional_embedding_theta,
        max_pos=cfg.positional_embedding_max_pos,
        use_middle_indices_grid=cfg.use_middle_indices_grid,
        num_attention_heads=cfg.num_attention_heads,
        rope_type=cfg.rope_type,
    )
    v1, _ = ltx_apply(params, cfg, video=video)
    v2, _ = ltx_apply(params, cfg, video=video._replace(pe=pe))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-5)


def test_av_precomputed_pe_with_cross_pe():
    """The documented precomputed-pe contract must hold for the AV path:
    positions=None works when pe AND cross_pe are precomputed (previously
    crashed dereferencing positions for the cross-modal RoPE), and a
    missing cross_pe fails with a clear error."""
    from mlx_video_tpu.models.ltx import rope as rope_lib

    cfg = tiny_test_config(LTXModelType.AudioVideo)
    params = init_ltx_params(jax.random.key(3), cfg, dtype=jnp.float32)
    params["blocks"]["scale_shift_table_a2v_ca_video"] = (
        params["blocks"]["scale_shift_table_a2v_ca_video"].at[:, 4].set(1.0)
    )
    video = _video_inputs(cfg)
    audio = _audio_inputs(cfg)
    cross_max = max(
        cfg.positional_embedding_max_pos[0], cfg.audio_positional_embedding_max_pos[0]
    )

    def pe_for(mod, dim, max_pos, heads):
        return rope_lib.precompute_freqs_cis(
            mod.positions, dim=dim, theta=cfg.positional_embedding_theta,
            max_pos=max_pos, use_middle_indices_grid=cfg.use_middle_indices_grid,
            num_attention_heads=heads, rope_type=cfg.rope_type,
        )

    def cross_pe_for(mod, heads):
        return rope_lib.precompute_freqs_cis(
            mod.positions[:, 0:1, :], dim=cfg.audio_cross_attention_dim,
            theta=cfg.positional_embedding_theta, max_pos=[cross_max],
            use_middle_indices_grid=True, num_attention_heads=heads,
            rope_type=cfg.rope_type,
        )

    v_pe = pe_for(video, cfg.inner_dim, cfg.positional_embedding_max_pos,
                  cfg.num_attention_heads)
    a_pe = pe_for(audio, cfg.audio_inner_dim, cfg.audio_positional_embedding_max_pos,
                  cfg.audio_num_attention_heads)
    v_cpe = cross_pe_for(video, cfg.num_attention_heads)
    a_cpe = cross_pe_for(audio, cfg.audio_num_attention_heads)

    ref_v, ref_a = ltx_apply(params, cfg, video=video, audio=audio)
    out_v, out_a = ltx_apply(
        params, cfg,
        video=video._replace(positions=None, pe=v_pe, cross_pe=v_cpe),
        audio=audio._replace(positions=None, pe=a_pe, cross_pe=a_cpe),
    )
    np.testing.assert_allclose(np.asarray(out_v), np.asarray(ref_v), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(ref_a), atol=1e-5)

    with pytest.raises(ValueError, match="cross_pe"):
        ltx_apply(params, cfg,
                  video=video._replace(positions=None, pe=v_pe),
                  audio=audio._replace(positions=None, pe=a_pe))


def test_timestep_embedding_matches_oracle():
    t = jnp.asarray([0.0, 500.0, 1000.0])
    emb = np.asarray(timestep_embedding(t, 256))
    half = 128
    # fp32 frequency computation: fp32 exp() rounding is amplified by the
    # t=1000 phase, so the oracle must use the same precision as the model.
    exponent = np.exp(
        (-np.log(np.float32(10000.0)) * np.arange(half, dtype=np.float32) / np.float32(half)).astype(
            np.float32
        )
    ).astype(np.float32)
    args = np.asarray(t, dtype=np.float32)[:, None] * exponent[None, :]
    expected = np.concatenate([np.cos(args), np.sin(args)], axis=-1)
    # Tolerance bounded by fp32 trig of args up to 1000 rad.
    np.testing.assert_allclose(emb, expected, atol=2e-3)


def test_to_denoised_fp32_island():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 4, 3)).astype(np.float32)).astype(jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(1, 4, 3)).astype(np.float32)).astype(jnp.bfloat16)
    out = to_denoised(x, v, 0.5)
    assert out.dtype == jnp.bfloat16
    expected = np.asarray(x, dtype=np.float32) - 0.5 * np.asarray(v, dtype=np.float32)
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32), expected, atol=0.05)

    # Per-token sigma of shape (B, S) broadcasts over channels.
    sig = jnp.asarray(rng.uniform(size=(1, 4)).astype(np.float32))
    out2 = to_denoised(x.astype(jnp.float32), v.astype(jnp.float32), sig)
    expected2 = np.asarray(x, dtype=np.float32) - np.asarray(sig)[..., None] * np.asarray(
        v, dtype=np.float32
    )
    np.testing.assert_allclose(np.asarray(out2), expected2, atol=1e-5)


def test_zero_init_tables_give_identity_modulation():
    """With zero adaLN linear weights, the block modulation reduces to plain
    rms_norm residual blocks; sanity-check output changes with input."""
    cfg = tiny_test_config(LTXModelType.VideoOnly)
    params = init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32)
    v1, _ = ltx_apply(params, cfg, video=_video_inputs(cfg, seed=0))
    v2, _ = ltx_apply(params, cfg, video=_video_inputs(cfg, seed=5))
    assert np.max(np.abs(np.asarray(v1) - np.asarray(v2))) > 1e-6


class TestScanWeightFormulations:
    """MLX_VIDEO_SCAN_WEIGHTS alternates (captured / barrier) must be
    numerically identical to the default xs formulation, forward and grad —
    they exist purely to steer XLA layout assignment of the stacked block
    leaves under remat training (PERF.md r4: 2x full-stack copies)."""

    def test_forward_and_grad_equal_across_modes(self, monkeypatch):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from mlx_video_tpu.config import LTXModelType, tiny_test_config
        from mlx_video_tpu.models.ltx.model import Modality, init_ltx_params, ltx_apply
        from mlx_video_tpu.pipelines.positions import create_position_grid

        cfg = tiny_test_config(LTXModelType.VideoOnly, num_layers=3)
        cfg = cfg.replace(gradient_checkpointing=True) if hasattr(cfg, "replace") else cfg
        params = init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32)
        b, f, h, w = 1, 2, 4, 4
        tokens = jax.random.normal(jax.random.key(1), (b, f * h * w, cfg.in_channels))
        ts = jnp.full((b, f * h * w), 0.6)
        pos = jnp.asarray(create_position_grid(b, f, h, w))
        ctx = jax.random.normal(jax.random.key(2), (b, 8, cfg.caption_channels))

        def loss(p):
            v, _ = ltx_apply(
                p, cfg, video=Modality(latent=tokens, timesteps=ts, context=ctx, positions=pos)
            )
            return jnp.sum(v.astype(jnp.float32) ** 2)

        results = {}
        for mode in ("xs", "captured", "barrier"):
            monkeypatch.setenv("MLX_VIDEO_SCAN_WEIGHTS", mode)
            jax.clear_caches()  # env is read at trace time
            val, grads = jax.value_and_grad(loss)(params)
            results[mode] = (float(val), grads)
        ref_val, ref_grads = results["xs"]
        for mode in ("captured", "barrier"):
            val, grads = results[mode]
            assert np.isclose(val, ref_val, rtol=1e-5), (mode, val, ref_val)
            for a, b_ in zip(jax.tree.leaves(ref_grads), jax.tree.leaves(grads)):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5
                )
