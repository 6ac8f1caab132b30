"""Cross-FRAMEWORK parity for the DiT transformer: the full VideoOnly
forward (preprocessor -> N AV blocks -> output head) re-implemented in
PyTorch, transcribed from the reference MLX source, must match the repo's
JAX implementation on shared weights.

Extends the torch cross-check net (test_torch_cross_vae.py: VAE;
test_audio.py: vocoder) to the model where the FLOPs live. A transcription
error in the JAX DiT (wrong adaLN row order, wrong gate placement, wrong
RoPE half-split, wrong q/k-norm position, wrong output-head modulation)
will NOT be reproduced by this independent torch path.

Torch code transcribed from the reference:
- get_timestep_embedding       mlx_video/utils.py:486-526 (flip_sin_to_cos)
- AdaLayerNormSingle           mlx_video/models/ltx/adaln.py:9-160
- PixArtAlphaTextProjection    mlx_video/models/ltx/text_projection.py:5-27
- Attention (q/k RMSNorm+RoPE) mlx_video/models/ltx/attention.py:13-142
- apply_split_rotary_emb       mlx_video/models/ltx/rope.py:109-173
- BasicAVTransformerBlock      mlx_video/models/ltx/transformer.py:180-361
- _process_output              mlx_video/models/ltx/ltx.py:432-457

RoPE cos/sin tables come from the numpy transcription in
test_reference_derived.py (itself independently verified against the
reference formulas), so the full prepare->block->head chain is exercised.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from test_reference_derived import _ref_position_grid, _ref_precompute_freqs_cis

from mlx_video_tpu.config import LTXModelType, LTXRopeType, tiny_test_config
from mlx_video_tpu.models.ltx.model import Modality, init_ltx_params, ltx_apply
from mlx_video_tpu.pipelines.positions import create_position_grid

torch.set_grad_enabled(False)


# ---------------------------------------------------------------------------
# Torch transcription (weights arrive in the repo's (in, out) layout; the
# matmul x @ W is identical math to the reference's nn.Linear)
# ---------------------------------------------------------------------------


def t_lin(p, x):
    y = x @ torch.as_tensor(np.asarray(p["weight"], np.float32))
    if "bias" in p:
        y = y + torch.as_tensor(np.asarray(p["bias"], np.float32))
    return y


def t_rms(x, weight=None, eps=1e-6):
    var = (x.float() ** 2).mean(-1, keepdim=True)
    y = x * torch.rsqrt(var + eps)
    if weight is not None:
        y = y * torch.as_tensor(np.asarray(weight, np.float32))
    return y


def t_timestep_embedding(t, dim=256):
    # utils.py:486-526, flip_sin_to_cos=True, downscale_freq_shift=0
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half
    emb = t.float()[:, None] * torch.exp(exponent)[None, :]
    return torch.cat([torch.cos(emb), torch.sin(emb)], -1)


def t_adaln(p, t_flat):
    proj = t_timestep_embedding(t_flat)
    te = p["emb"]["timestep_embedder"]
    embedded = t_lin(te["linear2"], torch.nn.functional.silu(t_lin(te["linear1"], proj)))
    modulation = t_lin(p["linear"], torch.nn.functional.silu(embedded))
    return modulation, embedded


def t_gelu_tanh(x):
    return torch.nn.functional.gelu(x, approximate="tanh")


def t_apply_split_rope(x, cos_f, sin_f):
    # rope.py:109-173; x: (B, T, H*D), cos/sin: (B, H, T, D/2)
    b, h, t, dh = cos_f.shape
    x = x.reshape(b, t, h, -1).swapaxes(1, 2).float()  # (B, H, T, D)
    d = x.shape[-1]
    split = x.reshape(*x.shape[:-1], 2, d // 2)
    first, second = split[..., 0, :], split[..., 1, :]
    out_first = first * cos_f - sin_f * second
    out_second = second * cos_f + sin_f * first
    out = torch.stack([out_first, out_second], -2).reshape(b, h, t, d)
    return out.swapaxes(1, 2).reshape(b, t, h * d)


def t_apply_interleaved_rope(x, cos_f, sin_f):
    # rope.py:33-88; x: (B, T, dim), cos/sin: (B, T, dim)
    x = x.float()
    pairs = x.reshape(*x.shape[:-1], x.shape[-1] // 2, 2)
    t1, t2 = pairs[..., 0], pairs[..., 1]
    t_rot = torch.stack([-t2, t1], -1).reshape(x.shape)
    return x * cos_f + t_rot * sin_f


def t_attention(p, x, heads, pe=None, context=None, eps=1e-6, rope="split"):
    # attention.py:102-142
    q = t_lin(p["to_q"], x)
    ctx = x if context is None else context
    k = t_lin(p["to_k"], ctx)
    v = t_lin(p["to_v"], ctx)
    q = t_rms(q, p["q_norm"]["weight"], eps)
    k = t_rms(k, p["k_norm"]["weight"], eps)
    if pe is not None:
        apply = t_apply_split_rope if rope == "split" else t_apply_interleaved_rope
        q = apply(q, *pe)
        k = apply(k, *pe)
    b, tq, dim = q.shape
    dh = dim // heads
    qh = q.reshape(b, tq, heads, dh).swapaxes(1, 2)
    kh = k.reshape(b, -1, heads, dh).swapaxes(1, 2)
    vh = v.reshape(b, -1, heads, dh).swapaxes(1, 2)
    out = torch.nn.functional.scaled_dot_product_attention(qh, kh, vh)
    out = out.swapaxes(1, 2).reshape(b, tq, dim)
    return t_lin(p["to_out"], out)


def t_get_ada(table, modulation, lo, hi, n=6):
    # transformer.py:140-177: table (n, dim) + modulation (B, S, n*dim)
    b, s, _ = modulation.shape
    m = modulation.reshape(b, s, n, -1)[:, :, lo:hi, :]
    tbl = torch.as_tensor(np.asarray(table, np.float32))[None, None, lo:hi, :]
    vals = tbl + m
    return tuple(vals[:, :, i, :] for i in range(hi - lo))


def t_block(bp, x, modulation, ctx, heads, pe, eps, rope="split"):
    # transformer.py:221-361 (video-only path)
    shift_msa, scale_msa, gate_msa = t_get_ada(bp["scale_shift_table"], modulation, 0, 3)
    norm_x = t_rms(x, eps=eps) * (1 + scale_msa) + shift_msa
    x = x + t_attention(bp["attn1"], norm_x, heads, pe=pe, eps=eps, rope=rope) * gate_msa
    x = x + t_attention(bp["attn2"], t_rms(x, eps=eps), heads, context=ctx, eps=eps)
    shift_mlp, scale_mlp, gate_mlp = t_get_ada(bp["scale_shift_table"], modulation, 3, 6)
    x_scaled = t_rms(x, eps=eps) * (1 + scale_mlp) + shift_mlp
    ff = t_lin(bp["ff"]["proj_out"], t_gelu_tanh(t_lin(bp["ff"]["proj_in"], x_scaled)))
    return x + ff * gate_mlp


def t_ltx_forward(params, cfg, tokens, timesteps, context, positions):
    """ltx.py:129-158 prepare -> blocks -> 432-457 output head (VideoOnly)."""
    vp = params["video"]
    eps = cfg.norm_eps
    x = t_lin(vp["patchify_proj"], tokens)
    b, s, dim = x.shape

    t_flat = (timesteps * cfg.timestep_scale_multiplier).reshape(-1)
    modulation, embedded = t_adaln(vp["adaln_single"], t_flat)
    modulation = modulation.reshape(b, -1, modulation.shape[-1])
    embedded = embedded.reshape(b, -1, embedded.shape[-1])

    ctx = t_lin(
        vp["caption_projection"]["linear2"],
        t_gelu_tanh(t_lin(vp["caption_projection"]["linear1"], context)),
    )

    rope = "split" if cfg.rope_type.value == "split" else "interleaved"
    cos_f, sin_f = _ref_precompute_freqs_cis(
        np.asarray(positions, np.float32), dim=dim,
        theta=cfg.positional_embedding_theta,
        max_pos=list(cfg.positional_embedding_max_pos),
        use_middle=cfg.use_middle_indices_grid,
        num_heads=cfg.num_attention_heads, rope_type=rope,
    )
    pe = (torch.as_tensor(cos_f.astype(np.float32)), torch.as_tensor(sin_f.astype(np.float32)))

    n_layers = cfg.num_layers
    for layer in range(n_layers):
        bp = jax.tree.map(lambda leaf: leaf[layer], params["blocks"])
        x = t_block(bp, x, modulation, ctx, cfg.num_attention_heads, pe, eps, rope=rope)

    # output head (ltx.py:432-457)
    table = torch.as_tensor(np.asarray(vp["scale_shift_table"], np.float32))
    shift = table[0][None, None, :] + embedded
    scale = table[1][None, None, :] + embedded
    mean = x.float().mean(-1, keepdim=True)
    var = x.float().var(-1, keepdim=True, unbiased=False)
    x = (x - mean) * torch.rsqrt(var + eps)
    x = x * (1 + scale) + shift
    return t_lin(vp["proj_out"], x)


# ---------------------------------------------------------------------------


class TestTorchCrossDiT:
    @pytest.fixture(scope="class", params=[LTXRopeType.SPLIT, LTXRopeType.INTERLEAVED])
    def setup(self, request):
        cfg = tiny_test_config(LTXModelType.VideoOnly, rope_type=request.param)
        params = init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32)
        rng = np.random.default_rng(0)
        b, f, h, w = 1, 2, 4, 4
        s = f * h * w
        tokens = rng.normal(size=(b, s, cfg.in_channels)).astype(np.float32)
        # per-token timesteps exercise the per-token adaLN path
        timesteps = np.linspace(0.1, 0.9, b * s, dtype=np.float32).reshape(b, s)
        context = rng.normal(size=(b, 6, cfg.caption_channels)).astype(np.float32)
        positions = np.asarray(create_position_grid(b, f, h, w), np.float32)
        return cfg, params, tokens, timesteps, context, positions

    def test_full_forward_matches(self, setup):
        cfg, params, tokens, timesteps, context, positions = setup
        jax_out, _ = ltx_apply(
            params, cfg,
            video=Modality(
                latent=jnp.asarray(tokens), timesteps=jnp.asarray(timesteps),
                context=jnp.asarray(context), positions=jnp.asarray(positions),
            ),
        )
        torch_out = t_ltx_forward(
            params, cfg, torch.as_tensor(tokens), torch.as_tensor(timesteps),
            torch.as_tensor(context), positions,
        )
        a, bt = np.asarray(jax_out), torch_out.numpy()
        assert a.shape == bt.shape
        denom = np.abs(bt).max()
        assert np.abs(a - bt).max() / denom < 5e-4, (
            f"max abs diff {np.abs(a - bt).max():.3e} vs scale {denom:.3e}"
        )

    def test_position_grid_matches_reference_derivation(self, setup):
        cfg, params, tokens, timesteps, context, positions = setup
        ref = _ref_position_grid(1, 2, 4, 4)
        np.testing.assert_allclose(positions, np.asarray(ref, np.float32), atol=1e-6)


# ---------------------------------------------------------------------------
# AudioVideo: bidirectional cross-modal attention (transformer.py:283-344,
# MultiModalTransformerArgsPreprocessor ltx.py:163-247)
# ---------------------------------------------------------------------------


def t_prepare_simple(mp, cfg, tokens, timesteps, context, positions, dim, heads, max_pos):
    x = t_lin(mp["patchify_proj"], tokens)
    b = x.shape[0]
    t_flat = (timesteps * cfg.timestep_scale_multiplier).reshape(-1)
    modulation, embedded = t_adaln(mp["adaln_single"], t_flat)
    modulation = modulation.reshape(b, -1, modulation.shape[-1])
    embedded = embedded.reshape(b, -1, embedded.shape[-1])
    ctx = t_lin(
        mp["caption_projection"]["linear2"],
        t_gelu_tanh(t_lin(mp["caption_projection"]["linear1"], context)),
    )
    cos_f, sin_f = _ref_precompute_freqs_cis(
        np.asarray(positions, np.float32), dim=dim,
        theta=cfg.positional_embedding_theta, max_pos=max_pos,
        use_middle=cfg.use_middle_indices_grid, num_heads=heads, rope_type="split",
    )
    pe = (torch.as_tensor(cos_f.astype(np.float32)), torch.as_tensor(sin_f.astype(np.float32)))
    return x, modulation, embedded, ctx, pe


def t_prepare_cross(av, ss_key, gate_key, cfg, timesteps, positions, cross_dim, heads, cross_max_pos):
    # ltx.py:203-247: cross pe over the time axis only + two extra adalns
    b = timesteps.shape[0]
    cos_f, sin_f = _ref_precompute_freqs_cis(
        np.asarray(positions, np.float32)[:, 0:1, :], dim=cross_dim,
        theta=cfg.positional_embedding_theta, max_pos=[cross_max_pos],
        use_middle=True, num_heads=heads, rope_type="split",
    )
    cross_pe = (torch.as_tensor(cos_f.astype(np.float32)), torch.as_tensor(sin_f.astype(np.float32)))
    t_scaled = (timesteps * cfg.timestep_scale_multiplier).reshape(-1)
    factor = cfg.av_ca_timestep_scale_multiplier / cfg.timestep_scale_multiplier
    ss_mod, _ = t_adaln(av[ss_key], t_scaled)
    ss_t = ss_mod.reshape(b, -1, ss_mod.shape[-1])
    gate_mod, _ = t_adaln(av[gate_key], t_scaled * factor)
    gate_t = gate_mod.reshape(b, -1, gate_mod.shape[-1])
    return cross_pe, ss_t, gate_t


def t_get_av_ca_ada(table, ss_timestep, gate_timestep):
    # transformer.py:178-218: rows [scale1, shift1, scale2, shift2, gate]
    s1, sh1, s2, sh2 = t_get_ada(table[:4], ss_timestep, 0, 4, n=4)
    (g,) = t_get_ada(table[4:], gate_timestep, 0, 1, n=1)
    return s1, sh1, s2, sh2, g


def t_av_block(bp, vx, ax, v_mod, a_mod, v_ctx, a_ctx, v_pe, a_pe,
               v_cross, a_cross, heads_v, heads_a, eps):
    # video self + text
    shift, scale, gate = t_get_ada(bp["scale_shift_table"], v_mod, 0, 3)
    norm_vx = t_rms(vx, eps=eps) * (1 + scale) + shift
    vx = vx + t_attention(bp["attn1"], norm_vx, heads_v, pe=v_pe, eps=eps) * gate
    vx = vx + t_attention(bp["attn2"], t_rms(vx, eps=eps), heads_v, context=v_ctx, eps=eps)
    # audio self + text
    shift, scale, gate = t_get_ada(bp["audio_scale_shift_table"], a_mod, 0, 3)
    norm_ax = t_rms(ax, eps=eps) * (1 + scale) + shift
    ax = ax + t_attention(bp["audio_attn1"], norm_ax, heads_a, pe=a_pe, eps=eps) * gate
    ax = ax + t_attention(bp["audio_attn2"], t_rms(ax, eps=eps), heads_a, context=a_ctx, eps=eps)
    # bidirectional cross-modal (transformer.py:283-344)
    v_cross_pe, v_ss, v_gate = v_cross
    a_cross_pe, a_ss, a_gate = a_cross
    vx_n3, ax_n3 = t_rms(vx, eps=eps), t_rms(ax, eps=eps)
    (sc_a_a2v, sh_a_a2v, sc_a_v2a, sh_a_v2a, gate_v2a) = t_get_av_ca_ada(
        torch.as_tensor(np.asarray(bp["scale_shift_table_a2v_ca_audio"], np.float32)), a_ss, a_gate
    )
    (sc_v_a2v, sh_v_a2v, sc_v_v2a, sh_v_v2a, gate_a2v) = t_get_av_ca_ada(
        torch.as_tensor(np.asarray(bp["scale_shift_table_a2v_ca_video"], np.float32)), v_ss, v_gate
    )
    vx_s = vx_n3 * (1 + sc_v_a2v) + sh_v_a2v
    ax_s = ax_n3 * (1 + sc_a_a2v) + sh_a_a2v
    vx = vx + t_attention_kpe(bp["audio_to_video_attn"], vx_s, heads_a, v_cross_pe, a_cross_pe, ax_s, eps) * gate_a2v
    ax_s = ax_n3 * (1 + sc_a_v2a) + sh_a_v2a
    vx_s = vx_n3 * (1 + sc_v_v2a) + sh_v_v2a
    ax = ax + t_attention_kpe(bp["video_to_audio_attn"], ax_s, heads_a, a_cross_pe, v_cross_pe, vx_s, eps) * gate_v2a
    # FFNs
    shift, scale, gate = t_get_ada(bp["scale_shift_table"], v_mod, 3, 6)
    vx_s = t_rms(vx, eps=eps) * (1 + scale) + shift
    vx = vx + t_lin(bp["ff"]["proj_out"], t_gelu_tanh(t_lin(bp["ff"]["proj_in"], vx_s))) * gate
    shift, scale, gate = t_get_ada(bp["audio_scale_shift_table"], a_mod, 3, 6)
    ax_s = t_rms(ax, eps=eps) * (1 + scale) + shift
    ax = ax + t_lin(bp["audio_ff"]["proj_out"], t_gelu_tanh(t_lin(bp["audio_ff"]["proj_in"], ax_s))) * gate
    return vx, ax


def t_attention_kpe(p, x, heads, pe, k_pe, context, eps):
    # attention.py:122-138 with distinct q/k positional embeddings
    q = t_lin(p["to_q"], x)
    k = t_lin(p["to_k"], context)
    v = t_lin(p["to_v"], context)
    q = t_rms(q, p["q_norm"]["weight"], eps)
    k = t_rms(k, p["k_norm"]["weight"], eps)
    q = t_apply_split_rope(q, *pe)
    k = t_apply_split_rope(k, *k_pe)
    b, tq, dim = q.shape
    dh = dim // heads
    qh = q.reshape(b, tq, heads, dh).swapaxes(1, 2)
    kh = k.reshape(b, -1, heads, dh).swapaxes(1, 2)
    vh = v.reshape(b, -1, heads, dh).swapaxes(1, 2)
    out = torch.nn.functional.scaled_dot_product_attention(qh, kh, vh)
    return t_lin(p["to_out"], out.swapaxes(1, 2).reshape(b, tq, dim))


def t_output_head(mp, x, embedded, eps):
    table = torch.as_tensor(np.asarray(mp["scale_shift_table"], np.float32))
    shift = table[0][None, None, :] + embedded
    scale = table[1][None, None, :] + embedded
    mean = x.float().mean(-1, keepdim=True)
    var = x.float().var(-1, keepdim=True, unbiased=False)
    x = (x - mean) * torch.rsqrt(var + eps)
    return t_lin(mp["proj_out"], x * (1 + scale) + shift)


class TestTorchCrossAV:
    def test_av_forward_matches(self):
        from mlx_video_tpu.pipelines.positions import create_audio_position_grid

        cfg = tiny_test_config(LTXModelType.AudioVideo, rope_type=LTXRopeType.SPLIT)
        params = init_ltx_params(jax.random.key(1), cfg, dtype=jnp.float32)
        rng = np.random.default_rng(1)
        b, f, h, w, s_a = 1, 2, 2, 2, 6
        s_v = f * h * w
        v_tokens = rng.normal(size=(b, s_v, cfg.in_channels)).astype(np.float32)
        a_tokens = rng.normal(size=(b, s_a, cfg.audio_in_channels)).astype(np.float32)
        v_ts = np.full((b, s_v), 0.6, np.float32)
        a_ts = np.full((b, s_a), 0.6, np.float32)
        v_ctx = rng.normal(size=(b, 6, cfg.caption_channels)).astype(np.float32)
        a_ctx = rng.normal(size=(b, 6, cfg.audio_caption_channels)).astype(np.float32)
        v_pos = np.asarray(create_position_grid(b, f, h, w), np.float32)
        a_pos = np.asarray(create_audio_position_grid(b, s_a), np.float32)

        jv, ja = ltx_apply(
            params, cfg,
            video=Modality(latent=jnp.asarray(v_tokens), timesteps=jnp.asarray(v_ts),
                           context=jnp.asarray(v_ctx), positions=jnp.asarray(v_pos)),
            audio=Modality(latent=jnp.asarray(a_tokens), timesteps=jnp.asarray(a_ts),
                           context=jnp.asarray(a_ctx), positions=jnp.asarray(a_pos)),
        )

        cross_max = max(cfg.positional_embedding_max_pos[0],
                        cfg.audio_positional_embedding_max_pos[0])
        vx, v_mod, v_emb, v_ctx_t, v_pe = t_prepare_simple(
            params["video"], cfg, torch.as_tensor(v_tokens), torch.as_tensor(v_ts),
            torch.as_tensor(v_ctx), v_pos, cfg.inner_dim, cfg.num_attention_heads,
            list(cfg.positional_embedding_max_pos),
        )
        ax, a_mod, a_emb, a_ctx_t, a_pe = t_prepare_simple(
            params["audio"], cfg, torch.as_tensor(a_tokens), torch.as_tensor(a_ts),
            torch.as_tensor(a_ctx), a_pos, cfg.audio_inner_dim,
            cfg.audio_num_attention_heads, list(cfg.audio_positional_embedding_max_pos),
        )
        v_cpe, v_ss, v_gate = t_prepare_cross(
            params["av"], "av_ca_video_scale_shift_adaln", "av_ca_a2v_gate_adaln",
            cfg, torch.as_tensor(v_ts), v_pos, cfg.audio_cross_attention_dim,
            cfg.num_attention_heads, cross_max,
        )
        a_cpe, a_ss, a_gate = t_prepare_cross(
            params["av"], "av_ca_audio_scale_shift_adaln", "av_ca_v2a_gate_adaln",
            cfg, torch.as_tensor(a_ts), a_pos, cfg.audio_cross_attention_dim,
            cfg.audio_num_attention_heads, cross_max,
        )
        for layer in range(cfg.num_layers):
            bp = jax.tree.map(lambda leaf: leaf[layer], params["blocks"])
            vx, ax = t_av_block(
                bp, vx, ax, v_mod, a_mod, v_ctx_t, a_ctx_t, v_pe, a_pe,
                (v_cpe, v_ss, v_gate), (a_cpe, a_ss, a_gate),
                cfg.num_attention_heads, cfg.audio_num_attention_heads, cfg.norm_eps,
            )
        tv = t_output_head(params["video"], vx, v_emb, cfg.norm_eps)
        ta = t_output_head(params["audio"], ax, a_emb, cfg.norm_eps)

        for jx, tx in ((jv, tv), (ja, ta)):
            a_np, b_np = np.asarray(jx), tx.numpy()
            assert a_np.shape == b_np.shape
            rel = np.abs(a_np - b_np).max() / np.abs(b_np).max()
            assert rel < 5e-4, rel
