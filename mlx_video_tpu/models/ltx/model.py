"""LTX-2 audio-video diffusion transformer, TPU-native.

Functional re-design of the reference model
(reference: mlx_video/models/ltx/ltx.py:250-906, transformer.py:39-361,
attention.py:56-142, adaln.py:9-160, feed_forward.py:5-44,
text_projection.py:5-29).

Architecture decisions that differ from the reference on purpose:

- **Pure functions over param pytrees.** Parameters are nested dicts of
  ``jnp`` arrays; every forward is ``f(params, config, inputs)``. This makes
  ``jit``/``pjit``/LoRA-merge/quantization act on plain pytrees.
- **Stacked layers + ``lax.scan``.** The 48 transformer blocks are stored
  with a leading layer axis and executed with ``lax.scan``, so the model
  compiles one block body instead of 48 unrolled copies, and FSDP sharding of
  the layer-stacked weights is a single PartitionSpec.
- **fp32 islands.** RoPE tables, timestep sinusoids, normalizations, and the
  output LayerNorm run in float32 inside a bfloat16 model, mirroring the
  reference's precision-critical paths (reference: rope.py:443-444,
  utils.py:426-440).

Weight layout: linears are stored ``(in, out)``; the safetensors loader
transposes from the PyTorch ``(out, in)`` layout once
(see mlx_video_tpu/io/weights.py).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from mlx_video_tpu.config import LTXModelConfig, LTXRopeType, TransformerConfig
from mlx_video_tpu.models.ltx import rope as rope_lib
from mlx_video_tpu.ops.attention import sdpa_flat
from mlx_video_tpu.ops.linear import init_linear, linear
from mlx_video_tpu.ops.norms import layer_norm, rms_norm


class Modality(NamedTuple):
    """Pipeline -> model interface (reference: transformer.py:13-22).

    latent:    (B, S, C) flattened latent tokens
    timesteps: (B, S_t) per-token sigmas, S_t in {1, S}
    positions: (B, n_dims, S, 2) pixel-space [start, end) bounds, or None when
               ``pe`` is precomputed
    context:   (B, S_ctx, caption_channels) text context
    context_mask: optional (B, S_ctx) 0/1 mask (converted to additive bias)
    pe:        optional precomputed (cos, sin) RoPE tables
    cross_pe:  optional precomputed (cos, sin) cross-modal RoPE tables —
               required alongside ``pe`` for the AV (audio+video) path when
               ``positions`` is None, since the cross tables derive from the
               positions' time axis
    """

    latent: jax.Array
    timesteps: jax.Array
    context: jax.Array
    positions: Optional[jax.Array] = None
    context_mask: Optional[jax.Array] = None
    pe: Optional[Tuple[jax.Array, jax.Array]] = None
    cross_pe: Optional[Tuple[jax.Array, jax.Array]] = None


# ---------------------------------------------------------------------------
# Timestep embedding / adaLN  (reference: adaln.py:9-160, utils.py:486-526)
# ---------------------------------------------------------------------------


def timestep_embedding(
    timesteps: jax.Array,
    embedding_dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jax.Array:
    """Sinusoidal embedding of 1D timesteps, fp32 (reference: utils.py:486-526)."""
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = timesteps.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None, :]
    if flip_sin_to_cos:
        return jnp.concatenate([jnp.cos(emb), jnp.sin(emb)], axis=-1)
    return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


def init_adaln(key: jax.Array, dim: int, coefficient: int = 6, dtype=jnp.float32) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "emb": {
            "timestep_embedder": {
                "linear1": init_linear(k1, 256, dim, dtype=dtype),
                "linear2": init_linear(k2, dim, dim, dtype=dtype),
            }
        },
        "linear": init_linear(k3, dim, coefficient * dim, dtype=dtype),
    }


def adaln_apply(params: dict, timestep_flat: jax.Array, dtype) -> Tuple[jax.Array, jax.Array]:
    """AdaLayerNormSingle (reference: adaln.py:9-47).

    timestep_flat: (N,) already scaled by timestep_scale_multiplier.
    Returns (modulation (N, coeff*dim), embedded_timestep (N, dim)).
    """
    proj = timestep_embedding(timestep_flat, 256).astype(dtype)
    te = params["emb"]["timestep_embedder"]
    embedded = linear(te["linear2"], jax.nn.silu(linear(te["linear1"], proj)))
    modulation = linear(params["linear"], jax.nn.silu(embedded))
    return modulation, embedded


# ---------------------------------------------------------------------------
# Attention  (reference: attention.py:56-142)
# ---------------------------------------------------------------------------


def init_attention(
    key: jax.Array,
    query_dim: int,
    heads: int,
    dim_head: int,
    context_dim: Optional[int] = None,
    dtype=jnp.float32,
) -> dict:
    inner = heads * dim_head
    ctx = query_dim if context_dim is None else context_dim
    keys = jax.random.split(key, 4)
    return {
        "to_q": init_linear(keys[0], query_dim, inner, dtype=dtype),
        "to_k": init_linear(keys[1], ctx, inner, dtype=dtype),
        "to_v": init_linear(keys[2], ctx, inner, dtype=dtype),
        "q_norm": {"weight": jnp.ones((inner,), dtype=dtype)},
        "k_norm": {"weight": jnp.ones((inner,), dtype=dtype)},
        "to_out": init_linear(keys[3], inner, query_dim, dtype=dtype),
    }


def attention_apply(
    params: dict,
    x: jax.Array,
    heads: int,
    rope_type: LTXRopeType,
    norm_eps: float = 1e-6,
    context: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    pe: Optional[Tuple[jax.Array, jax.Array]] = None,
    k_pe: Optional[Tuple[jax.Array, jax.Array]] = None,
    sp=None,
) -> jax.Array:
    """QKV -> q/k RMSNorm -> RoPE -> SDPA -> out proj (reference: attention.py:102-142).

    ``sp``: optional ``(Mesh, axis_name)`` sequence-parallel setting. Self-
    attention (the quadratic term) then runs as ring attention with the token
    axis sharded over the mesh axis (parallel/ring_attention.py); text and
    cross-modal attention keep the GSPMD path (short or replicated KV).
    """
    q = linear(params["to_q"], x)
    ctx = x if context is None else context
    k = linear(params["to_k"], ctx)
    v = linear(params["to_v"], ctx)

    q = rms_norm(q, params["q_norm"]["weight"], eps=norm_eps)
    k = rms_norm(k, params["k_norm"]["weight"], eps=norm_eps)

    is_self = context is None and k_pe is None and bias is None

    # Fused path: SPLIT-RoPE self-attention folds the rotation into the
    # Pallas flash kernel (no roped q/k round trip through HBM).
    from mlx_video_tpu.ops.attention import fused_split_rope_eligible, sdpa_flat_fused_rope

    if (
        sp is None
        and is_self
        and pe is not None
        and rope_type == LTXRopeType.SPLIT
        and fused_split_rope_eligible(q, heads, pe)
    ):
        out = sdpa_flat_fused_rope(q, k, v, heads, pe)
        return linear(params["to_out"], out)

    if pe is not None:
        q = rope_lib.apply_rotary_emb(q, pe, rope_type)
        k = rope_lib.apply_rotary_emb(k, pe if k_pe is None else k_pe, rope_type)

    if sp is not None and is_self:
        mesh, axis = sp
        n = mesh.shape[axis]
        b, s, dim = q.shape
        if s % n == 0 and n > 1:
            from mlx_video_tpu.parallel.ring_attention import ring_attention

            d_head = dim // heads
            out = ring_attention(
                q.reshape(b, s, heads, d_head),
                k.reshape(b, s, heads, d_head),
                v.reshape(b, s, heads, d_head),
                mesh,
                axis=axis,
            ).reshape(b, s, dim)
            return linear(params["to_out"], out)

    out = sdpa_flat(q, k, v, heads, bias=bias)
    return linear(params["to_out"], out)


# ---------------------------------------------------------------------------
# FeedForward / caption projection
# ---------------------------------------------------------------------------


def init_feed_forward(key: jax.Array, dim: int, mult: int = 4, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    inner = dim * mult
    return {
        "proj_in": init_linear(k1, dim, inner, dtype=dtype),
        "proj_out": init_linear(k2, inner, dim, dtype=dtype),
    }


def feed_forward_apply(params: dict, x: jax.Array) -> jax.Array:
    """Linear -> GELU(tanh) -> Linear (reference: feed_forward.py:17-40)."""
    return linear(params["proj_out"], jax.nn.gelu(linear(params["proj_in"], x), approximate=True))


def init_text_projection(key: jax.Array, in_features: int, hidden: int, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "linear1": init_linear(k1, in_features, hidden, dtype=dtype),
        "linear2": init_linear(k2, hidden, hidden, dtype=dtype),
    }


def text_projection_apply(params: dict, x: jax.Array) -> jax.Array:
    """2-layer GELU(tanh) MLP (reference: text_projection.py:5-27)."""
    return linear(params["linear2"], jax.nn.gelu(linear(params["linear1"], x), approximate=True))


# ---------------------------------------------------------------------------
# Transformer block params
# ---------------------------------------------------------------------------


def init_block(
    key: jax.Array,
    video: Optional[TransformerConfig],
    audio: Optional[TransformerConfig],
    dtype=jnp.float32,
) -> dict:
    keys = jax.random.split(key, 8)
    params: dict = {}
    if video is not None:
        params["attn1"] = init_attention(keys[0], video.dim, video.heads, video.d_head, dtype=dtype)
        params["attn2"] = init_attention(
            keys[1], video.dim, video.heads, video.d_head, context_dim=video.context_dim, dtype=dtype
        )
        params["ff"] = init_feed_forward(keys[2], video.dim, dtype=dtype)
        params["scale_shift_table"] = jnp.zeros((6, video.dim), dtype=dtype)
    if audio is not None:
        params["audio_attn1"] = init_attention(keys[3], audio.dim, audio.heads, audio.d_head, dtype=dtype)
        params["audio_attn2"] = init_attention(
            keys[4], audio.dim, audio.heads, audio.d_head, context_dim=audio.context_dim, dtype=dtype
        )
        params["audio_ff"] = init_feed_forward(keys[5], audio.dim, dtype=dtype)
        params["audio_scale_shift_table"] = jnp.zeros((6, audio.dim), dtype=dtype)
    if video is not None and audio is not None:
        # Cross-modal attention uses the audio head geometry on both directions
        # (reference: transformer.py:112-130).
        params["audio_to_video_attn"] = init_attention(
            keys[6], video.dim, audio.heads, audio.d_head, context_dim=audio.dim, dtype=dtype
        )
        params["video_to_audio_attn"] = init_attention(
            keys[7], audio.dim, audio.heads, audio.d_head, context_dim=video.dim, dtype=dtype
        )
        params["scale_shift_table_a2v_ca_audio"] = jnp.zeros((5, audio.dim), dtype=dtype)
        params["scale_shift_table_a2v_ca_video"] = jnp.zeros((5, video.dim), dtype=dtype)
    return params


def _ada_values(table: jax.Array, timestep: jax.Array, start: int, stop: int, num_params: int):
    """Slice adaLN modulation (reference: transformer.py:135-177).

    table: (num_params, dim); timestep: (B, S_t, num_params*dim).
    Returns tuple of (B, S_t, dim) tensors for indices [start, stop).
    """
    b, s_t = timestep.shape[0], timestep.shape[1]
    ts = timestep.reshape(b, s_t, num_params, -1)
    out = []
    for i in range(start, stop):
        out.append(table[i][None, None, :] + ts[:, :, i, :])
    return tuple(out)


class _ModalityArgs(NamedTuple):
    """Per-modality tensors threaded through the block scan."""

    x: jax.Array
    context: jax.Array
    context_bias: Optional[jax.Array]
    timesteps: jax.Array  # (B, S_t, 6*dim) modulation
    embedded_timestep: jax.Array  # (B, S_t, dim)
    pe: Tuple[jax.Array, jax.Array]
    cross_pe: Optional[Tuple[jax.Array, jax.Array]]
    cross_scale_shift_timestep: Optional[jax.Array]
    cross_gate_timestep: Optional[jax.Array]


def block_apply(
    bparams: dict,
    video: Optional[_ModalityArgs],
    audio: Optional[_ModalityArgs],
    video_cfg: Optional[TransformerConfig],
    audio_cfg: Optional[TransformerConfig],
    rope_type: LTXRopeType,
    norm_eps: float,
    sp=None,
    attn_cache: Optional[dict] = None,
    collect_attn: bool = False,
):
    """One AV transformer block (reference: transformer.py:221-361).

    ``attn_cache``/``collect_attn`` implement Pyramid Attention Broadcast
    (PAB, arXiv:2408.12588) for the video branch: attention outputs drift
    slowly across adjacent diffusion steps, so a cached step reuses the
    previous full step's raw SELF-attention outputs (pre-gate — the adaLN
    gate is timestep-dependent and stays fresh) and skips that QKV/softmax/
    out compute entirely. ``collect_attn`` returns {"self"} outputs for
    caching; ``attn_cache`` consumes them instead of computing. Cross
    (text) attention is always recomputed: its KV is ~128 caption tokens so
    it is a small slice of the compute, while caching it would DOUBLE the
    (L, B, S, dim) scan-carry HBM — at 19B geometry the cache is the
    difference between fitting next to the weights and OOM.
    """
    vx = video.x if video is not None else None
    ax = audio.x if audio is not None else None
    run_av = video is not None and audio is not None
    attn_outs = {}

    if video is not None:
        vshift, vscale, vgate = _ada_values(bparams["scale_shift_table"], video.timesteps, 0, 3, 6)
        if attn_cache is not None:
            a1 = attn_cache["self"]
        else:
            norm_vx = rms_norm(vx, eps=norm_eps) * (1 + vscale) + vshift
            a1 = attention_apply(
                bparams["attn1"], norm_vx, video_cfg.heads, rope_type, norm_eps, pe=video.pe, sp=sp
            )
        vx = vx + a1 * vgate
        a2 = attention_apply(
            bparams["attn2"],
            rms_norm(vx, eps=norm_eps),
            video_cfg.heads,
            rope_type,
            norm_eps,
            context=video.context,
            bias=video.context_bias,
        )
        vx = vx + a2
        if collect_attn:
            attn_outs = {"self": a1}

    if audio is not None:
        ashift, ascale, agate = _ada_values(bparams["audio_scale_shift_table"], audio.timesteps, 0, 3, 6)
        norm_ax = rms_norm(ax, eps=norm_eps) * (1 + ascale) + ashift
        ax = ax + attention_apply(
            bparams["audio_attn1"], norm_ax, audio_cfg.heads, rope_type, norm_eps, pe=audio.pe, sp=sp
        ) * agate
        ax = ax + attention_apply(
            bparams["audio_attn2"],
            rms_norm(ax, eps=norm_eps),
            audio_cfg.heads,
            rope_type,
            norm_eps,
            context=audio.context,
            bias=audio.context_bias,
        )

    if run_av:
        vx_norm3 = rms_norm(vx, eps=norm_eps)
        ax_norm3 = rms_norm(ax, eps=norm_eps)

        # 5-entry tables: 4 scale/shift (from the scale-shift adaln) + 1 gate
        # (from the gate adaln)  (reference: transformer.py:179-219, 281-339).
        a_tab = bparams["scale_shift_table_a2v_ca_audio"]
        v_tab = bparams["scale_shift_table_a2v_ca_video"]
        (scale_ca_audio_a2v, shift_ca_audio_a2v, scale_ca_audio_v2a, shift_ca_audio_v2a) = _ada_values(
            a_tab[:4], audio.cross_scale_shift_timestep, 0, 4, 4
        )
        (gate_out_v2a,) = _ada_values(a_tab[4:], audio.cross_gate_timestep, 0, 1, 1)
        (scale_ca_video_a2v, shift_ca_video_a2v, scale_ca_video_v2a, shift_ca_video_v2a) = _ada_values(
            v_tab[:4], video.cross_scale_shift_timestep, 0, 4, 4
        )
        (gate_out_a2v,) = _ada_values(v_tab[4:], video.cross_gate_timestep, 0, 1, 1)

        vx_scaled_a2v = vx_norm3 * (1 + scale_ca_video_a2v) + shift_ca_video_a2v
        ax_scaled_a2v = ax_norm3 * (1 + scale_ca_audio_a2v) + shift_ca_audio_a2v
        vx = vx + attention_apply(
            bparams["audio_to_video_attn"],
            vx_scaled_a2v,
            audio_cfg.heads,
            rope_type,
            norm_eps,
            context=ax_scaled_a2v,
            pe=video.cross_pe,
            k_pe=audio.cross_pe,
        ) * gate_out_a2v

        ax_scaled_v2a = ax_norm3 * (1 + scale_ca_audio_v2a) + shift_ca_audio_v2a
        vx_scaled_v2a = vx_norm3 * (1 + scale_ca_video_v2a) + shift_ca_video_v2a
        ax = ax + attention_apply(
            bparams["video_to_audio_attn"],
            ax_scaled_v2a,
            audio_cfg.heads,
            rope_type,
            norm_eps,
            context=vx_scaled_v2a,
            pe=audio.cross_pe,
            k_pe=video.cross_pe,
        ) * gate_out_v2a

    if video is not None:
        vshift_mlp, vscale_mlp, vgate_mlp = _ada_values(
            bparams["scale_shift_table"], video.timesteps, 3, 6, 6
        )
        vx_scaled = rms_norm(vx, eps=norm_eps) * (1 + vscale_mlp) + vshift_mlp
        vx = vx + feed_forward_apply(bparams["ff"], vx_scaled) * vgate_mlp

    if audio is not None:
        ashift_mlp, ascale_mlp, agate_mlp = _ada_values(
            bparams["audio_scale_shift_table"], audio.timesteps, 3, 6, 6
        )
        ax_scaled = rms_norm(ax, eps=norm_eps) * (1 + ascale_mlp) + ashift_mlp
        ax = ax + feed_forward_apply(bparams["audio_ff"], ax_scaled) * agate_mlp

    if collect_attn:
        return vx, ax, attn_outs
    return vx, ax


# ---------------------------------------------------------------------------
# Top-level model
# ---------------------------------------------------------------------------


def init_ltx_params(key: jax.Array, config: LTXModelConfig, dtype=jnp.bfloat16) -> dict:
    """Initialize the full parameter pytree (reference: ltx.py:291-420)."""
    video_cfg = config.get_video_config()
    audio_cfg = config.get_audio_config()
    keys = jax.random.split(key, 16)
    params: dict = {}

    if video_cfg is not None:
        params["video"] = {
            "patchify_proj": init_linear(keys[0], config.in_channels, config.inner_dim, dtype=dtype),
            "adaln_single": init_adaln(keys[1], config.inner_dim, 6, dtype=dtype),
            "caption_projection": init_text_projection(
                keys[2], config.caption_channels, config.inner_dim, dtype=dtype
            ),
            "scale_shift_table": jnp.zeros((2, config.inner_dim), dtype=dtype),
            "proj_out": init_linear(keys[3], config.inner_dim, config.out_channels, dtype=dtype),
        }
    if audio_cfg is not None:
        params["audio"] = {
            "patchify_proj": init_linear(
                keys[4], config.audio_in_channels, config.audio_inner_dim, dtype=dtype
            ),
            "adaln_single": init_adaln(keys[5], config.audio_inner_dim, 6, dtype=dtype),
            "caption_projection": init_text_projection(
                keys[6], config.audio_caption_channels, config.audio_inner_dim, dtype=dtype
            ),
            "scale_shift_table": jnp.zeros((2, config.audio_inner_dim), dtype=dtype),
            "proj_out": init_linear(keys[7], config.audio_inner_dim, config.audio_out_channels, dtype=dtype),
        }
    if video_cfg is not None and audio_cfg is not None:
        params["av"] = {
            "av_ca_video_scale_shift_adaln": init_adaln(keys[8], config.inner_dim, 4, dtype=dtype),
            "av_ca_audio_scale_shift_adaln": init_adaln(keys[9], config.audio_inner_dim, 4, dtype=dtype),
            "av_ca_a2v_gate_adaln": init_adaln(keys[10], config.inner_dim, 1, dtype=dtype),
            "av_ca_v2a_gate_adaln": init_adaln(keys[11], config.audio_inner_dim, 1, dtype=dtype),
        }

    block_keys = jax.random.split(keys[12], config.num_layers)
    per_layer = [init_block(bk, video_cfg, audio_cfg, dtype=dtype) for bk in block_keys]
    params["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *per_layer)
    return params


def _prepare_pe(
    modality: Modality, dim: int, max_pos, heads: int, config: LTXModelConfig
) -> Tuple[jax.Array, jax.Array]:
    if modality.pe is not None:
        return modality.pe
    if modality.positions is None:
        raise ValueError("Modality needs either precomputed pe or positions")
    return rope_lib.precompute_freqs_cis(
        modality.positions,
        dim=dim,
        theta=config.positional_embedding_theta,
        max_pos=max_pos,
        use_middle_indices_grid=config.use_middle_indices_grid,
        num_attention_heads=heads,
        rope_type=config.rope_type,
        double_precision=config.double_precision_rope,
    )


def _context_bias(context_mask: Optional[jax.Array], dtype) -> Optional[jax.Array]:
    """0/1 mask -> additive bias (B, 1, 1, S_ctx) (reference: ltx.py:91-107)."""
    if context_mask is None:
        return None
    if jnp.issubdtype(context_mask.dtype, jnp.floating):
        return context_mask
    bias = (context_mask.astype(dtype) - 1.0) * 1e9
    return bias.reshape(context_mask.shape[0], 1, 1, context_mask.shape[-1])


def _prepare_modality(
    mparams: dict,
    modality: Modality,
    config: LTXModelConfig,
    dim: int,
    max_pos,
    heads: int,
    av_params: Optional[dict],
    cross_scale_shift_key: str,
    cross_gate_key: str,
    cross_pe_max_pos: Optional[int],
) -> _ModalityArgs:
    """Patchify-project + timestep embeds + context proj + RoPE
    (reference: ltx.py:33-247)."""
    x = linear(mparams["patchify_proj"], modality.latent)
    b = x.shape[0]
    dtype = x.dtype

    t_scaled = modality.timesteps * config.timestep_scale_multiplier
    modulation, embedded = adaln_apply(mparams["adaln_single"], t_scaled.reshape(-1), dtype)
    modulation = modulation.reshape(b, -1, modulation.shape[-1])
    embedded = embedded.reshape(b, -1, embedded.shape[-1])

    context = text_projection_apply(mparams["caption_projection"], modality.context)
    context = context.reshape(b, -1, x.shape[-1])
    context_bias = _context_bias(modality.context_mask, modality.latent.dtype)

    pe = _prepare_pe(modality, dim, max_pos, heads, config)

    cross_pe = None
    cross_ss_t = None
    cross_gate_t = None
    if av_params is not None:
        # Cross-modal RoPE over the shared time axis only (reference: ltx.py:201-247).
        if modality.cross_pe is not None:
            cross_pe = modality.cross_pe
        elif modality.positions is None:
            raise ValueError(
                "AV (audio+video) mode derives the cross-modal RoPE from the "
                "positions' time axis: pass positions, or precompute and pass "
                "Modality.cross_pe alongside pe"
            )
        else:
            cross_pe = rope_lib.precompute_freqs_cis(
                modality.positions[:, 0:1, :],
                dim=config.audio_cross_attention_dim,
                theta=config.positional_embedding_theta,
                max_pos=[cross_pe_max_pos],
                use_middle_indices_grid=True,
                num_attention_heads=heads,
                rope_type=config.rope_type,
                double_precision=config.double_precision_rope,
            )
        av_factor = config.av_ca_timestep_scale_multiplier / config.timestep_scale_multiplier
        cross_ss, _ = adaln_apply(av_params[cross_scale_shift_key], t_scaled.reshape(-1), dtype)
        cross_ss_t = cross_ss.reshape(b, -1, cross_ss.shape[-1])
        cross_gate, _ = adaln_apply(av_params[cross_gate_key], t_scaled.reshape(-1) * av_factor, dtype)
        cross_gate_t = cross_gate.reshape(b, -1, cross_gate.shape[-1])

    return _ModalityArgs(
        x=x,
        context=context,
        context_bias=context_bias,
        timesteps=modulation,
        embedded_timestep=embedded,
        pe=pe,
        cross_pe=cross_pe,
        cross_scale_shift_timestep=cross_ss_t,
        cross_gate_timestep=cross_gate_t,
    )


def _process_output(
    mparams: dict, x: jax.Array, embedded_timestep: jax.Array, norm_eps: float
) -> jax.Array:
    """Output head: LayerNorm(no affine) -> modulate -> proj (reference: ltx.py:432-457)."""
    table = mparams["scale_shift_table"]  # (2, dim)
    shift = table[0][None, None, :] + embedded_timestep
    scale = table[1][None, None, :] + embedded_timestep
    # NOTE: the reference adds the same embedded timestep to both rows; shift
    # and scale differ only through the learned table (reference: ltx.py:443-451).
    x = layer_norm(x, eps=norm_eps)
    x = x * (1 + scale) + shift
    return linear(mparams["proj_out"], x)


def prepare_ltx_args(
    params: dict,
    config: LTXModelConfig,
    video: Optional[Modality] = None,
    audio: Optional[Modality] = None,
) -> Tuple[Optional[_ModalityArgs], Optional[_ModalityArgs]]:
    """Pre-block prep shared by ``ltx_apply`` and the pipeline-parallel
    forward (parallel/pipeline.py): patchify projection, adaLN timestep
    embeds, caption projection, RoPE tables, AV cross-modal embeds."""
    video_cfg = config.get_video_config()
    audio_cfg = config.get_audio_config()
    if video is not None and video_cfg is None:
        raise ValueError("Video is not enabled for this model")
    if audio is not None and audio_cfg is None:
        raise ValueError("Audio is not enabled for this model")

    both = video is not None and audio is not None
    av_params = params.get("av") if both else None
    cross_pe_max_pos = None
    if both:
        cross_pe_max_pos = max(
            config.positional_embedding_max_pos[0], config.audio_positional_embedding_max_pos[0]
        )

    video_args = None
    if video is not None:
        video_args = _prepare_modality(
            params["video"],
            video,
            config,
            config.inner_dim,
            config.positional_embedding_max_pos,
            config.num_attention_heads,
            av_params,
            "av_ca_video_scale_shift_adaln",
            "av_ca_a2v_gate_adaln",
            cross_pe_max_pos,
        )
    audio_args = None
    if audio is not None:
        audio_args = _prepare_modality(
            params["audio"],
            audio,
            config,
            config.audio_inner_dim,
            config.audio_positional_embedding_max_pos,
            config.audio_num_attention_heads,
            av_params,
            "av_ca_audio_scale_shift_adaln",
            "av_ca_v2a_gate_adaln",
            cross_pe_max_pos,
        )
    return video_args, audio_args


def ltx_apply(
    params: dict,
    config: LTXModelConfig,
    video: Optional[Modality] = None,
    audio: Optional[Modality] = None,
    sp=None,
    pab=None,
):
    """Full DiT forward; returns per-modality velocity predictions
    (reference: ltx.py:459-506).

    ``sp``: optional ``(Mesh, axis_name)`` — run self-attention as ring
    attention with the token axis sequence-sharded over that mesh axis
    (new capability vs the single-device reference, SURVEY §2.12).

    ``pab`` (Pyramid Attention Broadcast, arXiv:2408.12588; video-only):
    ``"collect"`` additionally returns the stacked per-layer SELF-attention
    outputs {"self": (L, B, S, D)} as a third result; passing such a cache
    back reuses them and skips the self-attention compute (text cross-attn
    is always recomputed — see block_apply) — the denoise loop broadcasts
    the cache across adjacent steps (pipelines/denoise.py
    ``attn_broadcast_interval``)."""
    video_cfg = config.get_video_config()
    audio_cfg = config.get_audio_config()
    video_args, audio_args = prepare_ltx_args(params, config, video, audio)
    collect = pab == "collect"
    cache = pab if (pab is not None and not collect) else None
    if pab is not None and audio is not None:
        raise ValueError("pab attention broadcast supports the video-only path")

    # Scan-weight formulation (MLX_VIDEO_SCAN_WEIGHTS): how the stacked
    # block params reach the scan body. Under remat training, XLA was
    # measured keeping TWO full-stack layout copies of the packed-quant FFN
    # stacks (forward and rematerialized backward each prefer their own
    # layout — 2 x 1.5 GiB at 19B q4, PERF.md r4). The alternates trade
    # that whole-stack conversion for per-layer work inside the body:
    #   xs (default)  — stacked leaves as scan xs (XLA slices per step);
    #   captured      — stacks close over the scan; the body dynamic-index
    #                   gathers layer i, so any layout conversion applies to
    #                   the SLICE (stack/48 transient), not the stack;
    #   barrier       — xs plus jax.lax.optimization_barrier on the slice,
    #                   pinning per-layer values against cross-loop layout
    #                   hoisting.
    import os as _os_sw

    scan_weights = _os_sw.environ.get("MLX_VIDEO_SCAN_WEIGHTS", "xs")

    def scan_body(carry, xs):
        if cache is not None:
            bparams, layer_cache = xs
        else:
            bparams, layer_cache = xs, None
        if scan_weights == "captured":
            layer_idx = bparams
            bparams = jax.tree.map(
                lambda s: jax.lax.dynamic_index_in_dim(s, layer_idx, 0, keepdims=False),
                params["blocks"],
            )
        elif scan_weights == "barrier":
            bparams = jax.lax.optimization_barrier(bparams)
        vx, ax = carry
        v_in = video_args._replace(x=vx) if video_args is not None else None
        a_in = audio_args._replace(x=ax) if audio_args is not None else None
        out = block_apply(
            bparams, v_in, a_in, video_cfg, audio_cfg, config.rope_type, config.norm_eps,
            sp=sp, attn_cache=layer_cache, collect_attn=collect,
        )
        vx_out, ax_out = out[0], out[1]
        if vx_out is None:
            vx_out = vx
        if ax_out is None:
            ax_out = ax
        return (vx_out, ax_out), (out[2] if collect else None)

    init_vx = video_args.x if video_args is not None else jnp.zeros((1, 1, 1))
    init_ax = audio_args.x if audio_args is not None else jnp.zeros((1, 1, 1))
    body = jax.checkpoint(scan_body) if config.gradient_checkpointing else scan_body
    if scan_weights == "captured":
        num_layers = jax.tree.leaves(params["blocks"])[0].shape[0]
        layer_ids = jnp.arange(num_layers)
        xs = (layer_ids, cache) if cache is not None else layer_ids
    else:
        xs = (params["blocks"], cache) if cache is not None else params["blocks"]
    (vx, ax), attn_cache_out = jax.lax.scan(body, (init_vx, init_ax), xs)

    v_out = None
    if video_args is not None:
        v_out = _process_output(params["video"], vx, video_args.embedded_timestep, config.norm_eps)
    a_out = None
    if audio_args is not None:
        a_out = _process_output(params["audio"], ax, audio_args.embedded_timestep, config.norm_eps)
    if collect:
        return v_out, a_out, attn_cache_out
    return v_out, a_out


def to_denoised(noisy: jax.Array, velocity: jax.Array, sigma) -> jax.Array:
    """x0 = x_t - sigma * v, fp32 island (reference: mlx_video/utils.py:404-440)."""
    dtype = noisy.dtype
    noisy_f32 = noisy.astype(jnp.float32)
    velocity_f32 = velocity.astype(jnp.float32)
    sigma_f32 = jnp.asarray(sigma, dtype=jnp.float32)
    while sigma_f32.ndim < velocity_f32.ndim:
        sigma_f32 = sigma_f32[..., None]
    return (noisy_f32 - sigma_f32 * velocity_f32).astype(dtype)
