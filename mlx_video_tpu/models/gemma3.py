"""Gemma-3 text language model, TPU-native.

The reference wraps ``mlx_vlm``'s Gemma3Model
(reference: mlx_video/models/ltx/text_encoder.py:47-267); here the model is
implemented directly in JAX. Architecture (Gemma-3 text):

- embeddings scaled by sqrt(hidden_size);
- sandwich-norm decoder layers: input_layernorm -> attention ->
  post_attention_layernorm, pre_feedforward_layernorm -> GeGLU MLP ->
  post_feedforward_layernorm (all Gemma RMSNorm: x * (1 + weight), fp32);
- GQA attention with per-head q/k RMSNorm, NEOX-style (rotate-half) RoPE,
  query scaling query_pre_attn_scalar**-0.5;
- alternating local(sliding window, rope_local_base_freq) / global
  (rope_theta) layers: layer i is global when
  (i % sliding_window_pattern) == pattern - 1
  (reference: text_encoder.py:121-134).

The hidden-states contract matches the reference exactly
(text_encoder.py:104-148): [scaled embeddings] + per-layer outputs for all
but the last layer + [final norm output] = num_layers + 1 entries.

NOTE: the reference applies the FULL causal mask to sliding layers too
(text_encoder.py:118 sets sliding_mask = full mask; window 1024 >= the 1024
max prompt length makes this equivalent). We implement the true sliding
mask, which coincides on seq_len <= window and is correct beyond it.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mlx_video_tpu.ops.linear import linear


@dataclass(frozen=True)
class Gemma3TextConfig:
    vocab_size: int = 262208
    hidden_size: int = 3840
    num_hidden_layers: int = 48
    num_attention_heads: int = 16
    num_key_value_heads: int = 8
    head_dim: int = 256
    intermediate_size: int = 15360
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1_000_000.0
    rope_local_base_freq: float = 10_000.0
    sliding_window: int = 1024
    sliding_window_pattern: int = 6
    query_pre_attn_scalar: float = 256.0

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "Gemma3TextConfig":
        d = d.get("text_config", d)
        kw = {}
        for f in cls.__dataclass_fields__:
            if f in d:
                kw[f] = d[f]
        # newer HF configs express the pattern via layer_types
        if "sliding_window_pattern" not in d and "layer_types" in d:
            types = d["layer_types"]
            try:
                kw["sliding_window_pattern"] = types.index("full_attention") + 1
            except ValueError:
                kw["sliding_window_pattern"] = len(types) + 1
        return cls(**kw)

    def is_global_layer(self, i: int) -> bool:
        return i % self.sliding_window_pattern == self.sliding_window_pattern - 1


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _init_lin(key, i, o, dtype):
    s = i**-0.5
    return {"weight": jax.random.uniform(key, (i, o), jnp.float32, -s, s).astype(dtype)}


def init_gemma3_params(key: jax.Array, config: Gemma3TextConfig, dtype=jnp.bfloat16) -> dict:
    h = config.hidden_size
    kv = config.num_key_value_heads * config.head_dim
    q = config.num_attention_heads * config.head_dim
    keys = jax.random.split(key, 3)
    layer_keys = jax.random.split(keys[0], config.num_hidden_layers)

    def init_layer(lk):
        ks = jax.random.split(lk, 8)
        return {
            "input_layernorm": {"weight": jnp.zeros((h,), dtype)},
            "post_attention_layernorm": {"weight": jnp.zeros((h,), dtype)},
            "pre_feedforward_layernorm": {"weight": jnp.zeros((h,), dtype)},
            "post_feedforward_layernorm": {"weight": jnp.zeros((h,), dtype)},
            "self_attn": {
                "q_proj": _init_lin(ks[0], h, q, dtype),
                "k_proj": _init_lin(ks[1], h, kv, dtype),
                "v_proj": _init_lin(ks[2], h, kv, dtype),
                "o_proj": _init_lin(ks[3], q, h, dtype),
                "q_norm": {"weight": jnp.zeros((config.head_dim,), dtype)},
                "k_norm": {"weight": jnp.zeros((config.head_dim,), dtype)},
            },
            "mlp": {
                "gate_proj": _init_lin(ks[4], h, config.intermediate_size, dtype),
                "up_proj": _init_lin(ks[5], h, config.intermediate_size, dtype),
                "down_proj": _init_lin(ks[6], config.intermediate_size, h, dtype),
            },
        }

    layers = [init_layer(lk) for lk in layer_keys]
    return {
        "embed_tokens": {
            "weight": (jax.random.normal(keys[1], (config.vocab_size, h)) * 0.02).astype(dtype)
        },
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs, 0), *layers),
        "norm": {"weight": jnp.zeros((h,), dtype)},
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def gemma_rms_norm(params: dict, x: jax.Array, eps: float) -> jax.Array:
    """Gemma RMSNorm: fp32, scale by (1 + weight)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(var + eps)
    return (out * (1.0 + params["weight"].astype(jnp.float32))).astype(dtype)


def _rope_neox(x: jax.Array, positions: jax.Array, base: float) -> jax.Array:
    """Rotate-half RoPE over (B, H, T, D); positions (B, T) int."""
    d = x.shape[-1]
    inv_freq = 1.0 / (base ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    angles = positions.astype(jnp.float32)[:, None, :, None] * inv_freq[None, None, None, :]
    cos, sin = jnp.cos(angles), jnp.sin(angles)
    xf = x.astype(jnp.float32)
    x1, x2 = xf[..., : d // 2], xf[..., d // 2 :]
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


def _attention(
    p: dict,
    x: jax.Array,
    mask_bias: jax.Array,
    positions: jax.Array,
    config: Gemma3TextConfig,
    rope_base: float,
    kv_cache: Optional[Tuple[jax.Array, jax.Array, jax.Array]] = None,
):
    b, t, _ = x.shape
    nh, nkv, hd = config.num_attention_heads, config.num_key_value_heads, config.head_dim
    q = linear(p["q_proj"], x).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
    k = linear(p["k_proj"], x).reshape(b, t, nkv, hd).transpose(0, 2, 1, 3)
    v = linear(p["v_proj"], x).reshape(b, t, nkv, hd).transpose(0, 2, 1, 3)

    q = gemma_rms_norm(p["q_norm"], q, config.rms_norm_eps)
    k = gemma_rms_norm(p["k_norm"], k, config.rms_norm_eps)

    q = _rope_neox(q, positions, rope_base)
    k = _rope_neox(k, positions, rope_base)

    new_cache = None
    if kv_cache is not None:
        k_buf, v_buf, offset = kv_cache
        k_buf = jax.lax.dynamic_update_slice(k_buf, k, (0, 0, offset, 0))
        v_buf = jax.lax.dynamic_update_slice(v_buf, v, (0, 0, offset, 0))
        k, v = k_buf, v_buf
        new_cache = (k_buf, v_buf, offset + t)

    scale = config.query_pre_attn_scalar**-0.5
    # GQA: repeat kv heads
    rep = nh // nkv
    k = jnp.repeat(k, rep, axis=1)
    v = jnp.repeat(v, rep, axis=1)

    logits = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)) * scale
    logits = logits + mask_bias
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, nh * hd)
    return linear(p["o_proj"], out), new_cache


def _mlp(p: dict, x: jax.Array) -> jax.Array:
    gate = jax.nn.gelu(linear(p["gate_proj"], x), approximate=True)
    return linear(p["down_proj"], gate * linear(p["up_proj"], x))


def _layer(p, x, mask_bias, positions, config, rope_base, kv_cache=None):
    attn_out, new_cache = _attention(
        p["self_attn"], gemma_rms_norm(p["input_layernorm"], x, config.rms_norm_eps),
        mask_bias, positions, config, rope_base, kv_cache,
    )
    x = x + gemma_rms_norm(p["post_attention_layernorm"], attn_out, config.rms_norm_eps)
    mlp_out = _mlp(p["mlp"], gemma_rms_norm(p["pre_feedforward_layernorm"], x, config.rms_norm_eps))
    return x + gemma_rms_norm(p["post_feedforward_layernorm"], mlp_out, config.rms_norm_eps), new_cache


def causal_mask_bias(
    seq_len: int,
    attention_mask: Optional[jax.Array],
    window: Optional[int] = None,
) -> jax.Array:
    """Additive (B|1, 1, T, T) bias: causal + padding (+ sliding window)
    (reference: text_encoder.py:58-81)."""
    qi = jnp.arange(seq_len)[:, None]
    ki = jnp.arange(seq_len)[None, :]
    allowed = ki <= qi
    if window is not None:
        allowed = jnp.logical_and(allowed, qi - ki < window)
    bias = jnp.where(allowed, 0.0, -1e9).astype(jnp.float32)[None, None]
    if attention_mask is not None:
        pad = jnp.where(attention_mask.astype(bool), 0.0, -1e9).astype(jnp.float32)
        bias = bias + pad[:, None, None, :]
    return bias


def _layer_schedule(config: Gemma3TextConfig):
    """Per-layer (is_global, rope_base) arrays for the scan."""
    is_global = jnp.asarray(
        [config.is_global_layer(i) for i in range(config.num_hidden_layers)]
    )
    bases = jnp.asarray(
        [
            config.rope_theta if config.is_global_layer(i) else config.rope_local_base_freq
            for i in range(config.num_hidden_layers)
        ],
        dtype=jnp.float32,
    )
    return is_global, bases


def gemma3_hidden_states(
    params: dict,
    config: Gemma3TextConfig,
    input_ids: jax.Array,
    attention_mask: Optional[jax.Array] = None,
) -> List[jax.Array]:
    """All 49 hidden states for the LTX-2 feature extractor
    (reference contract: text_encoder.py:104-148): [scaled embeddings] +
    outputs of layers 0..n-2 + [final norm of layer n-1's output]."""
    b, t = input_ids.shape
    h = params["embed_tokens"]["weight"][input_ids]
    h = h * jnp.asarray(config.hidden_size**0.5, dtype=h.dtype)

    # The reference uses absolute positions 0..T-1 (padding handled by mask).
    positions = jnp.broadcast_to(jnp.arange(t)[None], (b, t))

    full_bias = causal_mask_bias(t, attention_mask, window=None)
    local_bias = causal_mask_bias(t, attention_mask, window=config.sliding_window)
    is_global, bases = _layer_schedule(config)

    def body(h, xs):
        layer_params, is_g, base = xs
        bias = jnp.where(is_g, full_bias, local_bias)
        h_out, _ = _layer(layer_params, h, bias, positions, config, base)
        return h_out, h_out

    h_final, per_layer = jax.lax.scan(body, h, (params["layers"], is_global, bases))
    states = [h] + [per_layer[i] for i in range(config.num_hidden_layers - 1)]
    states.append(gemma_rms_norm(params["norm"], h_final, config.rms_norm_eps))
    return states


def gemma3_logits(
    params: dict,
    config: Gemma3TextConfig,
    input_ids: jax.Array,
    attention_mask: Optional[jax.Array] = None,
    kv_caches: Optional[list] = None,
    position_offset: int = 0,
    last_only: bool = False,
):
    """Forward to logits (tied embedding head); optionally with KV caches for
    generation. Returns (logits, new_caches).

    ``last_only`` computes logits for the final position only: the 262k-vocab
    projection over a full 1024-token prefill is a ~1 GB fp32 tensor and a
    ~2 TFLOP matmul of which generation uses exactly one row."""
    b, t = input_ids.shape
    h = params["embed_tokens"]["weight"][input_ids]
    h = h * jnp.asarray(config.hidden_size**0.5, dtype=h.dtype)

    positions = position_offset + jnp.broadcast_to(jnp.arange(t)[None], (b, t))

    is_global, bases = _layer_schedule(config)
    if kv_caches is None:
        full_bias = causal_mask_bias(t, attention_mask, window=None)
        local_bias = causal_mask_bias(t, attention_mask, window=config.sliding_window)
        new_caches = None

        def body(h, xs):
            layer_params, is_g, base = xs
            bias = jnp.where(is_g, full_bias, local_bias)
            h_out, _ = _layer(layer_params, h, bias, positions, config, base)
            return h_out, None

        h, _ = jax.lax.scan(body, h, (params["layers"], is_global, bases))
    else:
        max_len = kv_caches[0][0].shape[2]
        offset = kv_caches[0][2]
        ki = jnp.arange(max_len)[None, :]
        qi = offset + jnp.arange(t)[:, None]
        allowed = ki <= qi
        full_bias = jnp.where(allowed, 0.0, -1e9).astype(jnp.float32)[None, None]
        local_allowed = jnp.logical_and(allowed, qi - ki < config.sliding_window)
        local_bias = jnp.where(local_allowed, 0.0, -1e9).astype(jnp.float32)[None, None]
        if attention_mask is not None:
            pad = jnp.where(attention_mask.astype(bool), 0.0, -1e9).astype(jnp.float32)
            full_bias = full_bias + pad[:, None, None, :]
            local_bias = local_bias + pad[:, None, None, :]
        k_bufs = jnp.stack([c[0] for c in kv_caches], 0)
        v_bufs = jnp.stack([c[1] for c in kv_caches], 0)

        def body(h, xs):
            layer_params, is_g, base, k_buf, v_buf = xs
            bias = jnp.where(is_g, full_bias, local_bias)
            h_out, cache = _layer(
                layer_params, h, bias, positions, config, base, (k_buf, v_buf, offset)
            )
            return h_out, (cache[0], cache[1])

        h, (new_k, new_v) = jax.lax.scan(
            body, h, (params["layers"], is_global, bases, k_bufs, v_bufs)
        )
        new_caches = [
            (new_k[i], new_v[i], offset + t) for i in range(config.num_hidden_layers)
        ]

    h = gemma_rms_norm(params["norm"], h, config.rms_norm_eps)
    if last_only:
        h = h[:, -1:]
    logits = jnp.einsum("btd,vd->btv", h.astype(jnp.float32),
                        params["embed_tokens"]["weight"].astype(jnp.float32))
    return logits, new_caches


def init_kv_caches(config: Gemma3TextConfig, batch: int, max_len: int, dtype=jnp.bfloat16):
    nkv, hd = config.num_key_value_heads, config.head_dim
    return [
        (
            jnp.zeros((batch, nkv, max_len, hd), dtype=dtype),
            jnp.zeros((batch, nkv, max_len, hd), dtype=dtype),
            jnp.asarray(0, dtype=jnp.int32),
        )
        for _ in range(config.num_hidden_layers)
    ]


from mlx_video_tpu.utils.aot import aot_jit as _aot_jit

_gemma3_logits_jit = _aot_jit(gemma3_logits, static_argnames=("config", "last_only"))


def generate(
    params: dict,
    config: Gemma3TextConfig,
    input_ids: np.ndarray,
    max_new_tokens: int = 512,
    temperature: float = 0.7,
    top_p: float = 1.0,
    eos_token_ids: Tuple[int, ...] = (1, 106),
    key: Optional[jax.Array] = None,
) -> List[int]:
    """KV-cached autoregressive generation (prompt-enhancement backend;
    reference: text_encoder.py:1068-1110 uses mlx_lm generate)."""
    if key is None:
        key = jax.random.key(0)
    b, prompt_len = input_ids.shape
    assert b == 1, "generation is single-prompt"
    max_len = prompt_len + max_new_tokens

    caches = init_kv_caches(config, b, max_len, dtype=params["embed_tokens"]["weight"].dtype)
    mask = np.zeros((b, max_len), dtype=np.int32)
    mask[:, :prompt_len] = 1

    logits, caches = _gemma3_logits_jit(
        params, config, jnp.asarray(input_ids), jnp.asarray(mask), caches,
        position_offset=0, last_only=True,
    )
    out_tokens: List[int] = []
    next_logits = logits[:, -1]
    pos = prompt_len
    for _ in range(max_new_tokens):
        if temperature <= 0:
            token = int(jnp.argmax(next_logits, axis=-1)[0])
        else:
            scaled = next_logits / temperature
            if top_p < 1.0:
                sorted_logits = jnp.sort(scaled, axis=-1)[:, ::-1]
                probs = jax.nn.softmax(sorted_logits, axis=-1)
                cum = jnp.cumsum(probs, axis=-1)
                cutoff_idx = jnp.sum(cum < top_p, axis=-1)
                cutoff = sorted_logits[0, cutoff_idx[0]]
                scaled = jnp.where(scaled < cutoff, -jnp.inf, scaled)
            key, sub = jax.random.split(key)
            token = int(jax.random.categorical(sub, scaled, axis=-1)[0])
        if token in eos_token_ids:
            break
        out_tokens.append(token)
        mask[:, pos] = 1
        logits, caches = _gemma3_logits_jit(
            params, config, jnp.asarray([[token]]), jnp.asarray(mask), caches,
            position_offset=pos, last_only=True,
        )
        next_logits = logits[:, -1]
        pos += 1
    return out_tokens
