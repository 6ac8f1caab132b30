"""W8A8 dynamic int8 matmul path for the DiT hot loop.

Unlike the storage-oriented affine quantization in ops/quant.py (2-8 bit
group-wise, MLX `.scales/.biases` checkpoint layout, dequantized to bf16
before the matmul — reference: mlx_video/generate.py:2902-2990), this path
executes the matmul itself in int8: per-output-channel symmetric weight
scales, per-token dynamic activation scales, ``int8 x int8 -> int32`` on the
MXU — which runs at 2x the bf16 rate on TPU v5e/v5p — then a fused fp32
rescale. Weight HBM traffic also halves vs bf16.

Opt-in (quality/speed trade): enable by converting params with
:func:`quantize_params_w8a8` (e.g. ``--w8a8`` on the generate CLI). Scope
mirrors the reference's quantize scopes: transformer-block linears only
("core"); patchify/adaLN/output projections stay in bf16.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def quantize_weight_int8(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-output-channel int8 quantization.

    ``w``: (..., in, out) — the native linear layout (possibly with a leading
    stacked-layer axis). Returns (w_q int8 same shape, scale fp32 (..., out)).
    """
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=-2)  # (..., out)
    scale = jnp.maximum(absmax / 127.0, 1e-12)
    w_q = jnp.clip(
        jnp.round(wf / scale[..., None, :]), -127, 127
    ).astype(jnp.int8)
    return w_q, scale


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def int8_act_matmul(xf: jax.Array, w_q: jax.Array, w_scale: jax.Array, w_in_axis: int = 0):
    """fp32 y = dequant(quant(xf) @ w_q): per-token dynamic activation int8
    quantization, ``int8 x int8 -> int32`` on the MXU, fused fp32 rescale.

    ``w_in_axis`` selects the weight layout: 0 -> w_q (in, out) (W8A8
    storage), 1 -> w_q (out, in) (the in-graph W4A8 requantization).
    ``w_scale`` is per-output-channel (out,) either way.

    Differentiable w.r.t. ``xf`` by a straight-through estimator: the
    backward is one bf16-rate matmul against the exactly-dequantized weight
    (``g @ (w_q * w_scale)^T``). Without this, ``round()``/int casts give the
    activation path zero gradient and LoRA adapters behind any frozen int8
    matmul train on residual-stream gradients only.
    """
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    x_scale = jnp.maximum(absmax / 127.0, 1e-12)
    x_q = jnp.clip(jnp.round(xf / x_scale), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        x_q,
        w_q,
        dimension_numbers=(((xf.ndim - 1,), (w_in_axis,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return y.astype(jnp.float32) * x_scale * w_scale.astype(jnp.float32)


def _int8_act_matmul_fwd(xf, w_q, w_scale, w_in_axis):
    return int8_act_matmul(xf, w_q, w_scale, w_in_axis), (w_q, w_scale)


def _int8_act_matmul_bwd(w_in_axis, res, g):
    w_q, w_scale = res
    gf = g.astype(jnp.float32)
    wf = w_q.astype(jnp.float32)
    if w_in_axis == 0:  # w (in, out)
        wd = wf * w_scale[None, :].astype(jnp.float32)  # (in, out)
        gx = jnp.dot(gf, wd.T)
    else:  # w (out, in)
        wd = wf * w_scale[:, None].astype(jnp.float32)  # (out, in)
        gx = jnp.dot(gf, wd)
    return (
        gx,
        np.zeros(w_q.shape, jax.dtypes.float0),  # frozen int weight
        jnp.zeros_like(w_scale),
    )


int8_act_matmul.defvjp(_int8_act_matmul_fwd, _int8_act_matmul_bwd)


def int8_linear(
    x: jax.Array,
    w_q: jax.Array,
    w_scale: jax.Array,
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """y = dequant(quant(x) @ w_q) (+ bias) with per-token activation scales.

    ``x``: (..., in); ``w_q``: (in, out) int8; ``w_scale``: (out,) fp32.
    The int8 dot accumulates in int32 on the MXU; the rescale
    ``int32 * x_scale * w_scale`` happens in fp32 and casts back to x.dtype.
    Gradients w.r.t. ``x`` flow via the STE backward of
    :func:`int8_act_matmul`.
    """
    y = int8_act_matmul(x.astype(jnp.float32), w_q, w_scale, 0)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


# Transformer-block linear names safe to run in W8A8 ("core" scope,
# matching ops/quant.py SCOPE_PATTERNS): both video- and audio-branch
# attention projections and FFNs. Norm weights, adaLN tables, patchify and
# output projections are excluded (small and/or quality-critical).
_CORE_LINEAR_PARENTS = (
    "attn1", "attn2", "audio_attn1", "audio_attn2",
    "audio_to_video_attn", "video_to_audio_attn", "ff", "audio_ff",
)
_LINEAR_CHILDREN = ("to_q", "to_k", "to_v", "to_out", "proj_in", "proj_out")


_GEMMA_LINEARS = (
    "q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj",
)


def quantize_text_encoder_w8a8(params: dict) -> dict:
    """W8A8-rewrite the LTX2 text encoder pytree: the Gemma-3 layer stack's
    attention/MLP projections and the 49-state feature aggregation matmul
    (188160 x 3840 — the largest single weight in the system). Embeddings,
    norms and the register connectors stay bf16.

    Besides the 2x MXU rate, int8 weights drop the 12B LM from ~24 GB to
    ~12 GB — under a single v5e chip's 16 GB HBM.
    """

    def convert(leaf_dict: dict) -> dict:
        w_q, scale = quantize_weight_int8(leaf_dict["weight"])
        out = {k: v for k, v in leaf_dict.items() if k != "weight"}
        out["int8_weight"] = w_q
        out["int8_scale"] = scale
        return out

    out = dict(params)
    lm = dict(out.get("language_model", {}))
    if "layers" in lm:
        layers = dict(lm["layers"])
        for block_name in ("self_attn", "mlp"):
            if block_name in layers:
                block = dict(layers[block_name])
                for name in _GEMMA_LINEARS:
                    if name in block and "weight" in block[name]:
                        block[name] = convert(block[name])
                layers[block_name] = block
        lm["layers"] = layers
        out["language_model"] = lm
    fe = out.get("feature_extractor")
    if fe and "aggregate_embed" in fe and "weight" in fe["aggregate_embed"]:
        out["feature_extractor"] = {
            **fe, "aggregate_embed": convert(fe["aggregate_embed"])
        }
    return out


def quantize_params_w8a8(params: dict) -> dict:
    """Rewrite transformer-block linear leaves to the int8 form.

    Works on the native DiT pytree (model.py init_ltx_params), including the
    scan-stacked ``blocks`` subtree (leading layer axis on every leaf —
    quantization axes are relative to the trailing (in, out) dims, so stacked
    weights quantize per layer for free). Dense ``weight`` ->
    ``int8_weight``/``int8_scale``; bias and any LoRA leaves pass through.

    The returned tree OWNS every leaf — passthrough leaves are device-copied
    so donating steps on the result cannot invalidate ``params``
    (utils/trees.py ownership contract).
    """

    def convert_linear(leaf_dict: dict) -> dict:
        w = leaf_dict.get("weight")
        if w is None or w.ndim < 2:
            return leaf_dict
        w_q, scale = quantize_weight_int8(w)
        out = {k: v for k, v in leaf_dict.items() if k != "weight"}
        out["int8_weight"] = w_q
        out["int8_scale"] = scale
        return out

    def walk(node, in_core: bool):
        if not isinstance(node, dict):
            return node
        out = {}
        for name, child in node.items():
            if isinstance(child, dict):
                child_core = in_core or name in _CORE_LINEAR_PARENTS
                if child_core and name in _LINEAR_CHILDREN and "weight" in child:
                    out[name] = convert_linear(child)
                else:
                    out[name] = walk(child, child_core)
            else:
                out[name] = child
        return out

    from mlx_video_tpu.utils.trees import own_derived_leaves

    return own_derived_leaves(walk(params, False), params)
