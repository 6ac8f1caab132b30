"""Linear layer as a pure function over a param dict.

Weights are stored ``(in_features, out_features)`` — transposed relative to
the PyTorch/MLX ``(out, in)`` convention — so the forward pass is a direct
``x @ W`` that maps cleanly onto the MXU and onto tensor-parallel column/row
sharding of the output/input axes. The checkpoint loader performs the
transpose once at load time.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

# Pallas dequant-matmul policy — OPT-IN (default off). Measured on v5e:
# XLA's dequant path costs ~40% over dense in-model (q4 81ms vs dense 58ms
# per proxy-19B forward, full weight materialization each call), but the
# Pallas kernel is slower still (357us vs 191us dense standalone at
# 1280x2048x8192) — the strided activation split / in-kernel VPU dequant
# outweigh the HBM savings on this toolchain. Enable with
# MLX_VIDEO_TPU_QUANT_KERNEL=1 or use_quant_kernel(); revisit on newer
# Mosaic versions.
_USE_QUANT_KERNEL: Optional[bool] = (
    {"1": True, "0": False}.get(os.environ.get("MLX_VIDEO_TPU_QUANT_KERNEL", ""), None)
)


def use_quant_kernel(enable: Optional[bool] = True) -> None:
    global _USE_QUANT_KERNEL
    _USE_QUANT_KERNEL = enable


def _apply_lora(params: dict, x: jax.Array, y: jax.Array) -> jax.Array:
    if "lora_A" not in params:
        return y
    a = params["lora_A"].astype(jnp.float32)
    bm = params["lora_B"].astype(jnp.float32)
    xf = x.astype(jnp.float32)
    # fp32 island: default TPU precision would run these fp32 matmuls on
    # the split-bf16 fast path and silently degrade the adapter delta
    # (same rule as the dense branch below)
    hi = jax.lax.Precision.HIGHEST
    delta = jnp.dot(jnp.dot(xf, a.T, precision=hi), bm.T, precision=hi)
    scale = params.get("lora_scale")
    if scale is not None:
        delta = delta * scale
    return y + delta.astype(y.dtype)


def linear(params: dict, x: jax.Array) -> jax.Array:
    """y = x @ W (+ b) with optional quantized weights and LoRA adapters.

    ``params`` variants (all plain pytree leaves):
    - dense:      ``weight`` (in, out), optional ``bias``;
    - W8A8 int8:  ``int8_weight``/``int8_scale`` (see ops/int8.py) — the
      matmul itself runs int8 x int8 -> int32 on the MXU with per-token
      dynamic activation scales;
    - quantized:  ``quant_weight``/``scales``/``biases`` in the MLX affine
      layout (see ops/quant.py) — dequantized into the matmul prologue;
    - LoRA:       additional ``lora_A`` (r, in), ``lora_B`` (out, r), optional
      ``lora_scale`` — y += scale * x @ A^T @ B^T in fp32
      (reference: mlx_video/lora.py:204-219, mlx_trainer/lora.py:34-44).

    fp32 operands force ``Precision.HIGHEST``: XLA's default fp32 matmul uses a
    split-bf16 fast path on TPU (and an equivalent low-precision path on CPU),
    which would silently degrade the model's fp32 islands. bf16 operands keep
    the default fast MXU path.
    """
    if "int8_weight" in params:
        from mlx_video_tpu.ops.int8 import int8_linear

        y = int8_linear(x, params["int8_weight"], params["int8_scale"], params.get("bias"))
        return _apply_lora(params, x, y)
    if "quant_weight" in params:
        from mlx_video_tpu.ops.quant import dequantize_affine

        qw, sc, bi = params["quant_weight"], params["scales"], params["biases"]
        in_dim = x.shape[-1]
        if "int8_scale" in params:
            # W4A8: q4 storage -> per-layer in-graph int8 requantization ->
            # int8 x int8 -> int32 on the MXU at 2x the bf16 rate (see
            # ops/quant.py prepare_w4a8). XLA fuses the unpack/affine/round
            # chain into the int8 operand producer, so the only transient is
            # this layer's int8 block, not the whole model.
            from mlx_video_tpu.ops.int8 import int8_act_matmul

            w_scale = params["int8_scale"].astype(jnp.float32)  # (out,)
            wf = dequantize_affine(qw, sc, bi, dtype=jnp.float32, in_dim=in_dim)
            w_q8 = jnp.clip(jnp.round(wf / w_scale[:, None]), -127, 127).astype(jnp.int8)
            # (out, in) layout; STE backward (LoRA training over the frozen
            # W4A8 base needs dL/dx through the int8 matmul).
            y = int8_act_matmul(x.astype(jnp.float32), w_q8, w_scale, 1)
            b = params.get("bias")
            if b is not None:
                y = y + b.astype(jnp.float32)
            return _apply_lora(params, x, y.astype(x.dtype))
        use_kernel = bool(_USE_QUANT_KERNEL)
        # The Pallas kernel unpacks word-at-a-time: bits must divide 32
        # (3/5/6-bit byte-stream checkpoints take the XLA dequant path).
        if (
            use_kernel
            and in_dim % 128 == 0
            and qw.ndim == 2
            and 32 % max(qw.shape[-1] * 32 // in_dim, 1) == 0
        ):
            from mlx_video_tpu.ops.quant_matmul import quant_matmul

            bits = qw.shape[-1] * 32 // in_dim
            group_size = in_dim // sc.shape[-1]
            y = quant_matmul(x, qw, sc, bi, bits, group_size)
            b = params.get("bias")
            if b is not None:
                y = y + b
            return _apply_lora(params, x, y)
        w = dequantize_affine(qw, sc, bi, dtype=x.dtype, in_dim=in_dim).T
    else:
        w = params["weight"]
    precision = jax.lax.Precision.HIGHEST if w.dtype == jnp.float32 else None
    y = jnp.dot(x, w, preferred_element_type=x.dtype, precision=precision)
    b = params.get("bias")
    if b is not None:
        y = y + b
    return _apply_lora(params, x, y)


def init_linear(
    key: jax.Array,
    in_features: int,
    out_features: int,
    bias: bool = True,
    dtype=jnp.float32,
    scale: Optional[float] = None,
) -> dict:
    if scale is None:
        scale = in_features**-0.5
    params = {
        "weight": jax.random.uniform(
            key, (in_features, out_features), dtype=jnp.float32, minval=-scale, maxval=scale
        ).astype(dtype)
    }
    if bias:
        params["bias"] = jnp.zeros((out_features,), dtype=dtype)
    return params
