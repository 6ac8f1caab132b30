"""Linear layer as a pure function over a param dict.

Weights are stored ``(in_features, out_features)`` — transposed relative to
the PyTorch/MLX ``(out, in)`` convention — so the forward pass is a direct
``x @ W`` that maps cleanly onto the MXU and onto tensor-parallel column/row
sharding of the output/input axes. The checkpoint loader performs the
transpose once at load time.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def linear(params: dict, x: jax.Array) -> jax.Array:
    """y = x @ W (+ b) with optional quantized weights and LoRA adapters.

    ``params`` variants (all plain pytree leaves):
    - dense:      ``weight`` (in, out), optional ``bias``;
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
    if "quant_weight" in params:
        from mlx_video_tpu.ops.quant import dequantize_affine

        w = dequantize_affine(
            params["quant_weight"], params["scales"], params["biases"],
            dtype=x.dtype, in_dim=x.shape[-1],
        ).T
    else:
        w = params["weight"]
    precision = jax.lax.Precision.HIGHEST if w.dtype == jnp.float32 else None
    y = jnp.dot(x, w, preferred_element_type=x.dtype, precision=precision)
    b = params.get("bias")
    if b is not None:
        y = y + b
    if "lora_A" in params:
        a = params["lora_A"].astype(jnp.float32)
        bm = params["lora_B"].astype(jnp.float32)
        xf = x.astype(jnp.float32)
        delta = jnp.dot(jnp.dot(xf, a.T), bm.T)
        scale = params.get("lora_scale")
        if scale is not None:
            delta = delta * scale
        y = y + delta.astype(y.dtype)
    return y


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
