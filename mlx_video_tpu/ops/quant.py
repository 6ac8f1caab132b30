"""Group-wise affine quantization (2-8 bit) with MLX-compatible layout.

Behavioral spec: the reference relies on ``mlx.nn.quantize`` /
``QuantizedLinear`` (reference: mlx_video/models/ltx/ltx.py:641-721,
convert.py quantize path) whose checkpoint format is:

- ``<name>.weight``: uint32-packed quantized values, shape
  ``(out, in * bits / 32)``, LSB-first along the ``in`` axis
  (``32 // bits`` values per word);
- ``<name>.scales`` / ``<name>.biases``: per-(out, group) affine params,
  shape ``(out, in / group_size)``; dequant is ``w = q * scale + bias``.

We reproduce that exact layout so pre-quantized MLX checkpoints (AITRADER
4/8-bit repos, README.md:230-235) load directly, and our own ``convert``
output is readable by the reference.

On TPU, the dequant-matmul runs as dequantize (bit-shift + affine) fused by
XLA into the matmul prologue; ``bits`` and ``group_size`` are derived from
array shapes, so quantized layers need no side-channel metadata inside jit.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


SUPPORTED_BITS = (2, 3, 4, 5, 6, 8)


def _pack_bitstream(q: jax.Array, bits: int) -> jax.Array:
    """Pack (out, in) uint32 values (< 2^bits) into the MLX sub-32-bit
    layout: a contiguous LSB-first little-endian bitstream along the in
    axis, viewed as uint32 words.

    This is exactly the reference layout for bits not dividing 32
    (mlx quantized kernels pack 8x3b -> 3 bytes, 4x6b -> 3 bytes,
    8x5b -> 5 bytes — all byte-contiguous LSB-first, so the stream view
    covers every case); for bits dividing 32 it coincides with the
    word-at-a-time fast path below.
    """
    out_dim, in_dim = q.shape
    total_bits = in_dim * bits
    nbytes = total_bits // 8
    # (out, in, bits) LSB-first bit expansion -> flat bit vector
    bit_idx = jnp.arange(bits, dtype=jnp.uint32)
    stream = ((q[..., None] >> bit_idx) & 1).reshape(out_dim, total_bits)
    byte_vals = jnp.sum(
        stream.reshape(out_dim, nbytes, 8) << jnp.arange(8, dtype=jnp.uint32),
        axis=-1,
    )
    wb = byte_vals.reshape(out_dim, nbytes // 4, 4)
    return (
        wb[..., 0] | (wb[..., 1] << 8) | (wb[..., 2] << 16) | (wb[..., 3] << 24)
    ).astype(jnp.uint32)


def _unpack_bitstream(packed: jax.Array, bits: int, in_dim: int) -> jax.Array:
    """Inverse of :func:`_pack_bitstream`: (out, words) uint32 -> (out, in)
    uint32 values. Static gather indices; a value spans at most two bytes
    for every supported sub-8 bit width."""
    out_dim, words = packed.shape
    nbytes = words * 4
    byts = jnp.stack(
        [(packed >> jnp.uint32(8 * k)) & jnp.uint32(0xFF) for k in range(4)], axis=-1
    ).reshape(out_dim, nbytes)
    pos = jnp.arange(in_dim) * bits
    b0 = pos // 8
    shift = (pos % 8).astype(jnp.uint32)
    lo = jnp.take(byts, b0, axis=1)
    hi = jnp.take(byts, jnp.minimum(b0 + 1, nbytes - 1), axis=1)
    return ((lo | (hi << 8)) >> shift) & jnp.uint32((1 << bits) - 1)


def quantize_affine(
    w: jax.Array, group_size: int = 64, bits: int = 4
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Quantize a 2D (out, in) matrix.

    Returns (packed uint32 (out, in*bits//32), scales (out, in//g),
    biases (out, in//g)) with w ~= q * scales + biases per group.
    """
    if bits not in SUPPORTED_BITS:
        raise ValueError(f"bits must be one of {SUPPORTED_BITS}, got {bits}")
    out_dim, in_dim = w.shape
    if in_dim % group_size != 0:
        raise ValueError(f"in dim {in_dim} not divisible by group_size {group_size}")
    if (in_dim * bits) % 32 != 0:
        raise ValueError(
            f"in dim {in_dim} x {bits} bits does not fill whole uint32 words"
        )
    n_groups = in_dim // group_size
    levels = (1 << bits) - 1

    wf = w.astype(jnp.float32).reshape(out_dim, n_groups, group_size)
    w_min = jnp.min(wf, axis=-1)
    w_max = jnp.max(wf, axis=-1)
    scales = jnp.maximum((w_max - w_min) / levels, 1e-8)
    biases = w_min

    q = jnp.clip(jnp.round((wf - biases[..., None]) / scales[..., None]), 0, levels)
    q = q.astype(jnp.uint32).reshape(out_dim, in_dim)

    if 32 % bits == 0:
        els = 32 // bits
        q = q.reshape(out_dim, in_dim // els, els)
        shifts = (jnp.arange(els, dtype=jnp.uint32) * bits)[None, None, :]
        packed = jnp.sum(q << shifts, axis=-1).astype(jnp.uint32)
    else:
        packed = _pack_bitstream(q, bits)
    return packed, scales, biases


def dequantize_affine(
    packed: jax.Array,
    scales: jax.Array,
    biases: jax.Array,
    bits: Optional[int] = None,
    dtype=jnp.bfloat16,
    in_dim: Optional[int] = None,
) -> jax.Array:
    """Inverse of :func:`quantize_affine`.

    ``bits`` is derived exactly from ``in_dim`` when provided
    (``bits = words * 32 / in_dim``); shape-only inference is ambiguous
    (e.g. 4-bit group-32 vs 8-bit group-16 pack to the same shapes) and is
    refused — callers always know the in dimension.
    """
    out_dim = packed.shape[0]
    n_groups = scales.shape[1]
    if bits is None:
        if in_dim is None:
            raise ValueError("dequantize_affine requires bits or in_dim")
        bits = packed.shape[1] * 32 // in_dim
        if bits not in SUPPORTED_BITS + (16,) or packed.shape[1] * 32 != bits * in_dim:
            raise ValueError(
                f"Inconsistent quantized shapes: words={packed.shape[1]} in_dim={in_dim}"
            )
    if 32 % bits == 0:
        els = 32 // bits
        mask = jnp.uint32((1 << bits) - 1)
        shifts = (jnp.arange(els, dtype=jnp.uint32) * bits)[None, None, :]
        q = (packed[..., None] >> shifts) & mask
        in_dim = packed.shape[1] * els
        q = q.reshape(out_dim, in_dim).astype(jnp.float32)
    else:
        in_dim = packed.shape[1] * 32 // bits
        q = _unpack_bitstream(packed, bits, in_dim).astype(jnp.float32)
    group_size = in_dim // n_groups
    qg = q.reshape(out_dim, n_groups, group_size)
    w = qg * scales.astype(jnp.float32)[..., None] + biases.astype(jnp.float32)[..., None]
    return w.reshape(out_dim, in_dim).astype(dtype)


def quantize_linear_params(params: dict, group_size: int = 64, bits: int = 4) -> dict:
    """Convert a {'weight': (in, out), 'bias'?} linear param dict into its
    quantized form {'quant_weight', 'scales', 'biases', 'bias'?}.

    The quantized tensors use the MLX (out, in) orientation for checkpoint
    compatibility; :func:`mlx_video_tpu.ops.linear.linear` transposes at the
    matmul (fused by XLA).
    """
    w = params["weight"]
    stacked = w.ndim == 3  # (L, in, out) scan-stacked
    if stacked:
        # Sequential over the layer axis: vmap would materialize fp32
        # temporaries for the WHOLE stack at once (~10 GB for the 48-layer
        # FFN leaf), OOMing on-device quantization of large models.
        packed, scales, biases = jax.lax.map(
            lambda m: quantize_affine(m.T, group_size, bits), w
        )
    else:
        packed, scales, biases = quantize_affine(w.T, group_size, bits)
    out = {"quant_weight": packed, "scales": scales, "biases": biases}
    if "bias" in params:
        out["bias"] = params["bias"]
    return out


def dequantize_linear_params(params: dict, bits: int, dtype=jnp.bfloat16) -> dict:
    """Inverse of :func:`quantize_linear_params` (back to {'weight': (in, out)})."""
    pw, sc, bi = params["quant_weight"], params["scales"], params["biases"]
    if pw.ndim == 3:
        w = jax.vmap(lambda p, s, b: dequantize_affine(p, s, b, bits=bits, dtype=dtype).T)(pw, sc, bi)
    else:
        w = dequantize_affine(pw, sc, bi, bits=bits, dtype=dtype).T
    out = {"weight": w}
    if "bias" in params:
        out["bias"] = params["bias"]
    return out


def prepare_w4a8(params: dict, bits: int = 4) -> dict:
    """Add per-output-channel int8 requantization scales to every quantized
    linear, enabling W4A8 execution: q4 storage in HBM, int8 compute on the
    MXU (2x the bf16 rate on v5e/v5p).

    The scale needs only the affine endpoints — a group's dequantized values
    span [b_g, b_g + levels*s_g] (s_g > 0), so the per-channel absmax is
    max over groups of max(|b_g|, |b_g + levels*s_g|); the packed weights are
    never unpacked here. At matmul time :func:`mlx_video_tpu.ops.linear.linear`
    dequantizes each layer's q4 block directly to int8 inside the compiled
    graph (a per-layer transient — the full int8 model, which would NOT fit
    one chip at 19B, never materializes) and runs the int8 x int8 -> int32
    dot with per-token dynamic activation scales (ops/int8.py semantics).

    Requantization error: int8's 254 symmetric levels subdivide the coarsest
    group's 2^bits-level grid unless a channel's group scales vary by more
    than ~127/2^bits x; measured on the DiT this adds <0.2% relative error
    over q4-dequant execution (tests/test_lora_quant.py::TestW4A8).

    Ownership: the returned tree SHARES storage with ``params`` (only
    ``int8_scale`` leaves are new) — copying the packed q4 stacks here would
    transiently double the full model. Callers normally pass a temporary
    (``prepare_w4a8(quantize_dit_params(...))``, whose inner call already
    owns its leaves); if you keep ``params`` alive across a donating step on
    the result, copy first (utils/trees.py:own_derived_leaves).
    """
    levels = (1 << bits) - 1

    def walk(node: dict) -> dict:
        if "quant_weight" in node:
            s = node["scales"].astype(jnp.float32)
            b = node["biases"].astype(jnp.float32)
            hi = b + levels * s
            absmax = jnp.max(jnp.maximum(jnp.abs(b), jnp.abs(hi)), axis=-1)  # (..., out)
            out = dict(node)
            out["int8_scale"] = jnp.maximum(absmax / 127.0, 1e-12)
            return out
        return {k: walk(v) if isinstance(v, dict) else v for k, v in node.items()}

    return walk(params)


def _match_any(path: str, patterns) -> bool:
    return any(p in path for p in patterns)


# Quantization scopes mirroring the reference predicates
# (reference: ltx.py:676-713, convert.py scope attn1/core/all).
SCOPE_PATTERNS = {
    "attn1": ("blocks/attn1/",),
    "core": (
        "blocks/attn1/", "blocks/attn2/", "blocks/ff/",
        "blocks/audio_attn1/", "blocks/audio_attn2/", "blocks/audio_ff/",
        "blocks/audio_to_video_attn/", "blocks/video_to_audio_attn/",
    ),
    "all": ("blocks/",),
}


def quantize_dit_params(
    params: dict, group_size: int = 64, bits: int = 4, scope: str = "core"
) -> dict:
    """Quantize the DiT parameter pytree in place of eligible linears.

    Only 2D-weight linears inside transformer blocks are quantized (the
    reference's predicate scope, ltx.py:676-713); norms / tables / adaLN MLPs
    stay in bf16.

    The returned tree OWNS every leaf: quantized leaves are freshly computed
    and passthrough leaves (biases, norms, tables) are device-copied, so a
    donating train/infer step on the result can never invalidate ``params``
    (see utils/trees.py for the ownership contract).
    """
    patterns = SCOPE_PATTERNS[scope]

    def walk(node: dict, path: str) -> dict:
        if "weight" in node and node["weight"].ndim in (2, 3) and _match_any(path + "/", patterns):
            # only quantize matmul weights, not norm vectors
            w = node["weight"]
            in_dim = w.shape[-2]
            if w.ndim >= 2 and in_dim % group_size == 0 and path.rsplit("/", 1)[-1] not in (
                "q_norm", "k_norm",
            ):
                return quantize_linear_params(node, group_size, bits)
            return node
        out = {}
        for k, v in node.items():
            if isinstance(v, dict):
                out[k] = walk(v, f"{path}/{k}" if path else k)
            else:
                out[k] = v
        return out

    from mlx_video_tpu.utils.trees import own_derived_leaves

    return own_derived_leaves(walk(params, ""), params)
