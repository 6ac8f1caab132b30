"""Pallas TPU dequantizing matmul for group-affine quantized linears.

The XLA path (ops/linear.py quant branch) materializes the full bf16 weight
matrix in HBM every call: measured on v5e at proxy-19B geometry this makes
quantized inference SLOWER than dense (q4 81ms vs dense 58ms per forward).
This kernel dequantizes weight blocks inside VMEM and feeds the MXU
directly, so weight HBM traffic is the packed 4/8-bit words (plus bf16
word-column scales) — no full-matrix materialization round trip.

MEASURED RESULT (v5e, 2026-08): the kernel is numerically correct but
SLOWER than the XLA dequant path on the current Mosaic toolchain (357us vs
191us dense at 1280x2048x8192; the host-side strided activation split alone
costs ~236us, and a weight-folded variant that avoids it pays even more in
in-kernel VPU dequant + concat relayouts). It therefore ships OPT-IN
(MLX_VIDEO_TPU_QUANT_KERNEL=1, ops/linear.py) as the starting point for
future toolchains where int8/int4 MXU feeds or cheaper lane relayouts
change the balance.

Weight format is the MLX-compatible group-affine layout
(reference: mlx_video/convert.py nn.quantize usage; ops/quant.py):
``packed`` (out, in*bits/32) uint32 LSB-first, ``scales``/``biases``
(out, in/group) with ``w = q * scale + bias`` per group.

Layout strategy (Mosaic cannot reshape the (n, words, vals) unpack into
(n, in) lanes): view the dequantized W column-space as ``vals_per_word``
interleaved strided subsets. For sub-word position j,
``W[:, j::vpw] = (words >> j*bits) & mask`` — a pure 2D elementwise op.
The host-side wrapper pre-splits x into the matching strided column subsets
and pre-broadcasts scales/biases to word columns (group boundaries contain
whole words, so every sub-word position shares them), and the kernel
accumulates one (bm, wk) x (wk, bn) MXU dot per sub-word position.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mlx_video_tpu.ops.flash_attention import _round_up


def _qmm_kernel(xs_ref, w_ref, s_ref, b_ref, o_ref, acc_ref, *, bits: int):
    """One (M-block, N-block, K-block) tile; K blocks accumulate into a
    fp32 VMEM scratch and flush on the last K step.

    xs_ref: (vpw, bm, bwk) activations split by sub-word position;
    w_ref: (bn, bwk) packed uint32; s_ref/b_ref: (bn, bwk) bf16 word-column
    scales/biases; o_ref: (bm, bn); acc_ref: (bm, bn) fp32 scratch.
    """
    vpw = xs_ref.shape[0]
    mask = jnp.uint32((1 << bits) - 1)
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    words = w_ref[:]
    scales = s_ref[:].astype(jnp.float32)
    biases = b_ref[:].astype(jnp.float32)

    acc = acc_ref[:]
    for j in range(vpw):  # static unroll: vpw is 4 or 8
        q = (words >> jnp.uint32(j * bits)) & mask  # (bn, bwk)
        w = (q.astype(jnp.int32).astype(jnp.float32) * scales + biases).astype(o_ref.dtype)
        x = xs_ref[j]
        acc = acc + jax.lax.dot_general(
            x, w,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    acc_ref[:] = acc

    @pl.when(kb == pl.num_programs(2) - 1)
    def _flush():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("bits", "group_size", "block_m", "block_n", "interpret")
)
def quant_matmul(
    x: jax.Array,
    packed: jax.Array,
    scales: jax.Array,
    biases: jax.Array,
    bits: int,
    group_size: int,
    block_m: int = 256,
    block_n: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """y = x @ dequant(packed, scales, biases).T over (..., K) activations.

    packed: (N, K*bits/32) uint32; scales/biases: (N, K/group_size).
    Returns (..., N) in x.dtype. Matches
    ``x @ dequantize_affine(...).T`` (ops/quant.py) to quantization
    precision. Requires group_size % (32/bits) == 0 (always true for the
    supported 2/4/8-bit x group 32/64/128 formats).
    """
    *lead, k = x.shape
    n = packed.shape[0]
    vpw = 32 // bits
    wk = packed.shape[1]
    if group_size % vpw != 0:
        raise ValueError(f"group_size {group_size} must contain whole {vpw}-value words")
    words_per_group = group_size // vpw

    x2 = x.reshape(-1, k)
    m = x2.shape[0]

    bm = block_m
    while bm > 8 and bm > _round_up(m, 8):
        bm //= 2
    m_pad = _round_up(m, bm)
    bn = block_n
    while bn > 128 and bn > _round_up(n, 128):
        bn //= 2
    n_pad = _round_up(n, bn)
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))
    if n_pad != n:
        pad_rows = n_pad - n
        packed = jnp.pad(packed, ((0, pad_rows), (0, 0)))
        scales = jnp.pad(scales, ((0, pad_rows), (0, 0)))
        biases = jnp.pad(biases, ((0, pad_rows), (0, 0)))

    # K blocking in packed words (bwk words = bwk*vpw values).
    bwk = 256
    while bwk > 128 and bwk > wk:
        bwk //= 2
    wk_pad = _round_up(wk, bwk)

    # Strided column split: xs[j] pairs with (words >> j*bits) & mask.
    xs = jnp.stack([x2[:, j::vpw] for j in range(vpw)], axis=0)  # (vpw, M, wk)
    # Word-column scales/biases (bf16: they are bf16 in checkpoints anyway).
    scales_w = jnp.repeat(scales, words_per_group, axis=1).astype(jnp.bfloat16)
    biases_w = jnp.repeat(biases, words_per_group, axis=1).astype(jnp.bfloat16)
    if wk_pad != wk:
        # Zero-padded x columns null out whatever the padded words dequant to.
        pad = wk_pad - wk
        xs = jnp.pad(xs, ((0, 0), (0, 0), (0, pad)))
        packed = jnp.pad(packed, ((0, 0), (0, pad)))
        scales_w = jnp.pad(scales_w, ((0, 0), (0, pad)))
        biases_w = jnp.pad(biases_w, ((0, 0), (0, pad)))
        wk = wk_pad

    out = pl.pallas_call(
        functools.partial(_qmm_kernel, bits=bits),
        grid=(m_pad // bm, n_pad // bn, wk // bwk),
        in_specs=[
            pl.BlockSpec((vpw, bm, bwk), lambda i, j, kk: (0, i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, bwk), lambda i, j, kk: (j, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, bwk), lambda i, j, kk: (j, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, bwk), lambda i, j, kk: (j, kk), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        interpret=interpret,
    )(xs, packed, scales_w, biases_w)

    return out[:m, :n].reshape(*lead, n)
