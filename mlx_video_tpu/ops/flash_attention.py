"""Pallas TPU flash attention for the DiT self-attention hot path.

TPU-native replacement for ``mx.fast.scaled_dot_product_attention``
(reference: mlx_video/models/ltx/attention.py:47). Standard blocked
online-softmax attention:

- grid over (batch*heads, query blocks); K/V stream through VMEM in
  key-block chunks with fp32 running (max, sum, accumulator);
- bf16 matmuls on the MXU with fp32 ``preferred_element_type``;
- no masking (the DiT uses full bidirectional attention; text cross-attn
  with padding masks stays on the XLA path).

Falls back to ``jax.nn.dot_product_attention`` for unsupported shapes via
ops/attention.py. Enable with ``mlx_video_tpu.ops.attention.use_pallas_flash()``
or ``MLX_VIDEO_TPU_FLASH=1``.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 512


def _to_heads(x: jax.Array, s_pad: int) -> jax.Array:
    """(B, S, H, D) -> (B*H, S_pad, D), zero-padding the sequence axis.

    The one head/pad layout shared by every kernel entry here — forward and
    backward MUST agree on it, so there is exactly one copy."""
    b, s, h, d = x.shape
    x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, s, d)
    if s_pad != s:
        x = jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0)))
    return x


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref=None, *, block_k: int, scale: float, valid_len: int
):
    """One (head, q-block): online softmax over key blocks.

    q_ref: (block_q, d); k_ref/v_ref: (S_pad, d); o_ref: (block_q, d).
    Keys at index >= valid_len (sequence padding) are masked to -inf.
    ``lse_ref`` (optional, (block_q, 128) fp32 lane-replicated): per-row
    logsumexp residual for the Pallas backward pass.
    """
    block_q, d = q_ref.shape
    s = k_ref.shape[0]
    num_kb = s // block_k
    needs_mask = valid_len < s

    # Keep q/k in the input dtype for the MXU dot (bf16 inputs run ~8x
    # faster than fp32 on the systolic array); accumulation is fp32 via
    # preferred_element_type, and the scale is applied to the fp32 logits.
    q = q_ref[:]

    def body(kb, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[pl.ds(kb * block_k, block_k), :]
        v = v_ref[pl.ds(kb * block_k, block_k), :]
        logits = scale * jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (block_q, block_k)
        if needs_mask:
            key_idx = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            logits = jnp.where(key_idx < valid_len, logits, -jnp.inf)
        m_cur = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(logits - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc

    m0 = jnp.full((block_q, 1), -jnp.inf, dtype=jnp.float32)
    l0 = jnp.zeros((block_q, 1), dtype=jnp.float32)
    acc0 = jnp.zeros((block_q, d), dtype=jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
    o_ref[:] = (acc / l).astype(o_ref.dtype)
    if lse_ref is not None:
        lse = (m + jnp.log(l))[:, 0]
        lse_ref[:] = jax.lax.broadcast_in_dim(lse, lse_ref.shape, (0,))


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret", "save_lse")
)
def _flash_attention_impl(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
    save_lse: bool = False,
):
    """Full bidirectional attention over (B, S, H, D) tensors.

    Sequence length is padded to a block multiple internally; padded keys are
    masked out by giving them -inf logits via key padding below.

    With ``save_lse`` returns ``(out, lse)`` where lse is the per-row
    logsumexp, (B*H, S_pad, 128) fp32 lane-replicated (the TPU-legal layout
    for a per-row scalar; jax's own TPU flash kernel stores l/m the same
    way) — consumed by the Pallas backward kernels.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    b, s, h, d = q.shape

    block_q, block_k, s_pad = _pick_blocks(s, block_q, block_k)

    qh, kh, vh = _to_heads(q, s_pad), _to_heads(k, s_pad), _to_heads(v, s_pad)

    # save_lse consumers (Pallas backward, ring-attention combine) need the
    # EXACT logsumexp: the single-pass kernel's clamped, no-max-subtraction
    # lse saturates past +/-80 logits, and feeding it to a backward that
    # recomputes unclamped logits turns exp(logits - lse) into Inf/NaN.
    if s_pad <= SINGLE_PASS_MAX_S and not save_lse:
        kernel = functools.partial(_single_pass_kernel, scale=scale, valid_len=s)
    else:
        kernel = functools.partial(_flash_kernel, block_k=block_k, scale=scale, valid_len=s)
    grid = (b * h, s_pad // block_q)
    out_specs = pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b * h, s_pad, d), q.dtype)
    if save_lse:
        out_specs = [
            out_specs,
            pl.BlockSpec((None, block_q, 128), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ]
        out_shape = [out_shape, jax.ShapeDtypeStruct((b * h, s_pad, 128), jnp.float32)]
    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, s_pad, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, s_pad, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(qh, kh, vh)

    out, lse = res if save_lse else (res, None)
    out = out[:, :s].reshape(b, h, s, d)
    out = jnp.transpose(out, (0, 2, 1, 3))
    return (out, lse) if save_lse else out


# Backward policy: above this sequence length the VJP uses the Pallas
# backward kernels (O(S) memory — XLA's recompute backward materializes
# (B, H, S, S) softmax intermediates, which at ring/long-video lengths
# stops fitting HBM next to the weights); below it the XLA recompute is a
# single well-fused tile and stays the default until the kernels win a
# chip A/B. MLX_VIDEO_TPU_FLASH_BWD=1/0 forces it either way.
FLASH_BWD_MIN_S = 2048
# Upper bound: the dkv kernel keeps full q/dO/O plus the lane-replicated
# lse resident in VMEM — (3*d*itemsize + 512) bytes per row, ~10 MiB at
# S=8192/d=128/bf16. Past it the Mosaic compile fails; the XLA recompute
# VJP at least compiles, and the intended mechanism for longer sequences
# is ring attention over the mesh (local blocks short again).
FLASH_BWD_MAX_BYTES = 10 * 1024 * 1024
_FORCE_FLASH_BWD: Optional[bool] = (
    {"1": True, "0": False}.get(os.environ.get("MLX_VIDEO_TPU_FLASH_BWD", ""), None)
)


def _use_bwd_kernel(s: int, d: int = 128, itemsize: int = 2) -> bool:
    fits = s * (3 * d * itemsize + 512) <= FLASH_BWD_MAX_BYTES
    if _FORCE_FLASH_BWD is not None:
        return _FORCE_FLASH_BWD and fits
    return s >= FLASH_BWD_MIN_S and fits


def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref, dq_ref,
    *, block_k: int, scale: float, valid_len: int
):
    """dQ for one (head, q-block): stream K/V in key blocks.

    p  = exp(scale*q k^T - lse)            (softmax row, recomputed)
    dp = dO V^T
    dS = p * (dp - D),  D = rowsum(dO * O) (the softmax-jacobian dot,
                                            computed here from the O block
                                            instead of a precomputed
                                            lane-replicated buffer)
    dQ = scale * dS K
    """
    block_q, d = q_ref.shape
    s = k_ref.shape[0]
    num_kb = s // block_k
    q = q_ref[:]
    do = do_ref[:]
    lse = lse_ref[:][:, 0:1]
    dcap = jnp.sum(
        do.astype(jnp.float32) * o_ref[:].astype(jnp.float32), axis=-1, keepdims=True
    )
    needs_mask = valid_len < s

    def body(kb, dq_acc):
        k = k_ref[pl.ds(kb * block_k, block_k), :]
        v = v_ref[pl.ds(kb * block_k, block_k), :]
        logits = scale * jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if needs_mask:
            key_idx = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            logits = jnp.where(key_idx < valid_len, logits, -jnp.inf)
        p = jnp.exp(logits - lse)  # masked keys: exp(-inf) = 0
        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = (p * (dp - dcap) * scale).astype(k.dtype)
        return dq_acc + jax.lax.dot_general(
            ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    dq = jax.lax.fori_loop(0, num_kb, body, jnp.zeros((block_q, d), jnp.float32))
    dq_ref[:] = dq.astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref, dk_ref, dv_ref,
    *, block_q: int, scale: float, valid_len: int
):
    """dK/dV for one (head, k-block): stream Q/dO in query blocks.

    dV = p^T dO;  dK = scale * dS^T Q  (same p/dS as the dq kernel).
    Padded keys produce p = 0 rows, so their dk/dv stay zero and are
    sliced away by the caller.
    """
    block_k, d = k_ref.shape
    s = q_ref.shape[0]
    num_qb = s // block_q
    k = k_ref[:]
    v = v_ref[:]
    j = pl.program_id(1)
    needs_mask = valid_len < k_ref.shape[0] * (pl.num_programs(1))  # s_pad > valid_len

    def body(qb, carry):
        dk_acc, dv_acc = carry
        q = q_ref[pl.ds(qb * block_q, block_q), :]
        do = do_ref[pl.ds(qb * block_q, block_q), :]
        o = o_ref[pl.ds(qb * block_q, block_q), :]
        lse = lse_ref[pl.ds(qb * block_q, block_q), :][:, 0:1]
        dcap = jnp.sum(
            do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True
        )
        logits = scale * jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (block_q, block_k)
        if needs_mask:
            key_idx = j * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            logits = jnp.where(key_idx < valid_len, logits, -jnp.inf)
        p = jnp.exp(logits - lse)
        dv_acc = dv_acc + jax.lax.dot_general(
            p.astype(do.dtype), do,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (block_k, d)
        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = (p * (dp - dcap) * scale).astype(q.dtype)
        dk_acc = dk_acc + jax.lax.dot_general(
            ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (block_k, d)
        return dk_acc, dv_acc

    z = jnp.zeros((block_k, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, num_qb, body, (z, z))
    dk_ref[:] = dk.astype(dk_ref.dtype)
    dv_ref[:] = dv.astype(dv_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret")
)
def _flash_attention_bwd_impl(
    q, k, v, out, lse, g, scale, block_q, block_k, interpret
):
    """Pallas flash backward: dq over q-blocks, dk/dv over k-blocks.

    ``lse`` is the forward's logsumexp saved single-lane, (B*H, S_pad, 1)
    fp32 — re-broadcast to the TPU-legal 128-lane layout here, transiently,
    so the residual held across fwd->bwd stays O(S) rather than O(128 S).
    D = rowsum(dO * O) is computed inside the kernels from the O blocks.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    b, s, h, d = q.shape
    block_q, block_k, s_pad = _pick_blocks(s, block_q, block_k)

    qh, kh, vh = _to_heads(q, s_pad), _to_heads(k, s_pad), _to_heads(v, s_pad)
    doh, oh = _to_heads(g, s_pad), _to_heads(out, s_pad)
    lse = jnp.broadcast_to(lse, (b * h, s_pad, 128))

    full = lambda i, j: (i, 0, 0)
    blk_q = pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    blk_k = pl.BlockSpec((None, block_k, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    full_d = pl.BlockSpec((None, s_pad, d), full, memory_space=pltpu.VMEM)
    full_l = pl.BlockSpec((None, s_pad, 128), full, memory_space=pltpu.VMEM)
    blk_q_l = pl.BlockSpec((None, block_q, 128), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, block_k=block_k, scale=scale, valid_len=s),
        grid=(b * h, s_pad // block_q),
        in_specs=[blk_q, full_d, full_d, blk_q, blk_q, blk_q_l],
        out_specs=blk_q,
        out_shape=jax.ShapeDtypeStruct((b * h, s_pad, d), q.dtype),
        interpret=interpret,
    )(qh, kh, vh, doh, oh, lse)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, block_q=block_q, scale=scale, valid_len=s),
        grid=(b * h, s_pad // block_k),
        in_specs=[full_d, blk_k, blk_k, full_d, full_d, full_l],
        out_specs=[blk_k, blk_k],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, s_pad, d), k.dtype),
            jax.ShapeDtypeStruct((b * h, s_pad, d), v.dtype),
        ],
        interpret=interpret,
    )(qh, kh, vh, doh, oh, lse)

    def from_heads(x):
        x = x[:, :s].reshape(b, h, s, d)
        return jnp.transpose(x, (0, 2, 1, 3))

    return from_heads(dq), from_heads(dk), from_heads(dv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
) -> jax.Array:
    """Differentiable entry: Pallas kernel forward, flash backward.

    Pallas calls have no autodiff rule, so without this wrapper a training
    step that routed self-attention through the kernel would fail inside
    ``jax.grad``. Long sequences (>= FLASH_BWD_MIN_S) save the logsumexp
    residual and run the Pallas backward kernels (O(S) memory); short ones
    recompute through ``jax.nn.dot_product_attention`` and differentiate
    that (same math, one extra forward — the standard flash remat trade).
    """
    return _flash_attention_impl(q, k, v, scale, block_q, block_k, interpret)


def _flash_attention_fwd(q, k, v, scale, block_q, block_k, interpret):
    if _use_bwd_kernel(q.shape[1], q.shape[-1], q.dtype.itemsize):
        out, lse = _flash_attention_impl(
            q, k, v, scale, block_q, block_k, interpret, save_lse=True
        )
        # keep only one lane of the lane-replicated lse as the residual:
        # O(S) held across fwd->bwd instead of O(128 S)
        return out, (q, k, v, out, lse[..., :1])
    out = _flash_attention_impl(q, k, v, scale, block_q, block_k, interpret)
    return out, (q, k, v, None, None)


def _flash_attention_bwd(scale, block_q, block_k, interpret, res, g):
    q, k, v, out, lse = res
    if lse is not None:
        return _flash_attention_bwd_impl(
            q, k, v, out, lse, g, scale, block_q, block_k, interpret
        )
    if scale is None:
        scale = q.shape[-1] ** -0.5
    _, pull = jax.vjp(
        lambda q, k, v: jax.nn.dot_product_attention(q, k, v, scale=scale), q, k, v
    )
    return pull(g)


flash_attention.defvjp(_flash_attention_fwd, _flash_attention_bwd)


def _single_pass_kernel(
    q_ref, k_ref, v_ref, o_ref, *, scale: float, valid_len: int
):
    """One (head, q-block) with the WHOLE key range in one dot: single-pass
    softmax, no online rescaling. Profitable when the fp32 logits tile
    (block_q, S_pad) fits VMEM comfortably — short/medium sequences where
    the online variant's per-block max/rescale VPU work dominates.

    No max-subtraction: this kernel is VPU-bound on the (block_q, S) logits
    passes (int8 MXU dots measured only 7% faster — PERF.md), and dropping
    the row-max reduce+subtract saves 12% (434 -> 381 us at DiT geometry).
    Instead logits clamp to [-80, 80]: exp(80)=5.5e34, so even summed over
    SINGLE_PASS_MAX_S=2048 keys the row sum stays under fp32 max (1.1e38),
    exp(-80)=1.8e-35 avoids the all-underflow NaN, and softmax is exact for
    any logits within +/-80 — beyond that it is saturated; two keys both
    above 80 would flatten to equal weight, which is the only (pathological,
    RMS-normed-q/k) regime where this kernel diverges from the online one.
    """
    s = k_ref.shape[0]
    q = q_ref[:]
    logits = scale * jax.lax.dot_general(
        q, k_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (block_q, S_pad)
    if valid_len < s:
        key_idx = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(key_idx < valid_len, logits, -jnp.inf)
    p = jnp.exp(jnp.clip(logits, -80.0, 80.0))
    if valid_len < s:
        # restore exact zeros for masked keys (clip turned -inf into -80)
        p = jnp.where(key_idx < valid_len, p, 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = (acc / l).astype(o_ref.dtype)


# Above this padded sequence length the single-pass fp32 logits tile gets too
# large for comfortable VMEM double-buffering; use the online-softmax kernel.
SINGLE_PASS_MAX_S = 2048


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_blocks(s: int, block_q: int, block_k: int):
    """Pick (block_q, block_k, s_pad) such that both block sizes divide the
    padded sequence length (every query block is written exactly once).

    Blocks stay at 128 * 2^n (halved only when larger than the sequence
    itself) and the sequence is padded to the larger block, so the smaller
    block always divides ``s_pad``; padded keys are masked via ``valid_len``.
    """
    s128 = _round_up(s, 128)
    bq = block_q
    while bq > 128 and bq > s128:
        bq //= 2
    bk = block_k
    while bk > 128 and bk > s128:
        bk //= 2
    s_pad = _round_up(s, max(bq, bk))
    assert s_pad % bq == 0 and s_pad % bk == 0, (s, bq, bk)
    return bq, bk, s_pad


# ---------------------------------------------------------------------------
# Flash attention with fused split-RoPE
# ---------------------------------------------------------------------------


def _apply_split_rope_f32(x, cos, sin):
    """Half-dim rotation in fp32; x (n, d), cos/sin (n, d/2)."""
    d = x.shape[-1]
    x1, x2 = x[:, : d // 2], x[:, d // 2 :]
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)


def _flash_rope_kernel(
    q_ref, k_ref, v_ref, cos_ref, sin_ref, o_ref, *, block_k: int, scale: float, valid_len: int
):
    """Flash attention applying split-RoPE to q and k inside the kernel.

    q_ref: (block_q, d); k_ref/v_ref: (S_pad, d);
    cos_ref/sin_ref: (S_pad, d/2) per-(batch, head) RoPE tables. The q-block
    tables are sliced from the same refs by the program's q offset.
    """
    block_q, d = q_ref.shape
    s = k_ref.shape[0]
    num_kb = s // block_k
    needs_mask = valid_len < s

    j = pl.program_id(1)
    q_cos = cos_ref[pl.ds(j * block_q, block_q), :]
    q_sin = sin_ref[pl.ds(j * block_q, block_q), :]
    # RoPE rotates in fp32 (parity with the unfused path) but the MXU dot
    # takes bf16 operands with fp32 accumulation; scale applies post-dot.
    in_dtype = q_ref.dtype
    q = _apply_split_rope_f32(q_ref[:].astype(jnp.float32), q_cos, q_sin).astype(in_dtype)

    def body(kb, carry):
        m_prev, l_prev, acc = carry
        k_raw = k_ref[pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        k_cos = cos_ref[pl.ds(kb * block_k, block_k), :]
        k_sin = sin_ref[pl.ds(kb * block_k, block_k), :]
        k = _apply_split_rope_f32(k_raw, k_cos, k_sin).astype(in_dtype)
        v = v_ref[pl.ds(kb * block_k, block_k), :]
        logits = scale * jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if needs_mask:
            key_idx = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            logits = jnp.where(key_idx < valid_len, logits, -jnp.inf)
        m_cur = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(logits - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc

    m0 = jnp.full((block_q, 1), -jnp.inf, dtype=jnp.float32)
    l0 = jnp.zeros((block_q, 1), dtype=jnp.float32)
    acc0 = jnp.zeros((block_q, d), dtype=jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
    o_ref[:] = (acc / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret")
)
def _flash_attention_split_rope_impl(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
) -> jax.Array:
    """Self-attention over (B, S, H, D) with split-RoPE fused into the kernel.

    cos/sin: (B, H, S, D/2) fp32 RoPE tables (the DiT's SPLIT layout,
    models/ltx/rope.py). Saves the q/k RoPE materialization round trips
    through HBM (the "fused 3D RoPE" hot-path item).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    b, s, h, d = q.shape

    block_q, block_k, s_pad = _pick_blocks(s, block_q, block_k)

    qh, kh, vh = _to_heads(q, s_pad), _to_heads(k, s_pad), _to_heads(v, s_pad)
    cos_h = cos.astype(jnp.float32).reshape(b * h, s, d // 2)
    sin_h = sin.astype(jnp.float32).reshape(b * h, s, d // 2)
    if s_pad != s:
        cos_h = jnp.pad(cos_h, ((0, 0), (0, s_pad - s), (0, 0)), constant_values=1.0)
        sin_h = jnp.pad(sin_h, ((0, 0), (0, s_pad - s), (0, 0)))

    grid = (b * h, s_pad // block_q)
    out = pl.pallas_call(
        functools.partial(
            _flash_rope_kernel, block_k=block_k, scale=scale, valid_len=s
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, s_pad, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, s_pad, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, s_pad, d // 2), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, s_pad, d // 2), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, s_pad, d), q.dtype),
        interpret=interpret,
    )(qh, kh, vh, cos_h, sin_h)

    out = out[:, :s].reshape(b, h, s, d)
    return jnp.transpose(out, (0, 2, 1, 3))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def flash_attention_split_rope(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
) -> jax.Array:
    """Differentiable entry for the fused split-RoPE kernel (see
    :func:`flash_attention` for the VJP strategy)."""
    return _flash_attention_split_rope_impl(
        q, k, v, cos, sin, scale, block_q, block_k, interpret
    )


def _xla_split_rope_attention(q, k, v, cos, sin, scale):
    """XLA reference of the fused kernel's math: fp32 split-RoPE on q/k
    (rotation halves along the head dim), cast back, flash-style attention."""

    def rope(x):
        xf = x.astype(jnp.float32)
        x1, x2 = jnp.split(xf, 2, axis=-1)  # (B, S, H, D/2)
        c = jnp.transpose(cos.astype(jnp.float32), (0, 2, 1, 3))  # (B,H,S,·) -> (B,S,H,·)
        s_ = jnp.transpose(sin.astype(jnp.float32), (0, 2, 1, 3))
        return jnp.concatenate([x1 * c - x2 * s_, x2 * c + x1 * s_], axis=-1).astype(x.dtype)

    return jax.nn.dot_product_attention(rope(q), rope(k), v, scale=scale)


def _fa_rope_fwd(q, k, v, cos, sin, scale, block_q, block_k, interpret):
    out = _flash_attention_split_rope_impl(
        q, k, v, cos, sin, scale, block_q, block_k, interpret
    )
    return out, (q, k, v, cos, sin)


def _fa_rope_bwd(scale, block_q, block_k, interpret, res, g):
    q, k, v, cos, sin = res
    if scale is None:
        scale = q.shape[-1] ** -0.5
    _, pull = jax.vjp(
        lambda q, k, v, cos, sin: _xla_split_rope_attention(q, k, v, cos, sin, scale),
        q, k, v, cos, sin,
    )
    return pull(g)


flash_attention_split_rope.defvjp(_fa_rope_fwd, _fa_rope_bwd)


# ---------------------------------------------------------------------------
# Cross-attention (short KV) kernel
# ---------------------------------------------------------------------------


def _cross_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float, valid_len: int):
    """One (batch*head, q-block) of text cross-attention.

    q_ref: (block_q, d); k_ref/v_ref: (S_kv_pad, d); bias_ref: (1, S_kv_pad)
    additive per-key bias (the caption padding mask). The whole KV fits in
    VMEM, so the (block_q, S_kv) logits never round-trip through HBM —
    unlike the XLA path, which materializes fp32 logits + softmax
    (bandwidth-bound at DiT geometry: 1280 queries x 128 caption tokens).
    """
    s_kv = k_ref.shape[0]
    q = q_ref[:]
    k = k_ref[:]
    logits = scale * jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (block_q, s_kv)
    logits = logits + bias_ref[:]  # (1, s_kv) broadcasts over the q block
    if valid_len < s_kv:
        key_idx = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(key_idx < valid_len, logits, -jnp.inf)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = (out / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "interpret"))
def _flash_cross_attention_impl(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    interpret: bool = False,
) -> jax.Array:
    """Cross-attention over (B, Sq, H, D) queries and (B, Skv, H, D) keys.

    ``bias``: optional additive (B, Skv) per-key bias (from the (B,1,1,Skv)
    caption mask, models/ltx/model.py:_context_bias). Softmax is single-pass
    in fp32 — KV is short enough to keep entirely in VMEM.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    b, sq, h, d = q.shape
    skv = k.shape[1]

    s128 = _round_up(sq, 128)
    bq = block_q
    while bq > 128 and bq > s128:
        bq //= 2
    sq_pad = _round_up(sq, bq)
    skv_pad = _round_up(skv, 128)

    qh = _to_heads(q, sq_pad)
    kh = _to_heads(k, skv_pad)
    vh = _to_heads(v, skv_pad)
    if bias is None:
        bias_rows = jnp.zeros((b, skv_pad), dtype=jnp.float32)
    else:
        bias_rows = bias.astype(jnp.float32)
        if skv_pad != skv:
            bias_rows = jnp.pad(bias_rows, ((0, 0), (0, skv_pad - skv)))

    grid = (b * h, sq_pad // bq)
    out = pl.pallas_call(
        functools.partial(_cross_kernel, scale=scale, valid_len=skv),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, skv_pad, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, skv_pad, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, skv_pad), lambda i, j, h=h: (i // h, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((None, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, sq_pad, d), q.dtype),
        interpret=interpret,
    )(qh, kh, vh, bias_rows)

    out = out[:, :sq].reshape(b, h, sq, d)
    return jnp.transpose(out, (0, 2, 1, 3))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def flash_cross_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    interpret: bool = False,
) -> jax.Array:
    """Differentiable entry for the short-KV cross kernel (see
    :func:`flash_attention` for the VJP strategy)."""
    return _flash_cross_attention_impl(q, k, v, bias, scale, block_q, interpret)


def _fca_fwd(q, k, v, bias, scale, block_q, interpret):
    return _flash_cross_attention_impl(q, k, v, bias, scale, block_q, interpret), (q, k, v, bias)


def _fca_bwd(scale, block_q, interpret, res, g):
    q, k, v, bias = res
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if bias is None:
        _, pull = jax.vjp(
            lambda q, k, v: jax.nn.dot_product_attention(q, k, v, scale=scale), q, k, v
        )
        return (*pull(g), None)

    def f(q, k, v, bias):
        b4 = bias.astype(q.dtype)[:, None, None, :]  # (B, Skv) -> additive logits bias
        return jax.nn.dot_product_attention(q, k, v, bias=b4, scale=scale)

    _, pull = jax.vjp(f, q, k, v, bias)
    return pull(g)


flash_cross_attention.defvjp(_fca_fwd, _fca_bwd)


# ---------------------------------------------------------------------------
# Int8 single-pass attention (W8A8 for the attention dots)
# ---------------------------------------------------------------------------


def _single_pass_int8_kernel(
    q_ref, k_ref, v_ref, qk_scale_ref, v_scale_ref, o_ref, *, valid_len: int
):
    """Single-pass softmax attention with int8 MXU dots.

    The bf16 kernel at DiT geometry (S=1280, D=128, B*H=16) is MXU
    cycle-bound (~30 TF/s == the serial tile roofline; PERF.md); int8 dots
    take half the MXU cycles. q/k carry one per-tensor scale folded into
    the logits multiplier (softmax is NOT temperature-invariant, so the
    true scale must be applied); p is in [0,1] so its quantization scale
    is the static 1/127; v is quantized per-channel (contraction is over
    tokens, so scales must be constant along tokens).

    q_ref: (block_q, d) int8; k_ref/v_ref: (S_pad, d) int8;
    qk_scale_ref: (1, 1) fp32 = s_q * s_k * softmax_scale;
    v_scale_ref: (1, d) fp32 per-channel v scales.
    """
    s = k_ref.shape[0]
    logits_i32 = jax.lax.dot_general(
        q_ref[:], k_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    logits = logits_i32.astype(jnp.float32) * qk_scale_ref[pl.program_id(0)]
    if valid_len < s:
        key_idx = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(key_idx < valid_len, logits, -jnp.inf)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p_q = jnp.round(p * 127.0).astype(jnp.int8)
    # normalize with the quantized numerator's own sum for consistency
    l = jnp.maximum(jnp.sum(p_q.astype(jnp.float32), axis=-1, keepdims=True), 1.0)
    acc_i32 = jax.lax.dot_general(
        p_q, v_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc_i32.astype(jnp.float32) * v_scale_ref[0, :] / l
    o_ref[:] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "interpret"))
def flash_attention_int8(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    interpret: bool = False,
) -> jax.Array:
    """Full bidirectional attention over (B, S, H, D) with int8 MXU dots.

    Quantization happens here in XLA (fused into neighbors): per-tensor
    symmetric for q and k, per-(head, channel) for v.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    b, s, h, d = q.shape

    block_q, _, s_pad = _pick_blocks(s, block_q, block_q)

    qh, kh, vh = _to_heads(q, s_pad), _to_heads(k, s_pad), _to_heads(v, s_pad)

    def quant_tensor(x):
        absmax = jnp.max(jnp.abs(x.astype(jnp.float32)))
        sc = jnp.maximum(absmax / 127.0, 1e-12)
        return jnp.clip(jnp.round(x.astype(jnp.float32) / sc), -127, 127).astype(jnp.int8), sc

    q_q, s_q = quant_tensor(qh)
    k_q, s_k = quant_tensor(kh)
    v32 = vh.astype(jnp.float32)
    v_absmax = jnp.max(jnp.abs(v32), axis=1, keepdims=True)  # (B*H, 1, d)
    v_sc = jnp.maximum(v_absmax / 127.0, 1e-12)
    v_q = jnp.clip(jnp.round(v32 / v_sc), -127, 127).astype(jnp.int8)
    # p's 1/127 scale cancels against the same factor in the p_q-sum
    # normalizer inside the kernel, so v_scale carries only the v scales.
    # SMEM for the scalar; the per-channel v scales ride a (1, 1, d) VMEM
    # block (leading None axis selects the grid row — tile rules apply to
    # the last two dims (1, d=128), which pass).
    v_scale_rows = v_sc.astype(jnp.float32)  # (B*H, 1, d)
    qk_scale = jnp.broadcast_to(
        (s_q * s_k * scale).astype(jnp.float32).reshape(1), (b * h,)
    )

    grid = (b * h, s_pad // block_q)
    out = pl.pallas_call(
        functools.partial(_single_pass_int8_kernel, valid_len=s),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, s_pad, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, s_pad, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b * h,), lambda i, j: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((None, 1, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, s_pad, d), q.dtype),
        interpret=interpret,
    )(q_q, k_q, v_q, qk_scale, v_scale_rows)

    out = out[:, :s].reshape(b, h, s, d)
    return jnp.transpose(out, (0, 2, 1, 3))
