"""Ring attention: sequence-parallel attention over a mesh axis.

New capability vs. the single-device reference (SURVEY §5 long-context):
raises the max token count (F*H*W) beyond one chip's HBM by sharding the
token axis across devices and rotating K/V blocks around the ring with
``lax.ppermute`` while accumulating an online softmax — the same math as
flash attention, with the key-block loop distributed over ICI.

Built on ``shard_map`` + XLA collectives (not hand-written RDMA): XLA
schedules the permute to overlap with the local attention compute.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map  # jax.experimental.shard_map is deprecated (v0.8)


def _local_attention_stats(q, k, v, scale):
    """Blockwise attention returning (acc, running max, running sum).

    q: (B, Sq, H, D); k/v: (B, Sk, H, D). Dots keep the input dtype as MXU
    operands (bf16 runs ~8x faster than fp32 on the systolic array) with
    fp32 accumulation/stats — the flash-kernel numerics policy
    (ops/flash_attention.py).
    """
    logits = scale * jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    m = jnp.max(logits, axis=-1)  # (B, H, Sq)
    p = jnp.exp(logits - m[..., None])
    l = jnp.sum(p, axis=-1)  # (B, H, Sq)
    acc = jnp.einsum(
        "bhqk,bkhd->bhqd", p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return acc, m, l


def _combine(m_a, l_a, acc_a, m_b, l_b, acc_b):
    """Merge two online-softmax partials."""
    m = jnp.maximum(m_a, m_b)
    alpha_a = jnp.exp(m_a - m)
    alpha_b = jnp.exp(m_b - m)
    l = l_a * alpha_a + l_b * alpha_b
    acc = acc_a * alpha_a[..., None] + acc_b * alpha_b[..., None]
    return m, l, acc


# Pallas kernel inside the ring: each local block runs the flash kernel
# (logits stay in VMEM; the XLA einsum path materializes (B, H, Sq, Sk)
# fp32 logits in HBM per ring step) and its (normalized out, lse) converts
# to equivalent online-softmax partials: acc=out, m=lse, l=1. None = auto
# (TPU backend + eligible local shapes); tests force it with interpret.
_FORCE_RING_KERNEL: Optional[bool] = None
_RING_KERNEL_INTERPRET: bool = False


def use_ring_kernel(enable: Optional[bool], interpret: bool = False) -> None:
    global _FORCE_RING_KERNEL, _RING_KERNEL_INTERPRET
    _FORCE_RING_KERNEL = enable
    _RING_KERNEL_INTERPRET = interpret


def _ring_kernel_enabled(sq_local: int, d: int) -> bool:
    eligible = d % 128 == 0 and sq_local >= 256
    if _FORCE_RING_KERNEL is not None:
        return _FORCE_RING_KERNEL and eligible
    from mlx_video_tpu.ops.attention import _tpu_backend

    return _tpu_backend() and eligible


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _local_stats_flash(q, k, v, scale):
    """Flash-kernel local block returning online-softmax partials.

    Same contract as :func:`_local_attention_stats` up to the equivalent
    (acc, m, l) parameterization: the kernel's normalized output with
    m=lse and l=1 merges identically under :func:`_combine`.
    """
    from mlx_video_tpu.ops.flash_attention import _flash_attention_impl

    b, sq, h, d = q.shape
    out, lse = _flash_attention_impl(
        q, k, v, scale, interpret=_RING_KERNEL_INTERPRET, save_lse=True
    )
    m = lse[:, :sq, 0].reshape(b, h, sq)
    acc = jnp.transpose(out, (0, 2, 1, 3)).astype(jnp.float32)  # (B, H, Sq, D)
    return acc, m, jnp.ones_like(m)


def _local_stats_flash_fwd(q, k, v, scale):
    return _local_stats_flash(q, k, v, scale), (q, k, v)


def _local_stats_flash_bwd(scale, res, cts):
    """XLA recompute backward in the kernel's (normalized, lse, 1)
    parameterization — the constant l=1 output naturally zeroes its
    cotangent. Same memory as the einsum training path it replaces."""
    q, k, v = res

    def f(q, k, v):
        acc, m, l = _local_attention_stats(q, k, v, scale)
        return acc / l[..., None], m + jnp.log(l), jnp.ones_like(m)

    _, pull = jax.vjp(f, q, k, v)
    return pull(cts)


_local_stats_flash.defvjp(_local_stats_flash_fwd, _local_stats_flash_bwd)


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    axis: str = "fsdp",
    scale: Optional[float] = None,
) -> jax.Array:
    """Full bidirectional attention with the token axis sharded on ``axis``.

    q/k/v: (B, S, H, D) with S divisible by the axis size. Returns the same
    sharding as the inputs. Numerically equivalent to single-device
    attention (verified in tests on a virtual 8-device mesh).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    n = mesh.shape[axis]
    if q.shape[1] % n != 0:
        raise ValueError(f"Sequence length {q.shape[1]} not divisible by mesh axis {axis}={n}")

    spec = P(None, axis, None, None)
    use_kernel = _ring_kernel_enabled(q.shape[1] // n, q.shape[-1])
    local_stats = _local_stats_flash if use_kernel else _local_attention_stats

    def ring(q_loc, k_loc, v_loc):
        def step(carry, _):
            k_cur, v_cur, m, l, acc = carry
            acc_b, m_b, l_b = local_stats(q_loc, k_cur, v_cur, scale)
            m, l, acc = _combine(m, l, acc, m_b, l_b, acc_b)
            # rotate k/v to the next device on the ring
            perm = [(i, (i + 1) % n) for i in range(n)]
            k_next = jax.lax.ppermute(k_cur, axis, perm)
            v_next = jax.lax.ppermute(v_cur, axis, perm)
            return (k_next, v_next, m, l, acc), None

        b, sq, h, d = q_loc.shape
        m0 = jnp.full((b, h, sq), -jnp.inf, dtype=jnp.float32)
        l0 = jnp.zeros((b, h, sq), dtype=jnp.float32)
        acc0 = jnp.zeros((b, h, sq, d), dtype=jnp.float32)
        (k_f, v_f, m, l, acc), _ = jax.lax.scan(
            step, (k_loc, v_loc, m0, l0, acc0), None, length=n
        )
        out = acc / l[..., None]
        return jnp.transpose(out, (0, 2, 1, 3)).astype(q_loc.dtype)

    return shard_map(
        ring, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec, check_vma=False
    )(q, k, v)
