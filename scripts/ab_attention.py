"""A/B standalone attention kernels on the real chip.

Compares, at DiT geometries:
  - ours: mlx_video_tpu.ops.flash_attention.flash_attention
  - stock jax.experimental.pallas.ops.tpu.flash_attention
  - splash attention (FullMask)
  - XLA jax.nn.dot_product_attention

Methodology (PERF.md): sync by fetching a scalar minus RPC baseline; loop
enough iterations that per-call time >> dispatch floor.
"""

from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, args, iters=50, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    s = float(jnp.sum(out))
    t1 = time.perf_counter()
    return (t1 - t0) / iters, s


def rpc_baseline():
    x = jnp.zeros((8, 8))
    f = jax.jit(lambda a: a + 1)
    f(x)
    t0 = time.perf_counter()
    for _ in range(20):
        float(jnp.sum(f(x)))
    return (time.perf_counter() - t0) / 20


def main():
    from mlx_video_tpu.ops.flash_attention import flash_attention as ours

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention as stock_flash,
        BlockSizes as StockBlocks,
    )
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sak,
        splash_attention_mask as sam,
    )

    base = rpc_baseline()
    print(f"rpc baseline {base*1e3:.1f} ms", file=sys.stderr)

    geoms = [
        (1, 1280, 16, 128),  # proxy bench geometry
        (1, 5184, 32, 128),  # flagship distilled stage2 geometry
        (2, 1280, 16, 128),  # CFG-batched proxy
    ]
    for (b, s, h, d) in geoms:
        kq = jax.random.key(0)
        q = jax.random.normal(kq, (b, s, h, d), dtype=jnp.bfloat16)
        k = jax.random.normal(jax.random.key(1), (b, s, h, d), dtype=jnp.bfloat16)
        v = jax.random.normal(jax.random.key(2), (b, s, h, d), dtype=jnp.bfloat16)
        # (B, H, S, D) layout for stock kernels
        qt = jnp.transpose(q, (0, 2, 1, 3))
        kt = jnp.transpose(k, (0, 2, 1, 3))
        vt = jnp.transpose(v, (0, 2, 1, 3))
        scale = d ** -0.5
        flops = 4.0 * b * h * s * s * d

        results = {}
        t, _ = timed(jax.jit(partial(ours, scale=scale)), (q, k, v))
        results["ours"] = t - base

        t, _ = timed(
            jax.jit(lambda a, bb, c: jax.nn.dot_product_attention(a, bb, c, scale=scale)),
            (q, k, v),
        )
        results["xla"] = t - base

        @jax.jit
        def run_stock(qt, kt, vt):
            return stock_flash(qt * scale, kt, vt, causal=False)

        try:
            t, _ = timed(run_stock, (qt, kt, vt))
            results["stock_flash"] = t - base
        except Exception as e:
            print(f"stock_flash failed: {type(e).__name__}: {e}", file=sys.stderr)

        try:
            mask = sam.FullMask(_shape=(s, s))
            mh_mask = sam.MultiHeadMask(masks=[mask] * h)
            kernel = sak.make_splash_mha(
                mask=mh_mask, head_shards=1, q_seq_shards=1
            )

            @jax.jit
            def run_splash(qt, kt, vt):
                return jax.vmap(kernel)(qt * scale, kt, vt)

            t, _ = timed(run_splash, (qt, kt, vt))
            results["splash"] = t - base
        except Exception as e:
            print(f"splash failed: {type(e).__name__}: {e}", file=sys.stderr)

        line = f"B{b} S{s} H{h} D{d}: " + "  ".join(
            f"{k_}={v_*1e3:.2f}ms({flops/max(v_,1e-9)/1e12:.0f}TF/s)" for k_, v_ in results.items()
        )
        print(line)


if __name__ == "__main__":
    main()
