"""A/B standalone attention kernels on the real chip.

Compares at DiT geometries:
  - ours: mlx_video_tpu.ops.flash_attention.flash_attention
  - stock jax.experimental.pallas.ops.tpu.flash_attention
  - splash attention (FullMask)
  - XLA jax.nn.dot_product_attention

Timing: warm up, then N async dispatches + ONE scalar fetch; report
(total - rpc)/N where rpc is one warmed scalar-fetch round trip. Dispatch
floor (~0.2 ms/call through the tunnel) is common to all variants.
"""

from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp


def fetch(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def rpc_baseline():
    f = jax.jit(lambda a: a + 1)
    x = jnp.zeros((8, 128))
    fetch(f(x))  # compile f and the sum
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        fetch(f(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def timed(fn, args, iters=30):
    out = fn(*args)
    fetch(out)  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        fetch(out)
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    from mlx_video_tpu.ops.flash_attention import flash_attention as ours

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention as stock_flash,
    )
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sak,
        splash_attention_mask as sam,
    )

    rpc = rpc_baseline()
    print(f"rpc baseline {rpc*1e3:.1f} ms", file=sys.stderr)

    geoms = [
        (1, 1280, 16, 128),  # proxy bench geometry
        (1, 5120, 32, 128),  # ~flagship stage-2 geometry (block-divisible)
        (2, 1280, 16, 128),  # CFG-batched proxy
    ]
    for (b, s, h, d) in geoms:
        q = jax.random.normal(jax.random.key(0), (b, s, h, d), dtype=jnp.bfloat16)
        k = jax.random.normal(jax.random.key(1), (b, s, h, d), dtype=jnp.bfloat16)
        v = jax.random.normal(jax.random.key(2), (b, s, h, d), dtype=jnp.bfloat16)
        qt = jnp.transpose(q, (0, 2, 1, 3))
        kt = jnp.transpose(k, (0, 2, 1, 3))
        vt = jnp.transpose(v, (0, 2, 1, 3))
        scale = d ** -0.5
        flops = 4.0 * b * h * s * s * d

        results = {}
        results["ours"] = timed(jax.jit(partial(ours, scale=scale)), (q, k, v)) - rpc / 30

        results["xla"] = (
            timed(
                jax.jit(lambda a, bb, c: jax.nn.dot_product_attention(a, bb, c, scale=scale)),
                (q, k, v),
            )
            - rpc / 30
        )

        @jax.jit
        def run_stock(qt, kt, vt):
            return stock_flash(qt * scale, kt, vt, causal=False)

        try:
            results["stock_flash"] = timed(run_stock, (qt, kt, vt)) - rpc / 30
        except Exception as e:
            print(f"stock_flash failed: {type(e).__name__}: {e}", file=sys.stderr)

        try:
            mask = sam.FullMask(_shape=(s, s))
            mh_mask = sam.MultiHeadMask(masks=[mask] * h)
            kernel = sak.make_splash_mha(mask=mh_mask, head_shards=1, q_seq_shards=1)

            @jax.jit
            def run_splash(qt, kt, vt):
                return jax.vmap(kernel)(qt * scale, kt, vt)

            results["splash"] = timed(run_splash, (qt, kt, vt)) - rpc / 30
        except Exception as e:
            print(f"splash failed: {type(e).__name__}: {e}", file=sys.stderr)

        line = f"B{b} S{s} H{h} D{d}: " + "  ".join(
            f"{k_}={v_*1e3:.2f}ms({flops/max(v_,1e-9)/1e12:.0f}TF/s)"
            for k_, v_ in results.items()
        )
        print(line)


if __name__ == "__main__":
    main()
