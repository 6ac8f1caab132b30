"""A/B the flash-attention BACKWARD on the real chip: Pallas kernels vs XLA.

Measures jax.grad through flash_attention with the backward forced to the
Pallas dq/dkv kernels vs the XLA recompute VJP, at DiT training geometries.
The forward is the same Pallas kernel in both runs, so the difference is
the backward alone. Also reports XLA end-to-end (XLA fwd + XLA bwd) as the
no-kernel baseline.

Timing follows scripts/ab_attention.py: warm compile, N async dispatches +
one scalar fetch, minus a warmed RPC round trip.

Usage: python scripts/ab_flash_bwd.py [--tiny] [--cpu]
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
    fetch(f(x))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        fetch(f(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def timed(fn, args, iters=20):
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
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    import mlx_video_tpu.ops.flash_attention as fa

    interpret = "--cpu" in sys.argv
    rpc = rpc_baseline()
    print(f"rpc baseline {rpc*1e3:.1f} ms", file=sys.stderr)

    geoms = (
        [(1, 256, 2, 128)]
        if "--tiny" in sys.argv
        else [
            (1, 1280, 16, 128),  # proxy training geometry (512^2 buckets)
            (1, 5120, 32, 128),  # ~flagship stage-2 / long-video geometry
        ]
    )
    for (b, s, h, d) in geoms:
        q = jax.random.normal(jax.random.key(0), (b, s, h, d), dtype=jnp.bfloat16)
        k = jax.random.normal(jax.random.key(1), (b, s, h, d), dtype=jnp.bfloat16)
        v = jax.random.normal(jax.random.key(2), (b, s, h, d), dtype=jnp.bfloat16)
        scale = d**-0.5
        # fwd 2 dots + bwd 5 dots, each 2*b*h*s*s*d MACs
        flops = 2.0 * b * h * s * s * d * 2 * 3.5

        def loss(q, k, v):
            return jnp.sum(fa.flash_attention(q, k, v, scale=scale, interpret=interpret))

        def loss_xla(q, k, v):
            return jnp.sum(jax.nn.dot_product_attention(q, k, v, scale=scale))

        results = {}
        for label, force in (("pallas_bwd", True), ("xla_bwd", False)):
            fa._FORCE_FLASH_BWD = force
            jax.clear_caches()  # the fwd residual routing is baked into the trace
            g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
            results[label] = timed(lambda *a: g(*a)[0], (q, k, v)) - rpc / 20
        fa._FORCE_FLASH_BWD = None
        jax.clear_caches()
        g_x = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))
        results["xla_e2e"] = timed(lambda *a: g_x(*a)[0], (q, k, v)) - rpc / 20

        line = f"B{b} S{s} H{h} D{d} grad(fwd+bwd): " + "  ".join(
            f"{k_}={v_*1e3:.2f}ms({flops/max(v_,1e-9)/1e12:.0f}TF/s)"
            for k_, v_ in results.items()
        )
        print(line)
        ratio = results["xla_bwd"] / max(results["pallas_bwd"], 1e-9)
        print(f"  pallas-vs-xla-bwd speedup: {ratio:.2f}x", file=sys.stderr)


if __name__ == "__main__":
    main()
