"""Bisect the config-3 TPU worker crash: flash attention standalone at the
dev-pipeline geometry (768^2 x 65f -> S=5184 tokens, CFG-batched B=2, 32
heads, d=128, bf16).

The r3 e2e_config3 run crashed the TPU worker ("kernel fault") with the
error surfacing at the first post-denoise fetch — i.e. somewhere inside the
denoise scan at 5184 tokens. The flagship bench at 1280 tokens is solid, so
this probes the one shape-dependent Pallas program in that scan at the
exact failing geometry, against the XLA path as control.

Usage: python scripts/chip_check_5184.py [--xla-only|--flash-only]
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def sync(x) -> float:
    return float(jnp.sum(x.astype(jnp.float32)))


def main() -> int:
    from mlx_video_tpu.ops.flash_attention import flash_attention

    b, s, h, d = 2, 5184, 32, 128
    print("devices:", jax.devices(), flush=True)
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(k1, (b, s, h, d), jnp.bfloat16)
    k = jax.random.normal(k2, (b, s, h, d), jnp.bfloat16)
    v = jax.random.normal(k3, (b, s, h, d), jnp.bfloat16)
    scale = d**-0.5

    ref_sum = None
    if "--flash-only" not in sys.argv:
        t0 = time.time()
        xla = jax.jit(lambda q, k, v: jax.nn.dot_product_attention(q, k, v, scale=scale))
        ref_sum = sync(xla(q, k, v))
        print(f"XLA fwd OK: sum={ref_sum:.3f} (compile+run {time.time()-t0:.1f}s)", flush=True)
        t0 = time.time()
        sync(xla(q, k, v))
        print(f"XLA steady: {time.time()-t0:.3f}s", flush=True)

    if "--xla-only" not in sys.argv:
        t0 = time.time()
        fl = jax.jit(lambda q, k, v: flash_attention(q, k, v, scale))
        out_sum = sync(fl(q, k, v))
        print(f"flash fwd OK: sum={out_sum:.3f} (compile+run {time.time()-t0:.1f}s)", flush=True)
        t0 = time.time()
        sync(fl(q, k, v))
        print(f"flash steady: {time.time()-t0:.3f}s", flush=True)
        if ref_sum is not None:
            rel = abs(out_sum - ref_sum) / max(1.0, abs(ref_sum))
            print(f"sum rel diff vs XLA: {rel:.2e} -> {'OK' if rel < 1e-2 else 'FAIL'}", flush=True)
    print("CHIP 5184 CHECK: done", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
