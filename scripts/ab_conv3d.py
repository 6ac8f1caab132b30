"""A/B alternative formulations of the VAE 3x3x3 conv on one chip.

XLA's TPU conv at the decoder geometries measures 2.5-11 TF/s (peak 197).
Candidates, all numerically identical (bf16 in, fp32 accum by XLA):

  conv3d     lax.conv_general_dilated NDHWC (current implementation)
  tap2d      sum of 3 temporal taps of a (B*F)-batched 2D conv
  shift27    27 shifted (1x1x1) matmuls accumulated (conv as dot_general)
  im2col     explicit patch extraction -> one (BFHW, 27*C) @ (27*C, O) matmul

    python scripts/ab_conv3d.py
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    def sync(x) -> float:
        return float(jnp.sum(x.astype(jnp.float32)))

    def timeit(fn, reps: int = 3):
        t0 = time.time()
        fn()  # first call: device-side compile + dispatch
        first = time.time() - t0
        ts = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            ts.append(time.time() - t0)
        return first, sorted(ts)[len(ts) // 2]

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", file=sys.stderr)

    geoms = [
        (1024, (5, 16, 16)),
        (512, (9, 32, 32)),
        (256, (17, 64, 64)),
        (128, (33, 128, 128)),
    ]

    @jax.jit
    def conv3d(x, wgt):
        return lax.conv_general_dilated(
            x, wgt, (1, 1, 1), "VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )

    @jax.jit
    def tap2d(x, wgt):
        b, fp, hp, wp, c = x.shape
        fo = fp - 2
        out = None
        for t in range(3):
            xt = x[:, t : t + fo].reshape(b * fo, hp, wp, c)
            o = lax.conv_general_dilated(
                xt, wgt[t], (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            out = o if out is None else out + o
        return out.reshape(b, fo, hp - 2, wp - 2, -1)

    @jax.jit
    def shift27(x, wgt):
        b, fp, hp, wp, c = x.shape
        fo, ho, wo = fp - 2, hp - 2, wp - 2
        out = None
        for t in range(3):
            for i in range(3):
                for j in range(3):
                    xt = x[:, t : t + fo, i : i + ho, j : j + wo]
                    o = jnp.einsum(
                        "bfhwc,co->bfhwo", xt, wgt[t, i, j],
                        preferred_element_type=jnp.float32,
                    )
                    out = o if out is None else out + o
        return out.astype(x.dtype)

    @jax.jit
    def im2col(x, wgt):
        b, fp, hp, wp, c = x.shape
        fo, ho, wo = fp - 2, hp - 2, wp - 2
        cols = []
        for t in range(3):
            for i in range(3):
                for j in range(3):
                    cols.append(x[:, t : t + fo, i : i + ho, j : j + wo])
        patches = jnp.concatenate(cols, axis=-1).reshape(b * fo * ho * wo, 27 * c)
        w2 = wgt.reshape(27 * c, -1)
        return (patches @ w2).reshape(b, fo, ho, wo, -1)

    variants = [("conv3d", conv3d), ("tap2d", tap2d), ("shift27", shift27), ("im2col", im2col)]

    for ch, (f, h, w) in geoms:
        key = jax.random.key(0)
        x = jax.random.normal(key, (1, f + 2, h + 2, w + 2, ch), jnp.bfloat16)
        wgt = (jax.random.normal(key, (3, 3, 3, ch, ch), jnp.float32) * 0.02).astype(jnp.bfloat16)
        flops = 2 * f * h * w * 27 * ch * ch
        ref = None
        line = f"ch={ch:5d} f{f}x{h}x{w}:"
        for name, fn in variants:
            first, t = timeit(lambda fn=fn: sync(fn(x, wgt)))
            out = np.asarray(fn(x, wgt), dtype=np.float32)
            if ref is None:
                ref = out
            else:
                err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
                assert err < 3e-2, (name, err)
            line += f"  {name} {t*1e3:7.1f}ms ({flops/t/1e12:5.2f}TF/s, 1st {first:5.1f}s)"
        print(line)


if __name__ == "__main__":
    main()
