"""A/B: three separate QKV gemms vs one fused (K, 3N) gemm, DiT geometries.

Timing: warm up (incl. the fetch-sum kernels), then N async dispatches +
one scalar fetch, best of 3.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp


def fetch(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timed(fn, args, iters=50):
    fetch(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        fetch(out)
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    for (s, kdim) in [(1280, 2048), (5184, 4096), (2560, 2048)]:
        x = jax.random.normal(jax.random.key(0), (s, kdim), dtype=jnp.bfloat16)
        wq = jax.random.normal(jax.random.key(1), (kdim, kdim), dtype=jnp.bfloat16)
        wk = jax.random.normal(jax.random.key(2), (kdim, kdim), dtype=jnp.bfloat16)
        wv = jax.random.normal(jax.random.key(3), (kdim, kdim), dtype=jnp.bfloat16)
        wf = jnp.concatenate([wq, wk, wv], axis=1)

        @jax.jit
        def sep(x, wq, wk, wv):
            return x @ wq + (x @ wk) * 0.5 + (x @ wv) * 0.25

        @jax.jit
        def fused(x, wf):
            o = x @ wf
            q, k, v = jnp.split(o, 3, axis=1)
            return q + k * 0.5 + v * 0.25

        t_sep = timed(sep, (x, wq, wk, wv))
        t_fused = timed(fused, (x, wf))
        flops = 2 * s * kdim * kdim * 3
        print(
            f"S{s} K{kdim}: sep={t_sep*1e3:.3f}ms({flops/max(t_sep,1e-9)/1e12:.0f}TF/s) "
            f"fused={t_fused*1e3:.3f}ms({flops/max(t_fused,1e-9)/1e12:.0f}TF/s)"
        )


if __name__ == "__main__":
    main()
