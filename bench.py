"""Benchmark: DiT denoise throughput on real TPU hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: denoise steps/sec on a 48-layer LTX-style DiT "proxy-3B" config
(dim 2048, 16 heads x 128) at the default distilled geometry — 512x512x33f
-> 5x16x16 = 1280 latent tokens, SPLIT RoPE — the same hot loop as the
19B model (which does not fit a single v5e chip in bf16; later rounds bench
the sharded 19B on the virtual mesh and real multi-chip when available).

Default mode is W8A8 int8 execution (ops/int8.py: int8 x int8 -> int32 on
the MXU at 2x the bf16 rate, per-token dynamic activation scales; final
8-step latents match bf16 to cosine 0.99999 / rel 0.5% at this scale —
scripts/ab_w8a8.py). Pass --dense for the bf16 path.

Timing protocol: per-step = (t(8-step scan) - t(2-step scan)) / 6, medians
over 4 pairs — per-call fixed costs (tunnel RPC, dispatch, arg marshalling)
cancel, which simple wall-clock-over-reps does not through the axon tunnel
(PERF.md "measurement gotchas").

The reference publishes no benchmark numbers (BASELINE.md): vs_baseline is
reported against a fixed anchor of 2.0 steps/s — the step rate implied by
the north star (<10 s e2e for 8+3 steps leaves ~5.5 s of denoise budget) —
so the ratio is comparable across rounds.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

ANCHOR_STEPS_PER_SEC = 2.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from mlx_video_tpu.config import LTXModelConfig, LTXModelType, LTXRopeType
    from mlx_video_tpu.models.ltx.model import init_ltx_params
    from mlx_video_tpu.pipelines import denoise as dn
    from mlx_video_tpu.pipelines.positions import create_position_grid

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    w8a8 = "--dense" not in sys.argv

    dev = jax.devices()[0]
    print(f"bench device: {dev} mode={'w8a8' if w8a8 else 'dense bf16'}", file=sys.stderr)

    config = LTXModelConfig(
        model_type=LTXModelType.VideoOnly,
        num_attention_heads=16,
        attention_head_dim=128,
        in_channels=128,
        out_channels=128,
        num_layers=48,
        cross_attention_dim=2048,
        caption_channels=3840,
        rope_type=LTXRopeType.SPLIT,
    )
    if "--tiny" in sys.argv:  # fast smoke mode
        config = LTXModelConfig(
            model_type=LTXModelType.VideoOnly,
            num_attention_heads=4,
            attention_head_dim=32,
            in_channels=16,
            out_channels=16,
            num_layers=4,
            cross_attention_dim=128,
            caption_channels=64,
            rope_type=LTXRopeType.SPLIT,
        )

    b, f, h, w = 1, 5, 16, 16  # 512x512x33f distilled geometry -> 1280 tokens
    # Init (and quantize) on the host CPU device so no fp32/duplicate
    # transient lands in HBM; then place on the accelerator.
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_ltx_params(jax.random.key(0), config, dtype=jnp.bfloat16)
        if w8a8:
            from mlx_video_tpu.ops.int8 import quantize_params_w8a8

            params = quantize_params_w8a8(params)
    params = jax.device_put(params, dev)
    jax.block_until_ready(params)

    latents = jax.random.normal(
        jax.random.key(1), (b, config.in_channels, f, h, w), dtype=jnp.bfloat16
    )
    positions = jnp.asarray(create_position_grid(b, f, h, w))
    context = jax.random.normal(
        jax.random.key(2), (b, 128, config.caption_channels), dtype=jnp.bfloat16
    )

    # Distilled stage-1 sigma schedule, 8 steps (reference default recipe).
    sigmas = [1.0, 0.99375, 0.9875, 0.975, 0.909375, 0.725, 0.421875, 0.2, 0.0]
    n_steps = len(sigmas) - 1
    sig2 = sigmas[:2] + [0.0]  # 2-step schedule for fixed-cost cancellation

    # NOTE: through the axon tunnel, block_until_ready() returns before the
    # computation finishes. A scalar-reduction fetch is the only honest sync.
    sum_jit = jax.jit(lambda v: jnp.sum(v.astype(jnp.float32)))

    def run(sg):
        v, _ = dn.denoise(params, config, latents, positions, context, sg)
        return v

    t0 = time.time()
    first_sum = float(sum_jit(run(sigmas)))
    print(f"8-step compile+first: {time.time() - t0:.1f}s", file=sys.stderr)
    assert np.isfinite(first_sum), "non-finite output"
    t0 = time.time()
    float(sum_jit(run(sig2)))
    print(f"2-step compile+first: {time.time() - t0:.1f}s", file=sys.stderr)

    t8s, t2s = [], []
    for _ in range(4):
        t0 = time.time()
        float(sum_jit(run(sigmas)))
        t8s.append(time.time() - t0)
        t0 = time.time()
        float(sum_jit(run(sig2)))
        t2s.append(time.time() - t0)
    per_step = (np.median(t8s) - np.median(t2s)) / (n_steps - 2)
    steps_per_sec = 1.0 / per_step
    print(f"t8 med {np.median(t8s):.3f}s t2 med {np.median(t2s):.3f}s", file=sys.stderr)

    mode = "w8a8 int8" if w8a8 else "bf16"
    print(
        json.dumps(
            {
                "metric": "dit_proxy3b_denoise_steps_per_sec",
                "value": round(steps_per_sec, 3),
                "unit": f"steps/s (48L dim2048 DiT, 1280 tokens, {mode}, 1 chip)",
                "vs_baseline": round(steps_per_sec / ANCHOR_STEPS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
