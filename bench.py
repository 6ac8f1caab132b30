"""Benchmark: DiT denoise throughput on real TPU hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: denoise steps/sec on a 48-layer LTX-style DiT "proxy-3B" config
(dim 2048, 16 heads x 128) at the default distilled geometry — 512x512x33f
-> 5x16x16 = 1280 latent tokens, bf16, SPLIT RoPE — the same hot loop as the
19B model (which does not fit a single v5e chip in bf16; later rounds bench
the sharded 19B on the virtual mesh and real multi-chip when available).

The reference publishes no numbers (BASELINE.md): vs_baseline is reported
against a fixed anchor of 2.0 steps/s — the step rate implied by the north
star (<10 s e2e for 8+3 steps leaves ~5.5 s of denoise budget) — so the
ratio is comparable across rounds.
"""

from __future__ import annotations

import json
import sys
import time

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

    dev = jax.devices()[0]
    print(f"bench device: {dev}", file=sys.stderr)

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
    params = init_ltx_params(jax.random.key(0), config, dtype=jnp.bfloat16)
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

    # NOTE: through the axon tunnel, block_until_ready() returns before the
    # computation finishes (verified: it reported 41 PFLOP/s on one chip).
    # A scalar-reduction fetch is the only honest sync, so timing is
    # "time-to-scalar(sum(out))" minus the measured RPC baseline.
    sum_jit = jax.jit(lambda v: jnp.sum(v.astype(jnp.float32)))

    t0 = time.time()
    v, _ = dn.denoise(params, config, latents, positions, context, sigmas)
    first_sum = float(sum_jit(v))
    compile_and_first = time.time() - t0
    print(f"first run (incl compile): {compile_and_first:.1f}s", file=sys.stderr)
    assert np.isfinite(first_sum), "non-finite output"

    # RPC latency baseline: fetch a scalar of an already-computed value.
    t0 = time.time()
    for _ in range(3):
        float(sum_jit(latents))
    rpc_baseline = (time.time() - t0) / 3
    print(f"rpc baseline: {rpc_baseline * 1000:.0f}ms", file=sys.stderr)

    reps = 3
    t0 = time.time()
    for _ in range(reps):
        v, _ = dn.denoise(params, config, latents, positions, context, sigmas)
    final_sum = float(sum_jit(v))
    elapsed = max(time.time() - t0 - rpc_baseline, 1e-9)
    steps_per_sec = reps * n_steps / elapsed
    assert np.isfinite(final_sum), "non-finite output"

    print(
        json.dumps(
            {
                "metric": "dit_proxy3b_denoise_steps_per_sec",
                "value": round(steps_per_sec, 3),
                "unit": "steps/s (48L dim2048 DiT, 1280 tokens, bf16, 1 chip)",
                "vs_baseline": round(steps_per_sec / ANCHOR_STEPS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
