"""A/B the scan-weight formulations at the config-5 1280-token bucket.

MLX_VIDEO_SCAN_WEIGHTS ∈ {xs, captured, barrier} changes how the stacked
48-layer block params reach the remat'd training scan (models/ltx/model.py)
— targeting the measured 2 × 1.5 GiB whole-stack layout copies of the
packed-quant FFN stacks (PERF.md r4). For one mode this script:

1. builds the 19B w4a8 + LoRA-r64 fused layout-stable train step at the
   (128, 5, 16, 16) bucket (512²×33f → 1280 tokens),
2. prints the TPU compiler's own memory plan (`memory_analysis()`:
   temp/argument/output/alias bytes — the ground truth for the transient),
3. runs timed steps → steps/s.

Run one mode per process (device HBM and trace caches stay clean):

    python scripts/ab_scan_weights.py --mode xs
    python scripts/ab_scan_weights.py --mode captured
    python scripts/ab_scan_weights.py --mode barrier
    python scripts/ab_scan_weights.py --mode xs --tiny --cpu   # smoke
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

mode = "xs"
if "--mode" in sys.argv:
    mode = sys.argv[sys.argv.index("--mode") + 1]
assert mode in ("xs", "captured", "barrier"), mode
os.environ["MLX_VIDEO_SCAN_WEIGHTS"] = mode

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    from bench import synth_q4_params
    from mlx_video_tpu.config import LTXModelConfig, LTXModelType, LTXRopeType, tiny_test_config
    from mlx_video_tpu.lora import LoRAConfig, inject_lora, lora_mask
    from mlx_video_tpu.pipelines.positions import create_position_grid
    from mlx_video_tpu.trainer.strategies import StrategyBatch, _first_frame_token_mask
    from mlx_video_tpu.trainer.train_step import (
        build_fused_layout_stable,
        make_optimizer,
        partition_trainable,
    )
    from mlx_video_tpu.utils.device import drain_device_queue

    tiny = "--tiny" in sys.argv
    t0 = time.time()
    if tiny:
        config = tiny_test_config(LTXModelType.VideoOnly)
        f, h, w = 2, 4, 4
        rank = 4
        from mlx_video_tpu.models.ltx.model import init_ltx_params
        from mlx_video_tpu.ops.quant import quantize_dit_params

        base = quantize_dit_params(
            init_ltx_params(jax.random.key(0), config, dtype=jnp.bfloat16), group_size=16
        )
    else:
        config = LTXModelConfig(
            model_type=LTXModelType.VideoOnly,
            num_attention_heads=32, attention_head_dim=128,
            in_channels=128, out_channels=128, num_layers=48,
            cross_attention_dim=4096, caption_channels=3840,
            rope_type=LTXRopeType.SPLIT,
        )
        f, h, w = 5, 16, 16  # 512²×33f → 1280 tokens (BENCH_C5 bucket)
        rank = 64
        from mlx_video_tpu.ops.quant import prepare_w4a8

        base = prepare_w4a8(synth_q4_params(config), bits=4)
    if not tiny:
        import dataclasses

        config = dataclasses.replace(config, gradient_checkpointing=True)

    params = inject_lora(base, config, LoRAConfig(rank=rank, alpha=2.0 * rank),
                         jax.random.key(1), dtype=jnp.bfloat16)
    base = None
    train, frozen = partition_trainable(params, lora_mask(params))
    params = None
    import gc

    gc.collect()
    drain_device_queue()
    print(f"[{mode}] setup {time.time() - t0:.1f}s", file=sys.stderr)

    tokens = f * h * w
    b = 1
    sb = StrategyBatch(
        video_latents=jnp.zeros((b, tokens, config.in_channels), jnp.bfloat16),
        positions=jnp.asarray(create_position_grid(b, f, h, w)),
        context=jnp.zeros((b, 128, config.caption_channels), jnp.bfloat16),
        context_mask=None,
        first_frame_token_mask=jnp.asarray(_first_frame_token_mask(b, f, h, w)),
        always_conditioned_mask=jnp.zeros((b, tokens), dtype=bool),
    )
    opt = make_optimizer(1e-4, mu_dtype=jnp.bfloat16)

    t0 = time.time()
    step = build_fused_layout_stable(opt, config, train, frozen, [sb])
    build_s = time.time() - t0
    compiled = next(iter(step.step_fns.values()))
    ma = compiled.memory_analysis()
    mem = {}
    for k in ("temp_size_in_bytes", "argument_size_in_bytes",
              "output_size_in_bytes", "alias_size_in_bytes",
              "generated_code_size_in_bytes"):
        v = getattr(ma, k, None)
        if v is not None:
            mem[k] = int(v)
    print(f"[{mode}] build {build_s:.1f}s memory_analysis:", file=sys.stderr)
    for k, v in mem.items():
        print(f"    {k}: {v / 2**30:.3f} GiB", file=sys.stderr)

    # place + run
    from mlx_video_tpu.pipelines.denoise import relayout_params

    train = relayout_params(train, step.train_formats, donate=True, fence_bytes=1 << 30)
    frozen = relayout_params(frozen, step.frozen_formats, donate=True, fence_bytes=1 << 30)
    drain_device_queue()
    ost = opt.init(train)
    ost = relayout_params(ost, step.ost_formats, donate=True, fence_bytes=1 << 30)
    drain_device_queue()

    def sync(x) -> float:
        return float(jnp.sum(x.astype(jnp.float32)))

    reps = 2 if tiny else 5
    loss, train, ost = step.step(train, frozen, ost, sb, jax.random.key(2))
    first = sync(loss)
    t0 = time.time()
    for i in range(reps):
        loss, train, ost = step.step(train, frozen, ost, sb, jax.random.key(3 + i))
        last = sync(loss)
    wall = (time.time() - t0) / reps
    assert np.isfinite(last), last
    print(json.dumps({
        "mode": mode, "tokens": tokens, "rank": rank,
        "steps_per_sec": round(1.0 / wall, 3), "step_wall_s": round(wall, 3),
        "build_s": round(build_s, 1), "first_loss": round(first, 3),
        **{k: round(v / 2**30, 3) for k, v in mem.items()},
    }))


if __name__ == "__main__":
    main()
