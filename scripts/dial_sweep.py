"""Quality/speed dial sweep at the 19B dev geometry (VERDICT r2 item 3).

Runs the dev-CFG denoise (768^2 x 65f -> 9x24x24 = 5184 tokens, 40-step
ltx2 schedule, cfg 4.5) with the 19B-geometry W4A8 transformer on ONE
chip, once with every dial OFF and once per dial setting, on IDENTICAL
seeds, and reports for each setting:

  - steps/s (e2e denoise wall, median of --reps full schedules)
  - speedup vs dial-off
  - rel-err of the final latents vs dial-off (fp32 ||v - v0|| / ||v0||)

Dials swept (each exclusive with the others, as in the pipeline):
  teacache 0.05 / 0.1 / 0.2         (adaptive step caching)
  cfg_cache 2 / 4                   (CFG guidance-delta reuse)
  pab 2 / 3                         (Pyramid Attention Broadcast)

Weights are synthetic in the real quantized layout (timing depends on
shapes/dtypes only — same substitution as bench.py); rel-err numbers are
indicative of dial-induced drift on a realistic trajectory, not of
checkpoint quality.

    python scripts/dial_sweep.py                 # full, on the TPU
    python scripts/dial_sweep.py --tiny --cpu    # plumbing smoke
    python scripts/dial_sweep.py --reps 2 --steps 40

Prints one JSON line per setting and a final markdown table.
"""

from __future__ import annotations

import json
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

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    from bench import synth_q4_params
    from mlx_video_tpu.config import LTXModelConfig, LTXModelType, LTXRopeType
    from mlx_video_tpu.pipelines import denoise as dn
    from mlx_video_tpu.pipelines.positions import create_position_grid
    from mlx_video_tpu.pipelines.schedulers import ltx2_scheduler

    tiny = "--tiny" in sys.argv
    reps = 3
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    steps = 40
    if "--steps" in sys.argv:
        steps = int(sys.argv[sys.argv.index("--steps") + 1])

    if tiny:
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
        f, h, w = 3, 8, 8
        steps = min(steps, 8)
    else:
        # 19B geometry (48L, 32 heads x 128): the flagship bench config.
        config = LTXModelConfig(
            model_type=LTXModelType.VideoOnly,
            num_attention_heads=32,
            attention_head_dim=128,
            in_channels=128,
            out_channels=128,
            num_layers=48,
            cross_attention_dim=4096,
            caption_channels=3840,
            rope_type=LTXRopeType.SPLIT,
        )
        f, h, w = 9, 24, 24  # config-3 dev geometry: 5184 tokens

    dev = jax.devices()[0]
    print(f"dial_sweep device: {dev} tokens={f*h*w} steps={steps}", file=sys.stderr)

    params = synth_q4_params(config)
    if not tiny:
        from mlx_video_tpu.ops.quant import prepare_w4a8

        params = prepare_w4a8(params, bits=4)
    jax.block_until_ready(params)

    b = 1
    latents = jax.random.normal(
        jax.random.key(1), (b, config.in_channels, f, h, w), dtype=jnp.bfloat16
    )
    positions = jnp.asarray(create_position_grid(b, f, h, w))
    context = jax.random.normal(
        jax.random.key(2), (b, 128, config.caption_channels), dtype=jnp.bfloat16
    )
    neg_context = jax.random.normal(
        jax.random.key(3), (b, 128, config.caption_channels), dtype=jnp.bfloat16
    )
    sched = [float(s) for s in ltx2_scheduler(steps=steps, num_tokens=f * h * w)]
    n_steps = len(sched) - 1

    if not tiny and "--no-relayout" not in sys.argv:
        # Production layout placement (generate.py's layout_opt): without it
        # XLA carries ~3 GB of in-program relayout copies of the w4a8
        # stacks, and the PAB setting's attention cache (+~4 GiB at this
        # geometry) pushed the compile to 18.09/15.75 GiB — OOM. Formats
        # come from the disk cache when warm (utils/layouts.py).
        from mlx_video_tpu.pipelines.denoise import preferred_param_formats, relayout_params
        from mlx_video_tpu.utils.device import drain_device_queue

        t0 = time.time()
        fmts = preferred_param_formats(
            params, config, latents, positions, context,
            neg_context=neg_context, cfg_scale=4.5,
        )
        params = relayout_params(params, fmts, donate=True, fence_bytes=1 << 30)
        drain_device_queue()
        print(f"layout placement {time.time() - t0:.1f}s", file=sys.stderr)

    # Honest device sync through the tunnel: fetch a scalar reduction.
    sum_jit = jax.jit(lambda v: jnp.sum(v.astype(jnp.float32)))

    def run(tc=0.0, cfgc=1, pab=1):
        v, _ = dn.denoise(
            params, config, latents, positions, context, sched,
            neg_context=neg_context, cfg_scale=4.5,
            teacache_threshold=tc,
            cfg_cache_interval=cfgc,
            attn_broadcast_interval=pab,
        )
        return v

    settings = [
        ("off", {}),
        ("teacache=0.05", {"tc": 0.05}),
        ("teacache=0.1", {"tc": 0.1}),
        ("teacache=0.2", {"tc": 0.2}),
        ("cfg_cache=2", {"cfgc": 2}),
        ("cfg_cache=4", {"cfgc": 4}),
        ("pab=2", {"pab": 2}),
        ("pab=3", {"pab": 3}),
    ]
    if "--only" in sys.argv:
        names = sys.argv[sys.argv.index("--only") + 1].split(",")
        keep = [s for s in settings if s[0] in names or s[0] == "off"]
        settings = keep

    ref_host = None
    ref_norm = None
    base_t = None
    rows = []
    for name, kw in settings:
        t0 = time.time()
        v = run(**kw)
        s0 = float(sum_jit(v))
        print(f"{name}: compile+first {time.time() - t0:.1f}s sum={s0:.3f}",
              file=sys.stderr)
        assert np.isfinite(s0), f"non-finite output for {name}"
        ts = []
        for _ in range(reps):
            t0 = time.time()
            float(sum_jit(run(**kw)))
            ts.append(time.time() - t0)
        wall = float(np.median(ts))
        host = np.asarray(v, dtype=np.float32)
        if name == "off":
            ref_host = host
            ref_norm = float(np.linalg.norm(ref_host)) or 1.0
            base_t = wall
            rel = 0.0
        else:
            rel = float(np.linalg.norm(host - ref_host)) / ref_norm
        row = {
            "setting": name,
            "steps_per_sec": round(n_steps / wall, 3),
            "wall_s": round(wall, 2),
            "speedup": round(base_t / wall, 3),
            "rel_err": round(rel, 5),
            # PSNR-style signal-to-drift: 20*log10(||v0|| / ||v - v0||),
            # comparable to the composed-pipeline PSNR gates (35 dB bar).
            "drift_db": round(-20.0 * float(np.log10(rel)), 1) if rel > 0 else float("inf"),
        }
        rows.append(row)
        print(json.dumps(row))

    print("\n| dial | steps/s | x vs off | rel-err | drift dB |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['setting']} | {r['steps_per_sec']} | {r['speedup']:.2f}x "
              f"| {r['rel_err']:.4f} | {r['drift_db']} |")


if __name__ == "__main__":
    main()
