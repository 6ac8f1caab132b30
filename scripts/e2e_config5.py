"""BASELINE config 5: LoRA finetune (text_to_video / video_to_video) on
precomputed latents with resolution buckets, on ONE chip.

Synthesizes a precomputed dataset in the trainer's on-disk layout
(latents/ + conditions/ [+ reference_latents/]) across TWO resolution
buckets, then times LoRA training steps of the 19B-geometry transformer
with a frozen W4A8 base (q4 storage synthesized by bench.synth_q4_params
— random weights in the real quantized layout; step time depends on
shapes/dtypes only) and gradient checkpointing (remat) through the
48-layer scan.

Buckets (latent shapes after 32x spatial / 8x temporal VAE compression):
  A: 256x256x33f -> (128, 5, 8, 8)   = 320 tokens
  B: 512x512x33f -> (128, 5, 16, 16) = 1280 tokens

Legs: text_to_video over both buckets; video_to_video (IC-LoRA) over
bucket A (reference latents prepend on the token axis -> 640 tokens).

Per-step wall time is measured with an honest device sync (float(loss));
the first step per latent shape carries that shape's compile and is
reported separately from the warm median.

    python scripts/e2e_config5.py            # full, on the TPU
    python scripts/e2e_config5.py --tiny --cpu   # plumbing smoke

Prints one JSON line per leg.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_dataset(root, buckets, caption_channels, with_reference, n_per_bucket=3):
    """Write per-clip safetensors in the precompute tool's exact layout
    (trainer/precompute.py:132-179): latents/latent_<stem>.safetensors with
    latents+num_frames/height/width/fps, conditions/condition_<stem> with
    prompt embeds, reference_latents/latent_<stem> for V2V."""
    import numpy as np

    from mlx_video_tpu.io.safetensors import save_safetensors

    shutil.rmtree(root, ignore_errors=True)
    for d in ("latents", "conditions") + (("reference_latents",) if with_reference else ()):
        os.makedirs(os.path.join(root, d), exist_ok=True)
    rng = np.random.default_rng(0)
    for bi, (c, f, h, w) in enumerate(buckets):
        for i in range(n_per_bucket):
            stem = f"clip_b{bi}_{i}"
            lat = {
                "latents": rng.normal(size=(c, f, h, w)).astype(np.float32),
                "num_frames": np.array([f], np.int32),
                "height": np.array([h], np.int32),
                "width": np.array([w], np.int32),
                "fps": np.array([24.0], np.float32),
            }
            save_safetensors(
                os.path.join(root, "latents", f"latent_{stem}.safetensors"), lat
            )
            save_safetensors(
                os.path.join(root, "conditions", f"condition_{stem}.safetensors"),
                {
                    "video_prompt_embeds": rng.normal(size=(128, caption_channels)).astype(
                        np.float32
                    )
                },
            )
            if with_reference:
                save_safetensors(
                    os.path.join(root, "reference_latents", f"latent_{stem}.safetensors"),
                    dict(lat, latents=rng.normal(size=(c, f, h, w)).astype(np.float32)),
                )


def _hbm_report(tag: str, probe: bool = False) -> None:
    """Visibility on axon, where device.memory_stats() returns None: report
    the Python-visible device-resident bytes (live jax arrays), and — when
    ``probe`` — a LOWER BOUND on free HBM by allocating 512 MiB chunks up to
    a conservative target (total HBM - live arrays - 2 GiB safety margin),
    never to exhaustion: utils/device.py documents that one
    RESOURCE_EXHAUSTED is STICKY on this backend, so a probe that runs into
    the wall would poison the very run it instruments. The probed bound
    still separates "live buffers" from invisible residency (loaded
    executables, allocator reservations): if the probe reaches its target,
    invisible residency is below the margin; if an earlier documented-risk
    window is suspected, read the shortfall off the report."""
    import jax
    import jax.numpy as jnp

    from mlx_video_tpu.utils.device import drain_device_queue

    live = sum(
        getattr(a, "nbytes", 0)
        for a in jax.live_arrays()
        if "cpu" not in str(getattr(a, "device", ""))
    )
    msg = f"[hbm] {tag}: live arrays {live / 2**30:.2f} GiB"
    if probe:
        total = 16 * 2**30  # v5e HBM; probe is a diagnostics aid, not a gate
        margin = 2 * 2**30
        target_chunks = max(0, int((total - live - margin) // (512 * 2**20)))
        chunks = []
        for _ in range(target_chunks):
            c = jnp.ones((512 * 2**20 // 4,), jnp.float32)
            c.block_until_ready()
            float(c[0])
            chunks.append(c)
        free = len(chunks) * 0.5
        for c in chunks:
            c.delete()
        del chunks
        # enqueue-vs-free race (utils/device.py): retire the pending frees
        # before the caller's next allocation burst.
        drain_device_queue()
        msg += (
            f", free (probed) >= {free:.1f} GiB"
            f" (capped {margin / 2**30:.1f} GiB short of exhaustion)"
        )
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    from bench import synth_q4_params
    from mlx_video_tpu.config import LTXModelConfig, LTXModelType, LTXRopeType, tiny_test_config
    from mlx_video_tpu.trainer.config import TrainingConfig
    from mlx_video_tpu.lora import lora_mask
    from mlx_video_tpu.trainer.datasets import iter_batches
    from mlx_video_tpu.trainer.train_step import (
        apply_updates_trainable,
        grad_step_trainable,
        make_optimizer,
        partition_trainable,
        preferred_trainable_formats,
    )
    from mlx_video_tpu.trainer.trainer import Trainer

    tiny = "--tiny" in sys.argv
    t0 = time.time()
    if tiny:
        config = tiny_test_config(LTXModelType.VideoOnly)
        buckets = [(config.in_channels, 2, 2, 2), (config.in_channels, 2, 4, 2)]
    else:
        config = LTXModelConfig(
            model_type=LTXModelType.VideoOnly,
            num_attention_heads=32, attention_head_dim=128,
            in_channels=128, out_channels=128, num_layers=48,
            cross_attention_dim=4096, caption_channels=3840,
            rope_type=LTXRopeType.SPLIT,
        )
        buckets = [(128, 5, 8, 8), (128, 5, 16, 16)]  # 256^2 and 512^2 x33f

    def make_base():
        """Fresh base per leg: the partition below takes ownership of the
        frozen leaves (donated relayout deletes the originals), so a shared
        cross-leg base would keep a dead 8 GB twin resident."""
        if tiny:
            from mlx_video_tpu.models.ltx.model import init_ltx_params
            from mlx_video_tpu.ops.quant import quantize_dit_params

            return quantize_dit_params(
                init_ltx_params(jax.random.key(0), config, dtype=jnp.bfloat16),
                group_size=16,
            )
        from mlx_video_tpu.ops.quant import prepare_w4a8

        return prepare_w4a8(synth_q4_params(config), bits=4)

    print(f"setup {time.time() - t0:.1f}s", file=sys.stderr)

    steps_per_shape = 3 if tiny else 5
    for leg, strategy, leg_buckets in (
        ("t2v", "text_to_video", buckets),
        ("v2v", "video_to_video", buckets[:1]),
    ):
        root = f"/tmp/e2e_c5/{leg}"
        synth_dataset(
            root, leg_buckets, config.caption_channels,
            with_reference=strategy == "video_to_video",
        )
        cfg = TrainingConfig(
            model_repo="", training_mode="lora", strategy=strategy,
            lora_rank=8 if tiny else 64, lora_alpha=16.0,
            data_root=root, batch_size=1,
            steps=steps_per_shape * len(leg_buckets) * 2,
            lr=1e-4, seed=0, log_every=10_000, progress=False,
            output_dir=f"/tmp/e2e_c5/ckpt_{leg}", save_every=0,
            enable_gradient_checkpointing=not tiny,
            handle_preemption=False,
        )
        # dataset=None: the Trainer builds the PrecomputedDataset from
        # cfg.data_root/strategy exactly as a user run would.
        base = make_base()
        tr = Trainer(cfg, model_config=config, params=base, dataset=None)
        # Partitioned LoRA training (train_step.py): AD only ever builds
        # cotangents for the LoRA factors — with full-tree grad_step the
        # frozen float leaves (scales/biases/norms) cost a measured 4.52 GB
        # of dense zero-use gradient outputs at 19B (r3 chip probe), leaving
        # 60 MB of headroom; partitioned, the step fits comfortably.
        train, frozen = partition_trainable(tr.params, lora_mask(tr.params))
        tr.params = None
        tr.opt_state = None
        base = None  # noqa: F841 — frozen/train now own the leaves
        import gc

        gc.collect()
        # Drain the pending frees (opt_state moments, any injection
        # transients) before the next allocation burst: allocations happen
        # at enqueue while frees retire only as the queue drains, and an
        # OOM from that race is STICKY on this backend (utils/device.py).
        from mlx_video_tpu.utils.device import drain_device_queue

        drain_device_queue()
        # bf16 first moment: 0.45 GiB at r64 — the margin between the fused
        # 19B step compiling at 15.41 vs OOMing at 15.86/15.75 GiB.
        opt = make_optimizer(cfg.lr, mu_dtype=None if tiny else jnp.bfloat16)
        # Layout-stable train cycle (train_step.build_layout_stable_trainable):
        # relayouting only the frozen subtree still left 5.1 GiB of HLO temp
        # relayout copies inside grad_step (AUTO wants non-default layouts
        # for the LoRA factor stacks too) — live 10.7 + temps 5.1 + grads
        # 1.2 > 15.75 GiB was the fourth r4 OOM. The builder discovers
        # formats for train+frozen+grads+moments at BOTH bucket geometries,
        # pins jit in/out formats so updated leaves come back in the same
        # layouts (full donation aliasing), and the one-time placement below
        # is the only relayout that ever runs.
        use_layout_stable = "--no-relayout" not in sys.argv
        if use_layout_stable:
            from mlx_video_tpu.pipelines.denoise import relayout_params
            from mlx_video_tpu.trainer.train_step import build_fused_layout_stable

            # one prepared batch per distinct batch-leaf geometry, keyed
            # exactly as FusedLayoutStableStep.step dispatches (every leaf's
            # shape/dtype, not just video_latents — a context-length or mask
            # difference at equal latent shape would otherwise KeyError
            # mid-run); largest token count first (defines param layouts)
            from mlx_video_tpu.trainer.train_step import _sb_shape_key

            sb_by_shape: dict = {}
            for fb in iter_batches(tr.dataset, 1, shuffle=False, seed=0):
                sbx = tr._prepare(fb)
                sb_by_shape.setdefault(_sb_shape_key(sbx), sbx)
            abs_sbs = sorted(
                sb_by_shape.values(),
                key=lambda sbx: -sbx.video_latents.shape[1],
            )
            probe = os.environ.get("MLX_VIDEO_HBM_PROBE") == "1"
            _hbm_report("before layout discovery", probe=probe)
            t_fmt = time.time()
            step_fns = build_fused_layout_stable(
                opt, tr.model_config, train, frozen, abs_sbs,
                first_frame_conditioning_p=cfg.first_frame_conditioning_p,
            )
            print(f"layout-stable build {time.time() - t_fmt:.1f}s", file=sys.stderr)
            _hbm_report("after layout-stable build", probe=probe)
            t_fmt = time.time()
            train = relayout_params(train, step_fns.train_formats, donate=True)
            frozen = relayout_params(
                frozen, step_fns.frozen_formats, donate=True, fence_bytes=1 << 30
            )
            drain_device_queue()
            print(f"param placement {time.time() - t_fmt:.1f}s", file=sys.stderr)
            _hbm_report("after placement", probe=probe)
        # Moments AFTER the placement (their ~2x-train footprint would eat
        # the relayout's transient headroom), then placed into the formats
        # the pinned apply executable expects.
        ost = opt.init(train)
        if use_layout_stable:
            ost = relayout_params(ost, step_fns.ost_formats, donate=True)
        drain_device_queue()
        if not tiny:
            _hbm_report("after opt.init")
        key = jax.random.key(0)
        times: dict = {}
        step = 0
        epoch = 0
        while step < cfg.steps:
            for batch in iter_batches(tr.dataset, 1, shuffle=True, seed=epoch):
                if step >= cfg.steps:
                    break
                ts = time.time()
                sb = tr._prepare(batch)
                key, sub = jax.random.split(key)
                if use_layout_stable:
                    loss, train, ost = step_fns.step(train, frozen, ost, sb, sub)
                else:
                    loss, grads = grad_step_trainable(
                        train, frozen, sb, sub, tr.model_config,
                        first_frame_conditioning_p=cfg.first_frame_conditioning_p,
                    )
                    train, ost = apply_updates_trainable(
                        train, ost, grads, optimizer=opt, accum_steps=1
                    )
                lv = float(loss)  # honest sync
                assert np.isfinite(lv), f"non-finite loss at step {step}"
                shape = tuple(np.asarray(sb.video_latents).shape)
                times.setdefault(shape, []).append(time.time() - ts)
                step += 1
            epoch += 1

        report = {}
        for shape, ts_list in times.items():
            warm = ts_list[1:] or ts_list
            report[str(shape)] = {
                "first_s": round(ts_list[0], 2),
                "warm_median_s": round(float(np.median(warm)), 3),
                "warm_steps_per_sec": round(1.0 / float(np.median(warm)), 3),
                "n": len(ts_list),
            }
        print(json.dumps({
            "metric": f"config5_lora_{leg}_train_step",
            "mode": "tiny" if tiny else "19b-w4a8 base, lora r64, remat, 1 chip",
            "per_shape": report,
        }))
        del tr, train, frozen, ost


if __name__ == "__main__":
    main()
