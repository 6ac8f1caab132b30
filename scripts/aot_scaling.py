"""AOT per-device HBM scaling study at the flagship video-tower geometry.

Lowers the FULL train step (13.0B params — the 19B AV flagship minus its
audio branch, since the fused T2V train_step is video-only; fwd + bwd +
AdamW, block remat) and the matching inference forward over virtual CPU
meshes of 8/16/32 devices in several
(data, fsdp, tensor) splits, and prints XLA's per-device memory analysis —
the multi-chip memory plan for v5e-8 / v5p-8 / v5p-16 / v5p-32 slices,
validated end-to-end without weights (no arrays materialize).

No TPU or multi-chip hardware required: GSPMD partitioning is platform-
agnostic, so per-device argument/temp sizes computed on the virtual CPU
mesh are the ones a real slice would see (compute speed is not modeled).

Usage:
    python scripts/aot_scaling.py [--devices 8,16,32] [--train-only|--infer-only]
Each mesh runs in-process; the device count is forced before jax init.
"""

import argparse
import os
import sys
import time

_ap = argparse.ArgumentParser()
_ap.add_argument("--devices", default="8,16,32")
_ap.add_argument("--train-only", action="store_true")
_ap.add_argument("--infer-only", action="store_true")
_ap.add_argument("--tiny", action="store_true", help="smoke mode: tiny config")
_ap.add_argument("--cpu", action="store_true", help="no-op (always CPU-virtual)")
_ap.add_argument("--av", action="store_true", help="also lower the 18.9B AudioVideo training path")
args = _ap.parse_args()

_max_dev = max(int(x) for x in args.devices.split(","))
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={_max_dev}"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import dataclasses  # noqa: E402

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mlx_video_tpu.config import (  # noqa: E402
    LTXModelConfig,
    LTXModelType,
    LTXRopeType,
    tiny_test_config,
)
from mlx_video_tpu.models.ltx.model import Modality, init_ltx_params, ltx_apply  # noqa: E402
from mlx_video_tpu.parallel import sharding as sh  # noqa: E402
from mlx_video_tpu.parallel.mesh import create_mesh  # noqa: E402
from mlx_video_tpu.trainer.train_step import TrainBatch, make_optimizer, train_step  # noqa: E402

# Mesh splits per device count: (data, fsdp, tensor). FSDP-heavy splits
# minimize param/opt memory; tensor-heavy splits minimize activation
# serialization (and per-step latency). Both ends plus a balanced middle.
SPLITS = {
    8: [(1, 8, 1), (1, 4, 2), (1, 2, 4), (1, 1, 8)],
    16: [(1, 16, 1), (1, 8, 2), (2, 4, 2), (1, 4, 4)],
    32: [(1, 32, 1), (2, 8, 2), (2, 4, 4), (4, 4, 2)],
}


def flagship_config():
    if args.tiny:
        return dataclasses.replace(
            tiny_test_config(LTXModelType.VideoOnly), gradient_checkpointing=True
        )
    return dataclasses.replace(
        LTXModelConfig(model_type=LTXModelType.VideoOnly, rope_type=LTXRopeType.SPLIT),
        gradient_checkpointing=True,
    )


def struct_tree(shapes, specs, mesh):
    return jax.tree.map(
        lambda l, s: jax.ShapeDtypeStruct(l.shape, l.dtype, sharding=NamedSharding(mesh, s)),
        shapes,
        specs,
    )


def mem_row(compiled):
    mem = compiled.memory_analysis()
    if mem is None:
        return None
    a = mem.argument_size_in_bytes / 2**30
    t = mem.temp_size_in_bytes / 2**30
    return a, t, a + t


def batch_structs(config, mesh, b):
    c = 128 if not args.tiny else config.in_channels
    f, h, w = (1, 4, 4) if args.tiny else (5, 16, 16)
    ctx = (
        (b, 1024, 3840) if not args.tiny else (b, 8, config.caption_channels)
    )
    dspec = lambda nd: sh.data_spec(nd)
    mk = lambda shape, dt, spec: jax.ShapeDtypeStruct(
        shape, dt, sharding=NamedSharding(mesh, spec)
    )
    return TrainBatch(
        latents=mk((b, c, f, h, w), jnp.bfloat16, dspec(5)),
        context=mk(ctx, jnp.bfloat16, dspec(3)),
        positions=mk((b, 3, f * h * w, 2), jnp.float32, dspec(4)),
    ), (f, h, w)


def run_train(config, mesh, n, split):
    params_shapes = jax.eval_shape(
        lambda: init_ltx_params(jax.random.key(0), config, dtype=jnp.bfloat16)
    )
    p_structs = struct_tree(params_shapes, sh.param_specs(params_shapes), mesh)
    opt = make_optimizer(1e-5)
    opt_shapes = jax.eval_shape(opt.init, params_shapes)
    o_structs = struct_tree(opt_shapes, sh.opt_state_specs(opt_shapes), mesh)
    batch, _ = batch_structs(config, mesh, b=max(1, split[0]))
    ks = jax.eval_shape(lambda: jax.random.key(0))
    key = jax.ShapeDtypeStruct(ks.shape, ks.dtype, sharding=NamedSharding(mesh, P()))
    t0 = time.time()
    with mesh:
        compiled = train_step.lower(p_structs, o_structs, config, opt, batch, key).compile()
    dt = time.time() - t0
    row = mem_row(compiled)
    if row:
        print(
            f"train  n={n:3d} mesh={split}  args {row[0]:6.2f}  temps {row[1]:6.2f}  "
            f"total {row[2]:6.2f} GiB/device   (compile {dt:.0f}s)",
            flush=True,
        )


def run_train_av(mesh, n, split):
    """Full 18.9B AudioVideo TRAINING memory: grad_step (fwd+bwd over both
    modalities, block remat) and apply_updates (AdamW), lowered separately —
    the trainer runs them as two jits; grad_step holds the activation peak."""
    from mlx_video_tpu.trainer.strategies import StrategyBatch
    from mlx_video_tpu.trainer.train_step import apply_updates, grad_step

    config = dataclasses.replace(
        LTXModelConfig(model_type=LTXModelType.AudioVideo, rope_type=LTXRopeType.SPLIT),
        gradient_checkpointing=True,
    )
    params_shapes = jax.eval_shape(
        lambda: init_ltx_params(jax.random.key(0), config, dtype=jnp.bfloat16)
    )
    p_structs = struct_tree(params_shapes, sh.param_specs(params_shapes), mesh)
    b = max(1, split[0])
    f, h, w, at = 5, 16, 16, 34
    s = f * h * w
    dspec = lambda nd: NamedSharding(mesh, sh.data_spec(nd))
    mk = lambda shape, dt, nd=None: jax.ShapeDtypeStruct(
        shape, dt, sharding=dspec(nd if nd is not None else len(shape))
    )
    sb = StrategyBatch(
        video_latents=mk((b, s, 128), jnp.bfloat16),
        positions=mk((b, 3, s, 2), jnp.float32),
        context=mk((b, 1024, 3840), jnp.bfloat16),
        context_mask=None,
        first_frame_token_mask=mk((b, s), jnp.bool_),
        always_conditioned_mask=mk((b, s), jnp.bool_),
        audio_latents=mk((b, at, 128), jnp.bfloat16),
        audio_positions=mk((b, 1, at, 2), jnp.float32),
        audio_context=mk((b, 1024, 3840), jnp.bfloat16),
    )
    ks = jax.eval_shape(lambda: jax.random.key(0))
    key = jax.ShapeDtypeStruct(ks.shape, ks.dtype, sharding=NamedSharding(mesh, P()))
    t0 = time.time()
    with mesh:
        g_compiled = grad_step.lower(p_structs, sb, key, config).compile()
    g_dt = time.time() - t0
    g_row = mem_row(g_compiled)

    opt = make_optimizer(1e-5)
    opt_shapes = jax.eval_shape(opt.init, params_shapes)
    o_structs = struct_tree(opt_shapes, sh.opt_state_specs(opt_shapes), mesh)
    t0 = time.time()
    with mesh:
        a_compiled = apply_updates.lower(
            p_structs, o_structs, p_structs, opt, 1
        ).compile()
    a_dt = time.time() - t0
    a_row = mem_row(a_compiled)
    if g_row and a_row:
        print(
            f"trainAV n={n:3d} mesh={split}  grad {g_row[2]:6.2f}  "
            f"update {a_row[2]:6.2f} GiB/device   (compile {g_dt:.0f}s+{a_dt:.0f}s)",
            flush=True,
        )


def run_infer(config, mesh, n, split):
    params_shapes = jax.eval_shape(
        lambda: init_ltx_params(jax.random.key(0), config, dtype=jnp.bfloat16)
    )
    p_structs = struct_tree(params_shapes, sh.param_specs(params_shapes), mesh)
    b = max(1, split[0])
    c = 128 if not args.tiny else config.in_channels
    f, h, w = (8, 16, 16) if not args.tiny else (1, 4, 4)
    s = f * h * w
    ctx = (b, 1024, 3840) if not args.tiny else (b, 8, config.caption_channels)
    dspec = lambda nd: NamedSharding(mesh, sh.data_spec(nd))
    video = Modality(
        latent=jax.ShapeDtypeStruct((b, s, c), jnp.bfloat16, sharding=dspec(3)),
        timesteps=jax.ShapeDtypeStruct((b, s), jnp.bfloat16, sharding=dspec(2)),
        context=jax.ShapeDtypeStruct(ctx, jnp.bfloat16, sharding=dspec(3)),
        positions=jax.ShapeDtypeStruct((b, 3, s, 2), jnp.float32, sharding=dspec(4)),
    )
    t0 = time.time()
    with mesh:
        compiled = (
            jax.jit(lambda p, v: ltx_apply(p, config, video=v))
            .lower(p_structs, video)
            .compile()
        )
    dt = time.time() - t0
    row = mem_row(compiled)
    if row:
        print(
            f"infer  n={n:3d} mesh={split}  args {row[0]:6.2f}  temps {row[1]:6.2f}  "
            f"total {row[2]:6.2f} GiB/device   (compile {dt:.0f}s)",
            flush=True,
        )


def main():
    config = flagship_config()
    n_params = sum(
        int(np.prod(l.shape))
        for l in jax.tree.leaves(
            jax.eval_shape(lambda: init_ltx_params(jax.random.key(0), config, dtype=jnp.bfloat16))
        )
    )
    print(f"model: {n_params/1e9:.2f}B params bf16", flush=True)
    # Tiny smoke: the tiny config's dims don't divide >8-way fsdp axes.
    counts = [8] if args.tiny else [int(x) for x in args.devices.split(",")]
    for n in counts:
        splits = SPLITS.get(n, [(1, n, 1)])
        if args.tiny:
            splits = splits[:1]
        for split in splits:
            mesh = create_mesh(split, devices=jax.devices()[:n])
            if not args.infer_only:
                run_train(config, mesh, n, split)
                if args.av and not args.tiny:
                    run_train_av(mesh, n, split)
            if not args.train_only:
                run_infer(config, mesh, n, split)
    print('{"metric": "aot_scaling_table", "value": 1, "unit": "see rows above"}')


if __name__ == "__main__":
    main()
