"""GPipe pipeline parallelism for the DiT block stack.

New capability vs the single-device reference (SURVEY §2.12 — the MLX
reference has no distributed execution of any kind, reference:
ltx_trainer/docs/mlx_limitations.md:7-10): the 48 scan-stacked transformer
blocks are split into P contiguous stages, one stage per device along a
``pipe`` mesh axis; M microbatches stream through the stages and
activations hop stage->stage with ``lax.ppermute``. TPU-native by
construction:

- The schedule is one ``lax.scan`` over M+P-1 ticks inside one jit — XLA
  overlaps each tick's ppermute (ICI/DCN transfer) with the next tick's
  block compute, and the whole pipeline compiles once.
- Stage-local weights are simply the layer-axis shards of the stacked
  block pytree (``params["blocks"]``) — the same tensors the
  single-device ``lax.scan`` consumes; no re-layout. Quantized leaves
  (q4 ``quant_weight``/W8A8 ``int8_weight``) shard the same way since
  stacking is always the leading axis.
- Differentiable end-to-end: reverse-mode AD transposes the forward
  ``ppermute`` ring into the backward ring, giving GPipe-style pipelined
  training without a hand-written backward schedule. ``check_rep=False``
  makes the transpose insert conservative psums for axes an input does
  not mention — exactly the data-parallel gradient reduction when a
  ``data_axis`` shards the microbatch dimension.
- Bubble fraction is (P-1)/(M+P-1): choose M >= P (default M = P); larger
  M where the batch allows (training). B == 1 inference degenerates to a
  sequential stage pass (M = 1) — still correct, but pipeline parallelism
  is a *training/serving-batch* scale-out tool; for latency-bound B == 1
  inference prefer TP (parallel/sharding.py).

Placement guidance: PP targets cross-slice (DCN) scale-out where tensor
parallelism's per-layer collectives are too latency-bound; within one ICI
pod prefer TP/FSDP. Expert parallelism is deliberately absent: LTX-2 is a
dense model (no MoE layer anywhere in the reference), so there is no
``expert`` mesh axis to build.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

shard_map = jax.shard_map

from mlx_video_tpu.config import LTXModelConfig
from mlx_video_tpu.models.ltx.model import (
    Modality,
    _process_output,
    block_apply,
    prepare_ltx_args,
)


def pipeline_mesh(
    num_stages: int,
    data: int = 1,
    tensor: int = 1,
    fsdp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """A ``(data, pipe[, fsdp, tensor])`` mesh.

    ``tensor``/``fsdp`` > 1 compose megatron TP / FSDP *inside* each
    pipeline stage: the stage loop runs ``shard_map``-manual over
    ``data``/``pipe`` only, leaving ``fsdp``/``tensor`` as GSPMD auto axes
    whose collectives XLA inserts from the within-block weight shardings
    (the scaling-book layout: TP on the innermost/ICI axis, PP across the
    outer/DCN axis)."""
    if devices is None:
        devices = jax.devices()
    n = data * num_stages * tensor * fsdp
    if len(devices) < n:
        raise ValueError(
            f"need {n} devices for (data={data}, pipe={num_stages},"
            f" fsdp={fsdp}, tensor={tensor}), have {len(devices)}"
        )
    if tensor == 1 and fsdp == 1:
        return Mesh(np.asarray(devices[:n]).reshape(data, num_stages), ("data", "pipe"))
    return Mesh(
        np.asarray(devices[:n]).reshape(data, num_stages, fsdp, tensor),
        ("data", "pipe", "fsdp", "tensor"),
    )


def shard_params_pipeline(params: dict, mesh: Mesh, axis: str = "pipe") -> dict:
    """Place the stacked block pytree layer-sharded over ``axis`` (stage-
    contiguous chunks of the layer axis). With ``fsdp``/``tensor`` axes of
    size > 1 on the mesh, block leaves additionally carry the megatron
    TP/FSDP within-matrix specs (sharding.param_specs) and non-block params
    shard by the same rules; otherwise non-blocks replicate."""
    tp = any(int(mesh.shape.get(a, 1)) > 1 for a in ("fsdp", "tensor"))
    if tp:
        from mlx_video_tpu.parallel.sharding import param_specs

        specs = param_specs(params)
        out = {
            k: jax.tree.map(
                lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), v, specs[k]
            )
            for k, v in params.items()
            if k != "blocks"
        }
        # stacked leaves: swap the leading (layer-axis) None for the pipe axis
        out["blocks"] = jax.tree.map(
            lambda x, s: jax.device_put(
                x, NamedSharding(mesh, P(*((axis,) + tuple(s)[1:])))
            ),
            params["blocks"],
            specs["blocks"],
        )
        return out
    repl = NamedSharding(mesh, P())
    blk = NamedSharding(mesh, P(axis))
    out = {
        k: jax.tree.map(lambda x: jax.device_put(x, repl), v)
        for k, v in params.items()
        if k != "blocks"
    }
    out["blocks"] = jax.tree.map(lambda x: jax.device_put(x, blk), params["blocks"])
    return out


def pipeline_ltx_apply(
    params: dict,
    config: LTXModelConfig,
    video: Optional[Modality] = None,
    audio: Optional[Modality] = None,
    *,
    mesh: Mesh,
    axis: str = "pipe",
    num_microbatches: Optional[int] = None,
    data_axis: Optional[str] = None,
) -> Tuple[Optional[jax.Array], Optional[jax.Array]]:
    """DiT forward with the block stack pipeline-parallel over ``axis``.

    Numerically equivalent to ``ltx_apply`` (verified by tests on a virtual
    CPU mesh); pre-block prep and the output head run replicated under
    GSPMD outside the stage loop. ``data_axis`` additionally shards the
    per-microbatch batch dimension (DP x PP).
    """
    video_args, audio_args = prepare_ltx_args(params, config, video, audio)
    video_cfg = config.get_video_config() if video is not None else None
    audio_cfg = config.get_audio_config() if audio is not None else None
    has_v = video_args is not None
    has_a = audio_args is not None

    p_size = int(mesh.shape[axis])
    m = int(num_microbatches) if num_microbatches else p_size
    blocks = params["blocks"]
    n_layers = jax.tree.leaves(blocks)[0].shape[0]
    if n_layers % p_size != 0:
        raise ValueError(f"num_layers={n_layers} not divisible by pipe={p_size}")
    ref_args = video_args if has_v else audio_args
    b = ref_args.x.shape[0]
    if b % m != 0:
        raise ValueError(f"batch={b} not divisible by num_microbatches={m}")
    mb = b // m
    if data_axis is not None and mb % int(mesh.shape[data_axis]) != 0:
        raise ValueError(
            f"microbatch size {mb} not divisible by {data_axis}={mesh.shape[data_axis]}"
        )

    def _tile(tree):
        # (B, ...) -> (P, M, mb, ...): microbatch split + a broadcast leading
        # stage dim. Mentioning the pipe axis on EVERY input keeps reverse-mode
        # transposes exact (broadcast_to transposes to the sum over stages).
        return jax.tree.map(
            lambda a: jnp.broadcast_to(
                a.reshape((1, m, mb) + a.shape[1:]), (p_size, m, mb) + a.shape[1:]
            ),
            tree,
        )

    dummy = jnp.zeros((p_size, 1), dtype=ref_args.x.dtype)
    v_in = _tile(video_args) if has_v else dummy
    a_in = _tile(audio_args) if has_a else dummy
    io_spec = P(axis, None, data_axis) if data_axis else P(axis)
    v_spec = io_spec if has_v else P(axis)
    a_spec = io_spec if has_a else P(axis)
    perm = [(p, (p + 1) % p_size) for p in range(p_size)]

    def run(blocks_loc, v_tl, a_tl):
        i = jax.lax.axis_index(axis)
        v_loc = jax.tree.map(lambda x: x[0], v_tl) if has_v else None  # (M, mb, ...)
        a_loc = jax.tree.map(lambda x: x[0], a_tl) if has_a else None

        def local_stack(vx, ax, mb_idx):
            take = lambda t: jax.tree.map(
                lambda x: jax.lax.dynamic_index_in_dim(x, mb_idx, 0, keepdims=False), t
            )
            vc = take(v_loc) if has_v else None
            ac = take(a_loc) if has_a else None

            def body(carry, bparams):
                cvx, cax = carry
                v_blk = vc._replace(x=cvx) if has_v else None
                a_blk = ac._replace(x=cax) if has_a else None
                vo, ao = block_apply(
                    bparams, v_blk, a_blk, video_cfg, audio_cfg,
                    config.rope_type, config.norm_eps,
                )
                return ((vo if vo is not None else cvx), (ao if ao is not None else cax)), None

            body_fn = jax.checkpoint(body) if config.gradient_checkpointing else body
            (vx, ax), _ = jax.lax.scan(body_fn, (vx, ax), blocks_loc)
            return vx, ax

        x_v = v_loc.x if has_v else jnp.zeros((m, 1, 1, 1), dtype=dummy.dtype)
        x_a = a_loc.x if has_a else jnp.zeros((m, 1, 1, 1), dtype=dummy.dtype)
        init = (jnp.zeros_like(x_v[0]), jnp.zeros_like(x_a[0]),
                jnp.zeros_like(x_v), jnp.zeros_like(x_a))

        def tick(carry, t):
            state_v, state_a, out_v, out_a = carry
            # Stage i works on microbatch t - i this tick (garbage outside
            # [0, M) during fill/drain — computed and discarded, the GPipe
            # bubble). Stage 0 ingests microbatch t; the last stage emits
            # microbatch t - (P-1).
            mb_cur = jnp.clip(t - i, 0, m - 1)
            in_idx = jnp.clip(t, 0, m - 1)
            if has_v:
                fresh = jax.lax.dynamic_index_in_dim(x_v, in_idx, 0, keepdims=False)
                state_v = jnp.where(i == 0, fresh, state_v)
            if has_a:
                fresh_a = jax.lax.dynamic_index_in_dim(x_a, in_idx, 0, keepdims=False)
                state_a = jnp.where(i == 0, fresh_a, state_a)
            y_v, y_a = local_stack(state_v, state_a, mb_cur)
            out_idx = jnp.clip(t - (p_size - 1), 0, m - 1)
            emit = jnp.logical_and(i == p_size - 1, t >= p_size - 1)
            if has_v:
                prev = jax.lax.dynamic_index_in_dim(out_v, out_idx, 0, keepdims=False)
                out_v = jax.lax.dynamic_update_index_in_dim(
                    out_v, jnp.where(emit, y_v, prev), out_idx, 0
                )
            if has_a:
                prev_a = jax.lax.dynamic_index_in_dim(out_a, out_idx, 0, keepdims=False)
                out_a = jax.lax.dynamic_update_index_in_dim(
                    out_a, jnp.where(emit, y_a, prev_a), out_idx, 0
                )
            state_v = jax.lax.ppermute(y_v, axis, perm) if has_v else state_v
            state_a = jax.lax.ppermute(y_a, axis, perm) if has_a else state_a
            return (state_v, state_a, out_v, out_a), None

        (_, _, out_v, out_a), _ = jax.lax.scan(
            tick, init, jnp.arange(m + p_size - 1, dtype=jnp.int32)
        )
        # Valid only on the last stage; expose the stage dim and let the
        # caller slice stage P-1 — transpose-safe output collection with no
        # collective (the slice's cotangent pads zeros for other stages).
        return out_v[None], out_a[None]

    # Manual only over pipe (+ data): any fsdp/tensor mesh axes stay GSPMD
    # "auto" — within-block matmuls keep their megatron shardings and XLA
    # inserts the TP collectives inside each stage (partial-manual
    # shard_map; the probe-verified TPxPP composition).
    manual = frozenset({axis} | ({data_axis} if data_axis else set()))
    out_v, out_a = shard_map(
        run,
        mesh=mesh,
        in_specs=(P(axis), v_spec, a_spec),
        out_specs=(v_spec, a_spec),
        axis_names=manual,
        check_vma=False,
    )(blocks, v_in, a_in)

    v_res = None
    if has_v:
        tokens = out_v[p_size - 1].reshape((b,) + out_v.shape[3:])
        v_res = _process_output(
            params["video"], tokens, video_args.embedded_timestep, config.norm_eps
        )
    a_res = None
    if has_a:
        tokens = out_a[p_size - 1].reshape((b,) + out_a.shape[3:])
        a_res = _process_output(
            params["audio"], tokens, audio_args.embedded_timestep, config.norm_eps
        )
    return v_res, a_res


def apply_from_tuple(pp):
    """Adapter for the ``pp = (mesh, axis, num_microbatches[, data_axis])``
    tuple threaded through denoise/grad_step static args: returns a function
    with the ``ltx_apply`` signature that runs the pipelined forward."""
    mesh, axis, num_mb = pp[0], pp[1], pp[2]
    data_axis = pp[3] if len(pp) > 3 else None

    def apply(params, config, video=None, audio=None, sp=None):
        return pipeline_ltx_apply(
            params, config, video=video, audio=audio,
            mesh=mesh, axis=axis, num_microbatches=num_mb, data_axis=data_axis,
        )

    return apply
