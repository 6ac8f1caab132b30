"""Jit-compiled training step and optimizer construction.

Behavioral spec: reference mlx_video/mlx_trainer/trainer.py:297-326
(AdamW + linear/cosine schedules), 546-648 (grad accumulation, global-norm
clip, update cadence).

TPU-native: the whole microbatch step (noising -> forward -> loss -> grad)
is one jitted function; gradient accumulation sums grads in device buffers
across microbatches and a second jitted function applies clip + optimizer
update. LoRA-only training uses an optax mask so frozen weights receive
zero updates and allocate no optimizer state.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from mlx_video_tpu.config import LTXModelConfig
from mlx_video_tpu.trainer.strategies import StrategyBatch, strategy_loss_fn


def make_lr_schedule(
    scheduler_type: str, lr: float, total_steps: int
):
    """constant / linear / cosine (reference: trainer.py:314-326)."""
    sched = (scheduler_type or "constant").lower()
    if sched == "linear":
        return optax.linear_schedule(lr, 0.0, max(1, total_steps))
    if sched == "cosine":
        return optax.cosine_decay_schedule(lr, max(1, total_steps), alpha=0.0)
    return lr


def make_optimizer(
    learning_rate=1e-4,
    weight_decay: float = 0.01,
    max_grad_norm: Optional[float] = 1.0,
    b1: float = 0.9,
    b2: float = 0.999,
    trainable_mask: Optional[dict] = None,
    mu_dtype=None,
) -> optax.GradientTransformation:
    """AdamW with global-norm clipping; optionally masked to LoRA leaves.

    ``mu_dtype``: storage dtype for the FIRST moment (optax semantics).
    ``jnp.bfloat16`` halves the mu buffers — at 19B/r64 LoRA that is
    0.45 GiB of HBM, the margin that fits the fused train step on one
    16 GB v5e. The second moment stays fp32 (sqrt of small EMAs is
    precision-sensitive); bf16 mu only coarsens the gradient EMA, a
    standard large-scale tradeoff."""
    chain = []
    if max_grad_norm is not None and max_grad_norm > 0:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(
        optax.adamw(
            learning_rate, b1=b1, b2=b2, weight_decay=weight_decay, mu_dtype=mu_dtype
        )
    )
    tx = optax.chain(*chain)
    if trainable_mask is not None:
        # NOTE: optax.masked would pass raw gradients THROUGH for masked-out
        # leaves (it means "don't transform", not "freeze"); multi_transform
        # with set_to_zero is the correct freeze.
        labels = jax.tree.map(lambda t: "train" if t else "freeze", trainable_mask)
        tx = optax.multi_transform({"train": tx, "freeze": optax.set_to_zero()}, labels)
    return tx


_GRAD_STATICS = ("config", "first_frame_conditioning_p", "timestep_sampling_mode",
                 "timestep_sampling_std", "sp", "pp")


@partial(jax.jit, static_argnames=_GRAD_STATICS)
def grad_step(
    params: dict,
    sb: StrategyBatch,
    key: jax.Array,
    config: LTXModelConfig,
    first_frame_conditioning_p: float = 0.1,
    timestep_sampling_mode: str = "uniform",
    timestep_sampling_std: float = 1.0,
    sp=None,
    pp=None,
) -> Tuple[jax.Array, dict]:
    """One microbatch: loss + grads (no update). ``sp``: optional
    (Mesh, axis) sequence-parallel setting for long-video training.
    ``pp``: optional (Mesh, axis, num_microbatches[, data_axis]) GPipe
    pipeline-parallel setting (parallel/pipeline.py).

    ``allow_int``: quantized bases (q4 ``quant_weight`` uint32 / W8A8
    ``int8_weight``) are frozen integer leaves under LoRA training — their
    "grads" come back as zero-size float0 tangents, which ``optax``'s
    masked ``set_to_zero`` branch and ``apply_updates`` both pass through
    (no dense zero buffers are ever allocated for the 19B base)."""
    return jax.value_and_grad(strategy_loss_fn, allow_int=True)(
        params, config, sb, key,
        first_frame_conditioning_p=first_frame_conditioning_p,
        timestep_sampling_mode=timestep_sampling_mode,
        timestep_sampling_std=timestep_sampling_std,
        sp=sp,
        pp=pp,
    )


def preferred_param_formats(params: dict, sb, key, config: LTXModelConfig, **kwargs):
    """AOT-lower ``grad_step`` with compiler-chosen (AUTO) input layouts and
    return the Format pytree XLA wants for ``params`` at this batch
    geometry (same rationale as pipelines/denoise.preferred_param_formats:
    default row-major placement makes XLA prepend multi-GB in-program
    relayout copies of the stacked 48-layer weight tensors — at 19B w4a8
    LoRA training that margin is what fits the step on one 16 GB chip).
    Re-place with ``pipelines.denoise.relayout_params``. Single-device
    only; mesh-sharded training keeps its NamedShardings."""
    from jax.experimental.layout import Format, Layout

    auto = jax.jit(
        grad_step.__wrapped__, static_argnames=_GRAD_STATICS,
        in_shardings=Format(Layout.AUTO),
    )

    def _sds(x):
        return jax.ShapeDtypeStruct(x.shape, x.dtype) if hasattr(x, "shape") else x

    abs_args = jax.tree.map(_sds, (params, sb, key))
    return auto.lower(*abs_args, config=config, **kwargs).compile().input_formats[0][0]


# --- Partitioned (trainable/frozen) training --------------------------------
#
# LoRA finetuning with value_and_grad over the FULL param tree materializes
# dense gradients for every frozen FLOAT leaf (scales/biases/norms/adaLN):
# 4.52 GB of zero-use output at 19B w4a8 (measured, r3 chip probe) — the
# difference between the step fitting one 16 GB chip with headroom or by
# 60 MB. Partitioning differentiates only the trainable subtree, so AD
# never builds those cotangents at all (frozen leaves are closed over).


def partition_trainable(params: dict, mask: dict):
    """Split a param pytree by a boolean mask into flat {path: leaf} dicts
    (train, frozen). Flat string-keyed dicts are ordinary pytrees, so both
    halves jit/donate cleanly and merge_trainable is loss-free."""
    train: dict = {}
    frozen: dict = {}
    flat_p = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_m = {tuple(_k(k) for k in path): v
              for path, v in jax.tree_util.tree_flatten_with_path(mask)[0]}
    for path, leaf in flat_p:
        key = tuple(_k(k) for k in path)
        (train if flat_m[key] else frozen)["/".join(key)] = leaf
    return train, frozen


def _k(entry) -> str:
    return str(getattr(entry, "key", getattr(entry, "idx", entry)))


def merge_trainable(train: dict, frozen: dict) -> dict:
    """Inverse of :func:`partition_trainable`: nested param tree."""
    out: dict = {}
    for flat in (frozen, train):
        for path, leaf in flat.items():
            node = out
            keys = path.split("/")
            for k in keys[:-1]:
                node = node.setdefault(k, {})
            node[keys[-1]] = leaf
    return out


@partial(jax.jit, static_argnames=_GRAD_STATICS)
def grad_step_trainable(
    train: dict,
    frozen: dict,
    sb: StrategyBatch,
    key: jax.Array,
    config: LTXModelConfig,
    first_frame_conditioning_p: float = 0.1,
    timestep_sampling_mode: str = "uniform",
    timestep_sampling_std: float = 1.0,
    sp=None,
    pp=None,
) -> Tuple[jax.Array, dict]:
    """One microbatch on a partitioned tree: loss + grads of ``train`` only
    (the frozen subtree contributes to the forward but AD never allocates
    its cotangents)."""

    def loss_fn(train_):
        return strategy_loss_fn(
            merge_trainable(train_, frozen), config, sb, key,
            first_frame_conditioning_p=first_frame_conditioning_p,
            timestep_sampling_mode=timestep_sampling_mode,
            timestep_sampling_std=timestep_sampling_std,
            sp=sp, pp=pp,
        )

    return jax.value_and_grad(loss_fn)(train)


@partial(jax.jit, static_argnames=("optimizer", "accum_steps"), donate_argnums=(0, 1, 2))
def apply_updates_trainable(
    train: dict,
    opt_state,
    grads: dict,
    optimizer: optax.GradientTransformation,
    accum_steps: int = 1,
):
    """Optimizer update over the trainable subtree only — no masked
    multi_transform, no zero updates for the 19B frozen base."""
    if accum_steps > 1:
        grads = jax.tree.map(lambda g: g / accum_steps, grads)
    updates, opt_state = optimizer.update(grads, opt_state, train)
    return optax.apply_updates(train, updates), opt_state


def preferred_trainable_formats(train, frozen, sb, key, config, **kwargs):
    """AUTO-layout discovery for :func:`grad_step_trainable` — returns the
    (train_formats, frozen_formats) pytrees (see preferred_param_formats)."""
    from jax.experimental.layout import Format, Layout

    auto = jax.jit(
        grad_step_trainable.__wrapped__, static_argnames=_GRAD_STATICS,
        in_shardings=Format(Layout.AUTO),
    )

    def _sds(x):
        return jax.ShapeDtypeStruct(x.shape, x.dtype) if hasattr(x, "shape") else x

    abs_args = jax.tree.map(_sds, (train, frozen, sb, key))
    informats = auto.lower(*abs_args, config=config, **kwargs).compile().input_formats[0]
    return informats[0], informats[1]


class LayoutStableStep(NamedTuple):
    """Compiled layout-stable partitioned train cycle (one placement, zero
    per-step relayout copies). See :func:`build_layout_stable_trainable`."""

    grad_fns: dict  # {sb_shapes_key: AOT-compiled (train, frozen, sb, key) -> (loss, grads)}
    apply_fn: object  # AOT-compiled (train, ost, grads) -> (train, ost)
    train_formats: object
    frozen_formats: object
    ost_formats: object
    grads_formats: object

    def grad(self, train, frozen, sb, key):
        k = _sb_shape_key(sb)
        fn = self.grad_fns.get(k)
        if fn is None:
            raise KeyError(
                f"no compiled grad step for batch shapes {k}; known: "
                f"{sorted(self.grad_fns)} — pass every bucket's abstract "
                "batch to build_layout_stable_trainable"
            )
        return fn(train, frozen, sb, key)

    def apply(self, train, ost, grads):
        return self.apply_fn(train, ost, grads)


def _sb_shape_key(sb) -> tuple:
    return tuple(
        (tuple(x.shape), str(x.dtype)) if hasattr(x, "shape") else None
        for x in jax.tree.leaves(sb)
    )


def build_layout_stable_trainable(
    optimizer,
    config: LTXModelConfig,
    train,
    frozen,
    sbs,
    *,
    accum_steps: int = 1,
    first_frame_conditioning_p: float = 0.1,
    timestep_sampling_mode: str = "uniform",
    timestep_sampling_std: float = 1.0,
    sp=None,
    pp=None,
):
    """Compile a LAYOUT-STABLE partitioned LoRA train cycle.

    Why this exists (measured at 19B w4a8 on one v5e, PERF.md r4): with
    default row-major param layouts, XLA prepends in-program relayout
    copies of the 48-layer weight stacks inside ``grad_step_trainable`` —
    relayouting only the frozen subtree still leaves **5.1 GiB** of HLO
    temp copies (AUTO wants non-default layouts for the LoRA factor stacks
    too, and fixing them to row-major shifts the frozen preferences), vs
    **2.1 GiB** when every input is in its preferred layout. On a 16 GB
    chip that 3 GiB is the difference between fitting and OOM.

    The cycle must also be CLOSED under the update: ``apply_updates``
    returns the new train/opt-state leaves, and if those come back
    row-major the next ``grad_step`` pays the copies again (or recompiles).
    So this builder:

    1. discovers AUTO input formats (train, frozen) of the grad step at the
       PRIMARY batch geometry (``sbs[0]``) — batch/key stay default (they
       arrive from host each step);
    2. compiles one grad executable per batch geometry with inputs pinned
       to those formats and the grads output pinned to its AUTO preference
       ``gf`` (discovered once, shared across geometries);
    3. compiles the update with inputs ``(tf, AUTO ost, gf)``, reads the
       discovered opt-state formats, then re-compiles pinned
       ``in=(tf, ost_fmt, gf) -> out=(tf, ost_fmt)`` with donation — in/out
       layouts match, so every train/opt-state buffer aliases in place.

    ``train``/``frozen``/``sbs`` may be concrete or abstract; only shapes
    and dtypes are read. Place the real trees with
    ``relayout_params(train, step.train_formats)`` etc. before stepping.
    """
    from jax.experimental.layout import Format, Layout

    dflt = Format()
    AUTO = Format(Layout.AUTO)

    def _sds(x):
        return jax.ShapeDtypeStruct(x.shape, x.dtype) if hasattr(x, "shape") else x

    abs_train, abs_frozen = jax.tree.map(_sds, (train, frozen))
    abs_sbs = [jax.tree.map(_sds, sb) for sb in sbs]
    abs_key = jax.ShapeDtypeStruct((), jax.random.key(0).dtype)

    def _grad(train_, frozen_, sb_, key_):
        return grad_step_trainable.__wrapped__(
            train_, frozen_, sb_, key_, config,
            first_frame_conditioning_p, timestep_sampling_mode,
            timestep_sampling_std, sp, pp,
        )

    def _dflt_tree(t):
        return jax.tree.map(lambda _: dflt, t)

    abs_ost = jax.eval_shape(optimizer.init, abs_train)

    # Discovered formats are disk-cached like the fused builder's
    # (utils/layouts.py): warm processes skip both discovery compiles. The
    # gf (grads output format) is discovered by the FIRST production grad
    # compile below, so only (tf, ff, ost_fmt) need the cache; gf is cached
    # too to keep re-pinned geometries deterministic across processes.
    from mlx_video_tpu.utils import layouts as layout_cache

    statics = (
        config, first_frame_conditioning_p, timestep_sampling_mode,
        timestep_sampling_std, sp, pp, accum_steps,
    )
    ckey = layout_cache.cache_key(
        "layout_stable_trainable", (abs_train, abs_frozen, abs_ost, abs_sbs[0]), statics
    )
    cached = layout_cache.load_formats(ckey, (abs_train, abs_frozen, abs_train, abs_ost))
    if cached is not None:
        tf, ff, gf, ost_fmt = cached
    else:
        # 1. param-format discovery at the primary geometry
        disc = (
            jax.jit(_grad, in_shardings=(AUTO, AUTO, _dflt_tree(abs_sbs[0]), dflt))
            .lower(abs_train, abs_frozen, abs_sbs[0], abs_key)
            .compile()
        )
        tf, ff = disc.input_formats[0][0], disc.input_formats[0][1]
        gf = ost_fmt = None

    # 2. per-geometry grad executables; grads output format from the primary
    grad_fns = {}
    for abs_sb in abs_sbs:
        out_spec = (dflt, AUTO if gf is None else gf)
        c = (
            jax.jit(
                _grad,
                in_shardings=(tf, ff, _dflt_tree(abs_sb), dflt),
                out_shardings=out_spec,
            )
            .lower(abs_train, abs_frozen, abs_sb, abs_key)
            .compile()
        )
        if gf is None:
            # output_formats mirrors the output pytree: (loss_fmt, grads_fmts)
            gf = c.output_formats[1]
        grad_fns[_sb_shape_key(abs_sb)] = c

    # 3. layout-closed update with full aliasing
    abs_grads = abs_train

    def _apply(train_, ost_, grads_):
        return apply_updates_trainable.__wrapped__(
            train_, ost_, grads_, optimizer, accum_steps
        )

    if ost_fmt is None:
        # The discovery compile carries the SAME donation as the production
        # apply: the TPU AOT compiler enforces HBM fit of each compiled
        # program, and an undonated discovery would fail the memory check at
        # exactly the 19B scale the builder targets (the fused builder's
        # lesson — undonated outputs pushed its discovery 790 MB over).
        ost_fmt = (
            jax.jit(
                _apply,
                donate_argnums=(0, 1, 2),
                in_shardings=(tf, jax.tree.map(lambda _: AUTO, abs_ost), gf),
                # donated AUTO inputs require AUTO outputs (jax rule); the
                # production re-pin below closes the cycle at (tf, ost_fmt)
                out_shardings=(tf, jax.tree.map(lambda _: AUTO, abs_ost)),
            )
            .lower(abs_train, abs_ost, abs_grads)
            .compile()
            .input_formats[0][1]
        )
        layout_cache.save_formats(ckey, (tf, ff, gf, ost_fmt))
    apply_fn = (
        jax.jit(
            _apply,
            donate_argnums=(0, 1, 2),
            in_shardings=(tf, ost_fmt, gf),
            out_shardings=(tf, ost_fmt),
        )
        .lower(abs_train, abs_ost, abs_grads)
        .compile()
    )

    return LayoutStableStep(
        grad_fns=grad_fns,
        apply_fn=apply_fn,
        train_formats=tf,
        frozen_formats=ff,
        ost_formats=ost_fmt,
        grads_formats=gf,
    )


class FusedLayoutStableStep(NamedTuple):
    """One compiled program per geometry doing grad AND update: the grads
    never cross a program boundary, so their ~1.2 GiB (at 19B/r64) of
    fp32 output+argument buffers and the separate update program's
    transients disappear. See :func:`build_fused_layout_stable`."""

    step_fns: dict  # {sb_shapes_key: (train, frozen, ost, sb, key) -> (loss, train, ost)}
    train_formats: object
    frozen_formats: object
    ost_formats: object

    def step(self, train, frozen, ost, sb, key):
        k = _sb_shape_key(sb)
        fn = self.step_fns.get(k)
        if fn is None:
            raise KeyError(
                f"no compiled fused step for batch shapes {k}; known: "
                f"{sorted(self.step_fns)}"
            )
        return fn(train, frozen, ost, sb, key)


def build_fused_layout_stable(
    optimizer,
    config: LTXModelConfig,
    train,
    frozen,
    sbs,
    *,
    first_frame_conditioning_p: float = 0.1,
    timestep_sampling_mode: str = "uniform",
    timestep_sampling_std: float = 1.0,
    sp=None,
    pp=None,
):
    """Like :func:`build_layout_stable_trainable`, but grad + optimizer
    update are ONE jitted program per geometry (``accum_steps=1``
    semantics — use the unfused builder for gradient accumulation).

    Peak-memory shape at 19B/r64 on one 16 GB chip: params 8.3 + moments
    2.4 + grad arena ~2.1 GiB, with the grads internal to the program and
    train/moments donated in place — vs the unfused cycle where the grads'
    fp32 outputs (1.2 GiB) and the update's transients stack on top at the
    step boundary.
    """
    from jax.experimental.layout import Format, Layout

    dflt = Format()
    AUTO = Format(Layout.AUTO)

    def _sds(x):
        return jax.ShapeDtypeStruct(x.shape, x.dtype) if hasattr(x, "shape") else x

    abs_train, abs_frozen = jax.tree.map(_sds, (train, frozen))
    abs_sbs = [jax.tree.map(_sds, sb) for sb in sbs]
    abs_key = jax.ShapeDtypeStruct((), jax.random.key(0).dtype)
    abs_ost = jax.eval_shape(optimizer.init, abs_train)

    def _fused(train_, frozen_, ost_, sb_, key_):
        loss, grads = grad_step_trainable.__wrapped__(
            train_, frozen_, sb_, key_, config,
            first_frame_conditioning_p, timestep_sampling_mode,
            timestep_sampling_std, sp, pp,
        )
        new_train, new_ost = apply_updates_trainable.__wrapped__(
            train_, ost_, grads, optimizer, 1
        )
        return loss, new_train, new_ost

    def _dflt_tree(t):
        return jax.tree.map(lambda _: dflt, t)

    # Discovery at the primary geometry: AUTO inputs define the canonical
    # (train, frozen, ost) formats. The discovery compile itself must fit
    # HBM (the TPU AOT compiler enforces it), so it carries the SAME
    # donation as the production step and AUTO outputs — without aliasing,
    # the unaliased new-train/new-ost outputs alone pushed the 19B compile
    # 790 MB over capacity. Discovered formats are disk-cached
    # (utils/layouts.py) so warm processes skip this compile entirely.
    from mlx_video_tpu.utils import layouts as layout_cache

    # the optimizer itself is not keyed (its repr embeds per-process
    # function addresses); its layout-relevant fingerprint — the moment
    # tree's shapes and dtypes — is already covered by abs_ost
    statics = (
        config, first_frame_conditioning_p, timestep_sampling_mode,
        timestep_sampling_std, sp, pp,
    )
    ckey = layout_cache.cache_key(
        "fused_train_step", (abs_train, abs_frozen, abs_ost, abs_sbs[0]), statics
    )
    cached = layout_cache.load_formats(ckey, (abs_train, abs_frozen, abs_ost))
    disc = None
    if cached is not None:
        tf, ff, of = cached
    else:
        disc = (
            jax.jit(
                _fused,
                donate_argnums=(0, 2),
                in_shardings=(AUTO, AUTO, AUTO, _dflt_tree(abs_sbs[0]), dflt),
                out_shardings=(dflt, AUTO, AUTO),
            )
            .lower(abs_train, abs_frozen, abs_ost, abs_sbs[0], abs_key)
            .compile()
        )
        tf, ff, of = disc.input_formats[0][:3]
        layout_cache.save_formats(ckey, (tf, ff, of))

    def _formats_equal(a, b) -> bool:
        la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
        return len(la) == len(lb) and all(str(x) == str(y) for x, y in zip(la, lb))

    step_fns = {}
    # the cycle is closed iff outputs come back in the input formats; the
    # donating AUTO compile almost always picks them equal (aliasing wants
    # it) — reuse it for the primary geometry then, else re-pin
    if disc is not None and _formats_equal(
        (tf, of), (disc.output_formats[1], disc.output_formats[2])
    ):
        step_fns[_sb_shape_key(abs_sbs[0])] = disc
    for abs_sb in abs_sbs:
        if _sb_shape_key(abs_sb) in step_fns:
            continue
        c = (
            jax.jit(
                _fused,
                donate_argnums=(0, 2),
                in_shardings=(tf, ff, of, _dflt_tree(abs_sb), dflt),
                out_shardings=(dflt, tf, of),
            )
            .lower(abs_train, abs_frozen, abs_ost, abs_sb, abs_key)
            .compile()
        )
        step_fns[_sb_shape_key(abs_sb)] = c

    return FusedLayoutStableStep(
        step_fns=step_fns, train_formats=tf, frozen_formats=ff, ost_formats=of
    )


def _is_float0(x) -> bool:
    return getattr(x, "dtype", None) == jax.dtypes.float0


def _merge_updates(params: dict, updates: dict) -> dict:
    """optax.apply_updates, except float0 updates (frozen integer leaves of
    a quantized base under LoRA) leave the param untouched."""
    return jax.tree.map(
        lambda p, u: p if _is_float0(u) else (p + u.astype(p.dtype)),
        params,
        updates,
    )


@jax.jit
def accumulate_grads(acc: dict, grads: dict) -> dict:
    # float0 = frozen integer leaf (quantized base under LoRA): no storage,
    # nothing to sum.
    return jax.tree.map(lambda a, g: a if _is_float0(a) else jnp.add(a, g), acc, grads)


@partial(jax.jit, static_argnames=("optimizer", "accum_steps"), donate_argnums=(0, 1, 2))
def apply_updates(
    params: dict,
    opt_state,
    grads: dict,
    optimizer: optax.GradientTransformation,
    accum_steps: int = 1,
):
    """Scale accumulated grads, clip (inside the optimizer chain), update."""
    if accum_steps > 1:
        grads = jax.tree.map(lambda g: g if _is_float0(g) else g / accum_steps, grads)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = _merge_updates(params, updates)
    return params, opt_state


# Back-compat simple API used by __graft_entry__.dryrun_multichip.
class TrainBatch(NamedTuple):
    latents: jax.Array  # (B, C, F, H, W)
    positions: jax.Array
    context: jax.Array


@partial(jax.jit, static_argnames=("config", "optimizer"), donate_argnums=(0, 1))
def train_step(
    params: dict,
    opt_state,
    config: LTXModelConfig,
    optimizer: optax.GradientTransformation,
    batch: TrainBatch,
    key: jax.Array,
):
    """One full T2V training step from raw (B, C, F, H, W) latents."""
    from mlx_video_tpu.trainer.strategies import (
        StrategyBatch,
        _first_frame_token_mask,
        strategy_loss_fn,
    )
    import numpy as np

    b, c, f, h, w = batch.latents.shape
    tokens = jnp.transpose(batch.latents.reshape(b, c, -1), (0, 2, 1))
    sb = StrategyBatch(
        video_latents=tokens,
        positions=batch.positions,
        context=batch.context,
        context_mask=None,
        first_frame_token_mask=jnp.asarray(_first_frame_token_mask(b, f, h, w)),
        always_conditioned_mask=jnp.zeros((b, f * h * w), dtype=bool),
    )
    loss, grads = jax.value_and_grad(strategy_loss_fn, allow_int=True)(
        params, config, sb, key
    )
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = _merge_updates(params, updates)
    return params, opt_state, loss
