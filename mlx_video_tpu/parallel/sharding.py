"""GSPMD sharding rules for the LTX DiT parameter pytree.

New capability vs. the single-device reference (SURVEY §2.12). The scheme is
megatron-style tensor parallelism over the hidden dimension plus FSDP
sharding of the remaining large axis:

- column-parallel (out-dim on ``tensor``): to_q / to_k / to_v, ff.proj_in,
  adaLN modulation linears, patchify/caption projections;
- row-parallel (in-dim on ``tensor``): to_out, ff.proj_out — XLA inserts the
  reduce at the row-parallel matmul output;
- the opposite matrix axis shards on ``fsdp`` (ZeRO-3-style param sharding,
  all-gathered per layer by XLA during the scan);
- adaLN tables / norm scales: small, sharded on ``tensor`` along their
  hidden axis where that axis is live on-device, otherwise replicated;
- the stacked layer axis (leading axis of every ``blocks`` leaf) is never
  sharded (it is scanned over).

Activations: batch on ``data``; token axis can additionally be sharded on
``fsdp`` for sequence-parallel norm/modulation sections (constraint helper
below). XLA's SPMD partitioner propagates everything else.
"""

from __future__ import annotations

import re
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# Ordered (pattern, spec-for-matrix) rules matched against "/"-joined tree
# paths. Specs are written for the *unstacked* (in, out) / vector layout; a
# leading layer axis (blocks) gets None prepended automatically.
_RULES = [
    # attention projections
    (r"(audio_)?attn\d/to_(q|k|v)/weight$", P("fsdp", "tensor")),
    (r"(audio_to_video|video_to_audio)_attn/to_(q|k|v)/weight$", P("fsdp", "tensor")),
    (r"(audio_)?attn\d/to_(q|k|v)/bias$", P("tensor")),
    (r"(audio_to_video|video_to_audio)_attn/to_(q|k|v)/bias$", P("tensor")),
    (r"attn\d?/to_out/weight$", P("tensor", "fsdp")),
    (r"_attn/to_out/weight$", P("tensor", "fsdp")),
    (r"to_out/bias$", P(None)),
    (r"(q|k)_norm/weight$", P("tensor")),
    # feed-forward
    (r"ff/proj_in/weight$", P("fsdp", "tensor")),
    (r"ff/proj_in/bias$", P("tensor")),
    (r"ff/proj_out/weight$", P("tensor", "fsdp")),
    (r"ff/proj_out/bias$", P(None)),
    # block adaLN tables: (6|5, dim) — replicate the small row axis,
    # fsdp-shard the hidden axis for memory
    (r"scale_shift_table(_a2v_ca_(audio|video))?$", P(None, "fsdp")),
    # top-level projections
    (r"patchify_proj/weight$", P(None, "tensor")),
    (r"patchify_proj/bias$", P("tensor")),
    (r"caption_projection/linear1/weight$", P("fsdp", "tensor")),
    (r"caption_projection/linear1/bias$", P("tensor")),
    (r"caption_projection/linear2/weight$", P("tensor", "fsdp")),
    (r"caption_projection/linear2/bias$", P(None)),
    (r"proj_out/weight$", P("tensor", None)),
    (r"proj_out/bias$", P(None)),
    # adaLN MLPs
    (r"adaln[a-z_]*/emb/timestep_embedder/linear1/weight$", P(None, "tensor")),
    (r"adaln[a-z_]*/emb/timestep_embedder/linear1/bias$", P("tensor")),
    (r"adaln[a-z_]*/emb/timestep_embedder/linear2/weight$", P("tensor", "fsdp")),
    (r"adaln[a-z_]*/emb/timestep_embedder/linear2/bias$", P(None)),
    (r"adaln[a-z_]*/linear/weight$", P("fsdp", "tensor")),
    (r"adaln[a-z_]*/linear/bias$", P("tensor")),
    # Gemma-3 text encoder (models/gemma3.py; layer stack scanned under
    # "layers/"). Megatron TP: column-split q/k/v + gate/up, row-split
    # o_proj/down_proj; vocab embedding fsdp-sharded for memory. Holding
    # the 12B LM sharded NEXT TO the sharded 19B DiT (instead of the
    # reference's serial load/free) is the multi-chip memory plan
    # (SURVEY §7 "19B + Gemma-12B memory choreography").
    (r"self_attn/(q|k|v)_proj/weight$", P("fsdp", "tensor")),
    (r"self_attn/(q|k|v)_proj/bias$", P("tensor")),
    (r"self_attn/o_proj/weight$", P("tensor", "fsdp")),
    (r"self_attn/o_proj/bias$", P(None)),
    (r"mlp/(gate|up)_proj/weight$", P("fsdp", "tensor")),
    (r"mlp/(gate|up)_proj/bias$", P("tensor")),
    (r"mlp/down_proj/weight$", P("tensor", "fsdp")),
    (r"mlp/down_proj/bias$", P(None)),
    (r"embed_tokens/weight$", P("fsdp", None)),
    # 49-state aggregation matmul (188160 x 3840 — the largest single
    # weight in the system, text_encoder.py)
    (r"feature_extractor/aggregate_embed/weight$", P("fsdp", "tensor")),
]


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def spec_for_path(path_str: str, ndim: int) -> P:
    """PartitionSpec for one param leaf; stacked block leaves get a leading
    None for the scanned layer axis."""
    # W8A8 leaves (ops/int8.py): int8_weight has the weight's (in, out)
    # layout; int8_scale is (out,) like a bias.
    transpose = False
    if path_str.endswith("int8_weight"):
        path_str = path_str[: -len("int8_weight")] + "weight"
    elif path_str.endswith("int8_scale"):
        path_str = path_str[: -len("int8_scale")] + "bias"
    else:
        # Affine-quantized leaves (ops/quant.py, MLX layout): quant_weight is
        # (out, in*bits/32) and scales/biases are (out, in/group) — the dense
        # (in, out) spec with its matrix axes swapped. The packed/group axis
        # shards like ``in`` (unpack is elementwise along it; the contraction
        # partial-sums reduce over it exactly as over the dense in axis).
        for leaf in ("quant_weight", "scales", "biases"):
            if path_str.endswith("/" + leaf):
                path_str = path_str[: -len(leaf)] + "weight"
                transpose = True
                break
    stacked = (
        path_str.startswith("blocks/")
        or "/blocks/" in path_str
        # Gemma layer stack (models/gemma3.py init: scanned under "layers")
        or path_str.startswith("layers/")
        or "/layers/" in path_str
    )
    for pattern, spec in _RULES:
        if re.search(pattern, path_str):
            base = tuple(spec)
            if transpose and len(base) == 2:
                base = (base[1], base[0])
            if stacked:
                base = (None,) + base
            # pad/truncate to ndim
            base = (base + (None,) * ndim)[:ndim]
            return P(*base)
    return P(*((None,) * ndim))


def param_specs(params: dict) -> dict:
    """PartitionSpec pytree matching ``params``."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: spec_for_path(_path_str(path), leaf.ndim), params
    )


def opt_state_specs(opt_state) -> object:
    """PartitionSpec pytree for an optax state built over the param tree.

    Optimizer moments (Adam mu/nu, etc.) mirror the parameter tree inside
    NamedTuple/sequence wrappers, so each leaf's path tail — the trailing
    run of dict keys — IS the parameter path; it gets the same TP/FSDP spec
    as the parameter. Non-mirrored leaves (step counts, scalars) replicate.

    This matters in two places: (1) AOT lowering of a sharded train step
    (tests/scripts), where relying on jit output-sharding propagation
    through ``optimizer.init`` was observed to replicate the moments —
    ~10x the per-device footprint of properly-sharded state; (2) restoring
    a checkpoint onto a mesh, where each moment leaf must be placed like
    its parameter.
    """
    from jax.tree_util import DictKey

    def leaf_spec(path, leaf):
        ndim = getattr(leaf, "ndim", len(getattr(leaf, "shape", ())))
        tail = []
        for k in path:
            if isinstance(k, DictKey):
                tail.append(str(k.key))
            else:
                tail = []  # restart at the innermost non-dict wrapper
        if tail and ndim > 0:
            return spec_for_path("/".join(tail), ndim)
        return P(*((None,) * ndim))

    return jax.tree_util.tree_map_with_path(leaf_spec, opt_state)


def shard_params(params: dict, mesh: Mesh, force_copy: bool = False) -> dict:
    """Place a parameter pytree onto the mesh per the TP/FSDP rules.

    ``device_put`` onto an already-matching sharding is a no-op that returns
    the SAME buffer — the result then aliases ``params``, and donating it
    (``donate_argnums``) would delete the caller's tree too. Pass
    ``force_copy=True`` to guarantee fresh buffers for every leaf (donation
    safety for derived trees; see utils/trees.py)."""
    specs = param_specs(params)

    def put(leaf, spec):
        out = jax.device_put(leaf, NamedSharding(mesh, spec))
        if force_copy and out is leaf:
            out = jnp.copy(leaf)
        return out

    return jax.tree.map(put, params, specs)


def data_spec(ndim: int, batch_axes=("data",)) -> P:
    """Batch-sharded spec for activations/inputs: axis 0 on ``data``."""
    return P(batch_axes, *((None,) * (ndim - 1)))


def shard_batch(tree, mesh: Mesh):
    """Place input arrays with batch axis sharded on ``data``."""
    return jax.tree.map(
        lambda leaf: jax.device_put(leaf, NamedSharding(mesh, data_spec(leaf.ndim))), tree
    )


def constrain_tokens(x: jax.Array, mesh: Optional[Mesh] = None) -> jax.Array:
    """Sequence-parallel constraint: shard the token axis of (B, S, D)
    activations over ``fsdp`` (used around norm/modulation sections)."""
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P("data", "fsdp", None)))


def replicate_params(params, mesh: Mesh):
    """Replicate a param pytree over every device of ``mesh``.

    Used for the conv stacks (VAE decoder/encoder, latent upsampler, audio
    models): their weights are small next to the DiT, so full replication
    makes every conv weight local and GSPMD only has to partition the
    ACTIVATIONS — spatial (H-axis) sharding with compiler-inserted halo
    exchanges at the conv boundaries. This keeps the upsample/decode stages
    mesh-resident: latents never funnel to one device between the sharded
    denoise and the decode (reference runs these single-device,
    mlx_video/generate.py:3285-3455; multi-chip residency is new-build).
    Idempotent: device_put onto an identical sharding is a no-op."""
    s = NamedSharding(mesh, P())
    return jax.tree.map(lambda leaf: jax.device_put(leaf, s), params)


def spatial_sharding(mesh: Mesh, shape, h_axis: int = 3) -> NamedSharding:
    """NamedSharding that splits the H (height) axis of a video tensor over
    the mesh's non-data axes (``fsdp`` x ``tensor`` flattened).

    H is the one axis that is large at every stage of the VAE pyramid, is
    never reshaped by depth-to-space along a partitioned dimension in a way
    GSPMD cannot follow, and gives conv halo exchanges of just
    (kernel-1)/2 rows — the cheapest cut for spatially-partitioned conv.
    Batch additionally shards on ``data`` so multi-video decode composes.

    device_put requires exact divisibility, so axes that do not divide
    their dimension are dropped greedily (worst case: replicated)."""
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    spec = [None] * len(shape)
    if "data" in sizes and shape[0] % sizes["data"] == 0 and sizes["data"] > 1:
        spec[0] = "data"
    h_axes = []
    for a in ("fsdp", "tensor"):
        if a in sizes and shape[h_axis] % (
            _prod(sizes[x] for x in h_axes + [a])
        ) == 0:
            h_axes.append(a)
    if h_axes:
        spec[h_axis] = tuple(h_axes) if len(h_axes) > 1 else h_axes[0]
    return NamedSharding(mesh, P(*spec))


def _prod(it) -> int:
    out = 1
    for v in it:
        out *= v
    return out


def shard_spatial(x, mesh: Optional[Mesh], h_axis: int = 3):
    """Re-place a (B, C, F, H, W) (default) or channels-last video tensor
    with its H axis sharded over the mesh (device-side reshard; no host
    bounce). No-op without a mesh."""
    if mesh is None or x is None:
        return x
    return jax.device_put(x, spatial_sharding(mesh, x.shape, h_axis))
