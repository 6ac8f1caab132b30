"""LoRA: offline merge, runtime adapters, and training injection.

Behavioral spec: reference mlx_video/lora.py:94-275 (merge W += s*B@A with
key-candidate search; runtime adapters y = base(x) + s*x@A^T@B^T) and
mlx_video/mlx_trainer/lora.py:11-164 (LoRALinear init A~N(0, 0.01), B=0,
scaling alpha/r, target-module patterns, export as
``diffusion_model.<path>.lora_A.weight``).

Functional design: LoRA factors are extra leaves (``lora_A`` (r, in),
``lora_B`` (out, r), ``lora_scale`` ()) inside the SAME linear param dict;
``ops.linear.linear`` applies them when present. That makes runtime
adapters, training (optimize only lora leaves via an optax mask), and
offline merge all plain pytree transformations — no module wrappers.
Stacked block leaves get a leading layer axis like every other block param.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, Iterable, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from mlx_video_tpu.config import LTXModelConfig
from mlx_video_tpu.io.safetensors import SafetensorsReader, save_safetensors
from mlx_video_tpu.io.weights import dit_tree_path, sanitize_pt_key

DEFAULT_TARGET_MODULES = (
    "to_q",
    "to_k",
    "to_v",
    "to_out",
    "ff.proj_in",
    "ff.proj_out",
    "audio_ff.proj_in",
    "audio_ff.proj_out",
    "audio_attn1",
    "audio_attn2",
    "audio_to_video_attn",
    "video_to_audio_attn",
)


@dataclass(frozen=True)
class LoraSpec:
    path: Path
    strength: float = 1.0


@dataclass
class LoRAConfig:
    """(reference: mlx_trainer/lora.py:10-15)."""

    rank: int = 8
    alpha: float = 16.0
    dropout: float = 0.0
    target_modules: Optional[Tuple[str, ...]] = None


def load_lora_state(path: Union[str, Path]) -> Dict[str, np.ndarray]:
    with SafetensorsReader(path) as r:
        return {k: r.get(k) for k in r.keys()}


def _strip_lora_prefixes(key: str) -> str:
    for prefix in ("model.diffusion_model.", "diffusion_model."):
        if key.startswith(prefix):
            return key[len(prefix) :]
    return key


def iter_lora_pairs(
    lora_sd: Dict[str, np.ndarray],
) -> Iterable[Tuple[str, np.ndarray, np.ndarray]]:
    """Yield (sanitized base key, A (r, in), B (out, r)) for each LoRA pair
    (reference: lora.py:36-73)."""
    for key in lora_sd:
        if not key.endswith(".lora_A.weight"):
            continue
        prefix = key[: -len(".lora_A.weight")]
        key_b = f"{prefix}.lora_B.weight"
        if key_b not in lora_sd:
            continue
        base = _strip_lora_prefixes(prefix) + ".weight"
        base = sanitize_pt_key("model.diffusion_model." + base) or base
        yield base[: -len(".weight")], np.asarray(lora_sd[key]), np.asarray(lora_sd[key_b])


def _locate_linear(params: dict, sanitized_module: str):
    """Map a sanitized module key to (layer_index_or_None, linear param dict)."""
    mapped = dit_tree_path(sanitized_module + ".weight")
    if mapped is None:
        return None
    layer, path = mapped
    node = params
    for part in path[:-1]:
        if not isinstance(node, dict) or part not in node:
            return None
        node = node[part]
    if "weight" not in node and "quant_weight" not in node:
        return None
    return layer, node


def merge_lora_into_params(
    params: dict,
    lora_specs: Sequence[LoraSpec],
    verbose: bool = False,
) -> dict:
    """Offline merge: W += strength * (B @ A)^T applied to the (in, out)
    weights (reference: lora.py:94-127). Returns a new pytree."""
    params = jax.tree.map(lambda x: x, params)  # shallow copy of leaves refs
    # deep-copy dict structure so in-place edits don't alias the input
    import copy

    params = copy.deepcopy(jax.tree.map(lambda x: x, params))

    for spec in lora_specs:
        lora_sd = load_lora_state(spec.path)
        applied = skipped = 0
        for module_key, A, B in iter_lora_pairs(lora_sd):
            loc = _locate_linear(params, module_key)
            if loc is None:
                skipped += 1
                continue
            layer, node = loc
            if "weight" not in node:
                skipped += 1  # quantized base: use runtime adapters instead
                continue
            delta = (B.astype(np.float32) @ A.astype(np.float32)).T * spec.strength
            w = node["weight"]
            if layer is None:
                node["weight"] = (w.astype(jnp.float32) + delta).astype(w.dtype)
            else:
                upd = w[layer].astype(jnp.float32) + delta
                node["weight"] = w.at[layer].set(upd.astype(w.dtype))
            applied += 1
        if verbose or applied == 0:
            print(f"[LoRA] {spec.path} applied={applied} skipped={skipped}")
    return params


def attach_runtime_lora(
    params: dict,
    lora_specs: Sequence[LoraSpec],
    config: LTXModelConfig,
    verbose: bool = False,
    slot_rank: Optional[int] = None,
) -> dict:
    """Attach LoRA factors as adapter leaves without touching base weights —
    required for quantized bases (reference: lora.py:188-275).

    Restriction (scan layout): either every layer of a block linear has a
    LoRA pair or none; partially-covered block linears get zero factors for
    the missing layers.

    The returned tree shares every base-weight leaf with the input (fresh
    dicts only): attaching costs O(adapter) device memory, never a copy of
    the base — a resident server can hold several adapted views of one 19B
    base. (A deepcopy here would device-copy all ~10 GB per adapter.)

    ``slot_rank`` (serving hot-swap without recompile): ``params`` is a
    SLOTTED base — every target linear already carries zero-effect
    ``lora_A``/``lora_B`` leaves of rank ``slot_rank`` (``inject_lora``
    with that rank; B=0 makes the delta exactly zero). File factors then
    REPLACE the slot (zero-padded up to ``slot_rank``; multiple adapters
    rank-concat first), so the adapted tree has the SAME avals as the
    slotted base and the 19B denoise executable is reused — swapping an
    adapter costs O(adapter) transfer, never a second compiled scan
    (measured OOMing a 16 GB chip beside the resident base program, r5).
    Raises ValueError when the combined rank exceeds the slot or a file
    targets a module without a slot — callers fall back to the recompile
    path.
    """

    def _structural_copy(node):
        if isinstance(node, dict):
            return {k: _structural_copy(v) for k, v in node.items()}
        return node  # jax arrays are immutable: sharing leaves is safe

    params = _structural_copy(params)
    num_layers = config.num_layers
    written: set = set()  # node ids written by THIS call (compose-concat)

    for spec in lora_specs:
        lora_sd = load_lora_state(spec.path)
        # group per (block-relative path) -> {layer: (A, B)} / top-level
        grouped: Dict[Tuple, Dict] = {}
        for module_key, A, B in iter_lora_pairs(lora_sd):
            mapped = dit_tree_path(module_key + ".weight")
            if mapped is None:
                continue
            layer, path = mapped
            grouped.setdefault(path[:-1], {})[layer] = (A, B)

        applied = 0
        for path, layers in grouped.items():
            node = params
            ok = True
            for part in path:
                if not isinstance(node, dict) or part not in node:
                    ok = False
                    break
                node = node[part]
            if not ok or not isinstance(node, dict):
                continue
            sample_A, sample_B = next(iter(layers.values()))
            r, in_dim = sample_A.shape
            out_dim = sample_B.shape[0]
            if None in layers:  # top-level linear
                A, B = layers[None]
                A_new = jnp.asarray(A.astype(np.float32)) * spec.strength
                B_new = jnp.asarray(B.astype(np.float32))
            else:  # stacked block linear
                A_stack = np.zeros((num_layers, r, in_dim), dtype=np.float32)
                B_stack = np.zeros((num_layers, out_dim, r), dtype=np.float32)
                for layer, (A, B) in layers.items():
                    A_stack[layer] = A.astype(np.float32) * spec.strength
                    B_stack[layer] = B.astype(np.float32)
                A_new = jnp.asarray(A_stack)
                B_new = jnp.asarray(B_stack)
            if slot_rank is not None and "lora_A" in node:
                # slots may be stored bf16 (serving halves their HBM);
                # factors must keep the slot's dtype or the avals change
                A_new = A_new.astype(node["lora_A"].dtype)
                B_new = B_new.astype(node["lora_B"].dtype)
            if "lora_A" in node and (slot_rank is None or id(node) in written):
                # a previous adapter in this request already covers this
                # linear: compose by rank concatenation, which is exactly
                # the sum of the two low-rank updates
                # (x A1^T B1^T + x A2^T B2^T == x [A1;A2]^T [B1|B2]^T)
                node["lora_A"] = jnp.concatenate([node["lora_A"], A_new], axis=-2)
                node["lora_B"] = jnp.concatenate([node["lora_B"], B_new], axis=-1)
            elif slot_rank is not None and "lora_A" not in node:
                raise ValueError(
                    f"{spec.path}: targets {'.'.join(path)} which has no "
                    f"rank-{slot_rank} adapter slot — fall back to the "
                    "recompile attach path"
                )
            else:
                # fresh write (legacy) or slot replacement (slot_rank)
                node["lora_A"] = A_new
                node["lora_B"] = B_new
                if slot_rank is not None and "lora_scale" in node:
                    # the slot carries inject_lora's alpha/rank training
                    # scale; attached file factors bake strength into A and
                    # expect scale 1 (same aval: keep the layer axis)
                    node["lora_scale"] = jnp.ones_like(node["lora_scale"])
            written.add(id(node))
            applied += 1
        if verbose or applied == 0:
            print(f"[LoRA] runtime attach {spec.path} applied={applied}")

    if slot_rank is not None:
        # zero-pad every written node's factors up to the slot rank so the
        # adapted tree's avals equal the slotted base's
        def pad_slots(node):
            if not isinstance(node, dict):
                return
            if id(node) in written:
                A, B = node["lora_A"], node["lora_B"]
                r = A.shape[-2]
                if r > slot_rank:
                    raise ValueError(
                        f"combined adapter rank {r} exceeds the slot rank "
                        f"{slot_rank} — fall back to the recompile attach path"
                    )
                if r < slot_rank:
                    pad_a = [(0, 0)] * A.ndim
                    pad_a[-2] = (0, slot_rank - r)
                    pad_b = [(0, 0)] * B.ndim
                    pad_b[-1] = (0, slot_rank - r)
                    node["lora_A"] = jnp.pad(A, pad_a)
                    node["lora_B"] = jnp.pad(B, pad_b)
            for v in node.values():
                pad_slots(v)

        pad_slots(params)
    return params


def load_lora_into_params(params: dict, path: Union[str, Path], config: LTXModelConfig) -> dict:
    """REPLACE injected adapter leaves with factors from a saved adapter
    file (``save_lora`` / reference ``lora_step_N.safetensors`` format) —
    continue-training semantics (reference: trainer.py:282-293), distinct
    from :func:`attach_runtime_lora` which composes adapters over a base.

    Requires :func:`inject_lora` to have created the leaves already (their
    shapes validate the file's rank/geometry against the config).
    """
    lora_sd = load_lora_state(path)
    num_layers = config.num_layers
    grouped: Dict[Tuple, Dict] = {}
    for module_key, A, B in iter_lora_pairs(lora_sd):
        mapped = dit_tree_path(module_key + ".weight")
        if mapped is None:
            continue
        layer, tree_path = mapped
        grouped.setdefault(tree_path[:-1], {})[layer] = (A, B)
    if not grouped:
        raise ValueError(f"{path}: no LoRA pairs found (not an adapter checkpoint?)")

    def _structural_copy(node):
        if isinstance(node, dict):
            return {k: _structural_copy(v) for k, v in node.items()}
        return node

    params = _structural_copy(params)
    for tree_path, layers in grouped.items():
        node = params
        for part in tree_path:
            if not isinstance(node, dict) or part not in node:
                node = None
                break
            node = node[part]
        if node is None or "lora_A" not in node:
            raise ValueError(
                f"{path}: adapter targets {'.'.join(tree_path)} but no LoRA "
                "leaves are injected there — check lora_rank/target_modules"
            )
        if None in layers:
            A, B = layers[None]
            A_new = jnp.asarray(A.astype(np.float32))
            B_new = jnp.asarray(B.astype(np.float32))
        else:
            sample_A, sample_B = next(iter(layers.values()))
            A_stack = np.zeros((num_layers, *sample_A.shape), dtype=np.float32)
            B_stack = np.zeros((num_layers, *sample_B.shape), dtype=np.float32)
            for layer, (A, B) in layers.items():
                A_stack[layer] = A.astype(np.float32)
                B_stack[layer] = B.astype(np.float32)
            A_new, B_new = jnp.asarray(A_stack), jnp.asarray(B_stack)
        if A_new.shape != node["lora_A"].shape or B_new.shape != node["lora_B"].shape:
            raise ValueError(
                f"{path}: adapter shapes A{A_new.shape}/B{B_new.shape} at "
                f"{'.'.join(tree_path)} do not match the injected leaves "
                f"A{node['lora_A'].shape}/B{node['lora_B'].shape} "
                "(different lora_rank?)"
            )
        node["lora_A"] = A_new.astype(node["lora_A"].dtype)
        node["lora_B"] = B_new.astype(node["lora_B"].dtype)
    return params


# ---------------------------------------------------------------------------
# Training injection (reference: mlx_trainer/lora.py:78-131)
# ---------------------------------------------------------------------------


def _module_matches(path_parts: Tuple[str, ...], targets: Sequence[str]) -> bool:
    path = ".".join(path_parts)
    return any(path.endswith(t) or f".{t}." in path + "." for t in targets)


def inject_lora(
    params: dict,
    config: LTXModelConfig,
    lora_config: LoRAConfig,
    key: jax.Array,
    dtype=jnp.float32,
) -> dict:
    """Add trainable (lora_A ~ N(0, 0.01), lora_B = 0) leaves to every
    matching linear. Block linears get stacked (L, ...) factors.

    Ownership: the returned tree has FRESH containers but SHARES every base
    leaf's device buffer with ``params`` (a deepcopy would transiently
    double the full base on device — 7+ GiB at 19B q4, which OOM'd the
    single-chip finetune drive). Consequence: a donating step
    (``donate_argnums``) or explicit ``.delete()`` on either tree's leaves
    invalidates the other. If the caller keeps ``params`` alive across a
    donating train step on the injected tree (e.g. serve LoRA hot-swap over
    a resident base), copy the shared leaves first —
    ``utils/trees.py:own_derived_leaves(injected, base)`` or
    ``parallel.sharding.shard_params(injected, mesh, force_copy=True)``.

    Shapes come from the config's ``eval_shape`` skeleton (zero memory), not
    from the stored leaves: quantized storage makes shape-only recovery
    ambiguous (``group_size x bits`` is underdetermined — a q4/gs64 packed
    tensor is indistinguishable from w8/gs32), and W8A8 nodes store
    ``int8_weight`` rather than ``weight`` at all. Any linear the skeleton
    knows gets exact (in, out) dims regardless of its storage format."""
    from mlx_video_tpu.models.ltx.model import init_ltx_params

    # Fresh containers, SHARED leaves: tree.map rebuilds every dict on
    # unflatten, so walk()'s in-place key inserts below cannot mutate the
    # caller's tree. A deepcopy here would device-copy every leaf —
    # a transient 2x of the full base (7+ GiB at 19B q4) that OOM'd the
    # single-chip LoRA-finetune drive before training even started.
    params = jax.tree.map(lambda x: x, params)
    targets = lora_config.target_modules or DEFAULT_TARGET_MODULES
    rank = lora_config.rank
    scale = lora_config.alpha / rank if rank > 0 else 1.0
    counter = [0]
    skeleton = jax.eval_shape(
        lambda: init_ltx_params(jax.random.key(0), config, dtype=dtype)
    )

    def _skeleton_weight(path: Tuple[str, ...]):
        node = skeleton
        for p in path:
            if not isinstance(node, dict) or p not in node:
                return None
            node = node[p]
        w = node.get("weight") if isinstance(node, dict) else None
        return w if w is not None and w.ndim in (2, 3) else None

    def walk(node: dict, path: Tuple[str, ...]):
        if (
            "weight" in node or "quant_weight" in node or "int8_weight" in node
        ) and _module_matches(path, targets):
            w = node.get("weight")
            sw = _skeleton_weight(path)
            if sw is not None:
                stacked = sw.ndim == 3
                in_dim, out_dim = sw.shape[-2], sw.shape[-1]
            elif w is not None and w.ndim in (2, 3):
                stacked = w.ndim == 3
                in_dim, out_dim = w.shape[-2], w.shape[-1]
            elif "int8_weight" in node and node["int8_weight"].ndim in (2, 3):
                iw = node["int8_weight"]  # dense layout (in, out)
                stacked = iw.ndim == 3
                in_dim, out_dim = iw.shape[-2], iw.shape[-1]
            elif "quant_weight" in node:
                # Last-resort packed-shape heuristic (ambiguous — see above).
                sc = node["scales"]
                stacked = sc.ndim == 3
                out_dim = sc.shape[-2]
                in_dim = None
                for b in (8, 6, 4, 3, 2):
                    if 32 % b:
                        continue
                    cand = node["quant_weight"].shape[-1] * (32 // b)
                    if cand % sc.shape[-1] == 0:
                        in_dim = cand
                        break
                if in_dim is None:
                    return
            else:
                return
            k = jax.random.fold_in(key, counter[0])
            counter[0] += 1
            a_shape = (rank, in_dim)
            b_shape = (out_dim, rank)
            # lora_scale must carry the layer axis too so the block scan can
            # slice it like every other stacked leaf.
            scale_shape: Tuple[int, ...] = ()
            if stacked:
                a_shape = (config.num_layers,) + a_shape
                b_shape = (config.num_layers,) + b_shape
                scale_shape = (config.num_layers,)
            node["lora_A"] = (jax.random.normal(k, a_shape, dtype=jnp.float32) * 0.01).astype(dtype)
            node["lora_B"] = jnp.zeros(b_shape, dtype=dtype)
            node["lora_scale"] = jnp.full(scale_shape, scale, dtype=jnp.float32)
            return
        for name, child in node.items():
            if isinstance(child, dict):
                walk(child, path + (name,))

    walk(params, ())
    return params


def lora_mask(params: dict) -> dict:
    """Boolean pytree: True for lora leaves (the optax trainable mask,
    reference freeze semantics: mlx_trainer/lora.py:124-131)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: any(
            getattr(k, "key", None) in ("lora_A", "lora_B") for k in path
        ),
        params,
    )


def export_lora_state(params: dict, config: LTXModelConfig) -> Dict[str, np.ndarray]:
    """Export lora_A/lora_B leaves in the reference checkpoint format
    ``diffusion_model.<sanitized path>.lora_{A,B}.weight``
    (reference: mlx_trainer/lora.py:133-140). Stacked factors unstack per layer."""
    from mlx_video_tpu.io.weights import flatten_params

    inv_av = {
        "av_ca_video_scale_shift_adaln": "av_ca_video_scale_shift_adaln_single",
        "av_ca_audio_scale_shift_adaln": "av_ca_audio_scale_shift_adaln_single",
        "av_ca_a2v_gate_adaln": "av_ca_a2v_gate_adaln_single",
        "av_ca_v2a_gate_adaln": "av_ca_v2a_gate_adaln_single",
    }
    out: Dict[str, np.ndarray] = {}
    for flat_key, leaf in flatten_params(params).items():
        parts = flat_key.split(".")
        if parts[-1] not in ("lora_A", "lora_B"):
            continue
        which = parts[-1]
        module = parts[:-1]
        arr = np.asarray(leaf, dtype=np.float32)
        if module[0] == "blocks":
            rel = module[1:]
            for layer in range(arr.shape[0]):
                name = ".".join(["transformer_blocks", str(layer)] + rel)
                out[f"diffusion_model.{name}.{which}.weight"] = arr[layer]
        elif module[0] == "video":
            out[f"diffusion_model.{'.'.join(module[1:])}.{which}.weight"] = arr
        elif module[0] == "audio":
            name = "audio_" + ".".join(module[1:])
            out[f"diffusion_model.{name}.{which}.weight"] = arr
        elif module[0] == "av":
            name = ".".join([inv_av[module[1]]] + module[2:])
            out[f"diffusion_model.{name}.{which}.weight"] = arr
    return out


def save_lora(path: Union[str, Path], params: dict, config: LTXModelConfig) -> None:
    save_safetensors(path, export_lora_state(params, config))
