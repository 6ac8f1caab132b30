"""Training checkpoints with full optimizer state + step (resume-capable).

The reference saves only LoRA A/B or raw params every N steps and resumes
without optimizer/step state (reference: mlx_video/mlx_trainer/
trainer.py:650-674, 282-293). SURVEY §5 flags this as the gap to close for
multi-host training: here a checkpoint is {params, opt_state pytree, step,
rng} saved as safetensors + a JSON treedef, so resume is exact.
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mlx_video_tpu.io.safetensors import SafetensorsReader, save_safetensors


def _flatten_with_treedef(tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef


def _to_host(leaf) -> np.ndarray:
    """Device leaf -> full host array.

    Multi-host jobs shard global arrays so no single process addresses every
    shard; ``process_allgather`` reassembles the full value on each host
    (every process must call this — it is a collective). Single-process
    (including single-host meshes) is a plain device fetch.
    """
    if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
        from jax.experimental import multihost_utils

        leaf = multihost_utils.process_allgather(leaf, tiled=True)
    return np.asarray(leaf)


def save_train_checkpoint(
    path: Path, params: dict, opt_state, step: int, extra: Optional[dict] = None
) -> None:
    """Save params + optimizer state + step to <path> (.safetensors).

    On multi-host jobs every process must call this (the leaf gathers are
    collectives); only process 0 writes the file.
    """
    path = Path(path)

    tensors = {}
    p_leaves, p_def = _flatten_with_treedef(params)
    for i, leaf in enumerate(p_leaves):
        tensors[f"params.{i}"] = _to_host(leaf)
    o_leaves, o_def = _flatten_with_treedef(opt_state)
    for i, leaf in enumerate(o_leaves):
        tensors[f"opt.{i}"] = _to_host(leaf)

    if jax.process_index() != 0:
        return
    path.parent.mkdir(parents=True, exist_ok=True)

    meta = {
        "step": str(step),
        "params_treedef": str(p_def),
        "num_params_leaves": str(len(p_leaves)),
        "num_opt_leaves": str(len(o_leaves)),
    }
    if extra:
        meta["extra"] = json.dumps(extra)
    save_safetensors(path, tensors, metadata=meta)


def load_train_checkpoint(
    path: Path, params_template: dict, opt_state_template
) -> Tuple[dict, object, int]:
    """Restore (params, opt_state, step); templates provide the tree
    structure (shapes validated leaf-by-leaf)."""
    with SafetensorsReader(path) as r:
        meta = r.metadata
        step = int(meta.get("step", "0"))
        p_leaves, p_def = _flatten_with_treedef(params_template)
        o_leaves, o_def = _flatten_with_treedef(opt_state_template)
        def _place(arr, tmpl):
            # Preserve the template's MESH placement (TP/FSDP NamedSharding
            # for mesh-sharded training). Leaves whose template sits on the
            # default device (e.g. optimizer `count` scalars from an eager
            # optax init) must stay UNCOMMITTED: committing them to one
            # process-local device breaks multi-process resume — params span
            # the global mesh while `count` pins to this host's device 0 and
            # the next jit rejects the mixed device sets (found by
            # scripts/drive_multihost.py).
            from jax.sharding import NamedSharding

            out = jnp.asarray(arr)
            sharding = getattr(tmpl, "sharding", None)
            if isinstance(sharding, NamedSharding):
                out = jax.device_put(out, sharding)
            return out

        new_p = []
        for i, tmpl in enumerate(p_leaves):
            arr = r.get(f"params.{i}")
            if tuple(arr.shape) != tuple(np.shape(tmpl)):
                raise ValueError(
                    f"Checkpoint param leaf {i} shape {arr.shape} != template {np.shape(tmpl)}"
                )
            new_p.append(_place(arr, tmpl))
        new_o = []
        for i, tmpl in enumerate(o_leaves):
            arr = r.get(f"opt.{i}")
            new_o.append(_place(arr, tmpl))
    return (
        jax.tree_util.tree_unflatten(p_def, new_p),
        jax.tree_util.tree_unflatten(o_def, new_o),
        step,
    )


def prune_checkpoints(output_dir: Path, keep_last_n: int) -> None:
    """Keep the newest N checkpoint STEPS (reference: trainer.py:662-674).

    A save writes several files per step (the adapter/params export plus the
    resume state), so pruning counts distinct steps, not files — counting
    files would tie the same step's exports against each other and delete
    one of them nondeterministically. Files without a ``step_<n>`` marker
    (user files that happen to live in output_dir) are never touched.
    """
    if keep_last_n is None or keep_last_n < 0:
        return
    by_step: dict = {}
    for f in Path(output_dir).glob("*.safetensors"):
        step = _step_of(f.name)
        if step >= 0:
            by_step.setdefault(step, []).append(f)
    for step in sorted(by_step)[: max(0, len(by_step) - keep_last_n)]:
        for f in by_step[step]:
            try:
                f.unlink()
            except OSError:
                pass


def _step_of(name: str) -> int:
    m = re.search(r"step_(\d+)", name)
    return int(m.group(1)) if m else -1


def latest_checkpoint(output_dir: Path, prefix: str = "state_step_") -> Optional[Path]:
    files = sorted(Path(output_dir).glob(f"{prefix}*.safetensors"), key=lambda p: _step_of(p.name))
    return files[-1] if files else None
