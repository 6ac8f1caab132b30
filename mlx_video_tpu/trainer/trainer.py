"""TPU trainer: LoRA / full finetune over precomputed latents.

Behavioral spec: reference mlx_video/mlx_trainer/trainer.py:93-742
(dataset -> model (SPLIT rope, video-only or AV) -> LoRA inject + freeze ->
AdamW(+schedule) -> loop with grad accumulation / clip / update ->
checkpoint save + prune -> validation via generate -> wandb).

TPU-native differences:
- the microbatch step and the optimizer update are jitted; grads accumulate
  in device buffers (no host round trips per step);
- optional (data, fsdp, tensor) mesh sharding of params + batch, or GPipe
  pipeline parallelism over the block stack (pipeline_stages config);
- checkpoints carry optimizer state + step and resume exactly
  (trainer/checkpoints.py) — the reference loses optimizer state;
- quantized-base models are restricted to LoRA mode (reference guard:
  trainer.py:234-295).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mlx_video_tpu.config import LTXModelConfig, LTXModelType, LTXRopeType
from mlx_video_tpu.io.safetensors import SafetensorsReader, save_safetensors
from mlx_video_tpu.io.weights import flatten_params, load_dit_params
from mlx_video_tpu.lora import LoRAConfig, inject_lora, lora_mask, save_lora
from mlx_video_tpu.models.ltx.model import init_ltx_params
from mlx_video_tpu.trainer import checkpoints as ckpt
from mlx_video_tpu.trainer.config import TrainingConfig
from mlx_video_tpu.trainer.datasets import Batch, DummyDataset, PrecomputedDataset, iter_batches
from mlx_video_tpu.trainer.strategies import (
    prepare_text_to_video,
    prepare_video_to_video,
)
from mlx_video_tpu.trainer.train_step import (
    accumulate_grads,
    apply_updates,
    grad_step,
    make_lr_schedule,
    make_optimizer,
)


def _params_has_quant(params: dict) -> bool:
    """True for affine (quant_weight) AND W8A8 (int8_weight) bases — both
    are frozen-weight formats (int8 matmuls have zero gradient through the
    round()); only LoRA training is valid on top of them."""
    found = []

    def walk(n):
        if isinstance(n, dict):
            if "quant_weight" in n or "int8_weight" in n:
                found.append(True)
            for v in n.values():
                walk(v)

    walk(params)
    return bool(found)


def build_model_config(cfg: TrainingConfig) -> LTXModelConfig:
    """48-layer SPLIT-rope config, AV when with_audio
    (reference: trainer.py:234-295)."""
    return LTXModelConfig(
        model_type=LTXModelType.AudioVideo if cfg.with_audio else LTXModelType.VideoOnly,
        rope_type=LTXRopeType.SPLIT,
        double_precision_rope=True,
    )


class Trainer:
    def __init__(
        self,
        cfg: TrainingConfig,
        model_config: Optional[LTXModelConfig] = None,
        params: Optional[dict] = None,
        dataset=None,
        validation_fn: Optional[Callable[[dict, int], None]] = None,
    ) -> None:
        self.cfg = cfg
        self.model_config = model_config or build_model_config(cfg)
        if cfg.enable_gradient_checkpointing and not self.model_config.gradient_checkpointing:
            import dataclasses

            self.model_config = dataclasses.replace(
                self.model_config, gradient_checkpointing=True
            )
        self.validation_fn = validation_fn
        self._wandb = None

        self.dataset = dataset if dataset is not None else self._load_dataset()
        self.params = params if params is not None else self._load_params()

        if _params_has_quant(self.params) and cfg.training_mode != "lora":
            raise ValueError(
                "Quantized base weights support LoRA training only "
                "(reference guard: trainer.py:234-295)."
            )

        if cfg.training_mode == "lora":
            self.params = inject_lora(
                self.params,
                self.model_config,
                LoRAConfig(
                    rank=cfg.lora_rank,
                    alpha=cfg.lora_alpha,
                    dropout=cfg.lora_dropout,
                    target_modules=tuple(cfg.target_modules) if cfg.target_modules else None,
                ),
                jax.random.key(cfg.seed),
            )
            trainable = lora_mask(self.params)
        else:
            trainable = None

        if cfg.load_checkpoint:
            # Continue-training entry (reference: trainer.py:282-293):
            # either a saved adapter (lora_step_N.safetensors) overwriting
            # the just-injected LoRA leaves, or a full transformer export.
            ck_path = Path(cfg.load_checkpoint)
            if not ck_path.exists():
                raise FileNotFoundError(f"load_checkpoint: {ck_path} does not exist")
            from mlx_video_tpu.io.weights import load_native_params
            from mlx_video_tpu.lora import load_lora_into_params

            with SafetensorsReader(ck_path) as _r:
                is_adapter = any(".lora_A." in k for k in _r.keys())
            if is_adapter:
                if cfg.training_mode != "lora":
                    raise ValueError(
                        "load_checkpoint points at a LoRA adapter but "
                        "training_mode is 'full'"
                    )
                self.params = load_lora_into_params(self.params, ck_path, self.model_config)
            else:
                loaded = load_native_params(ck_path)
                tmpl = jax.tree_util.tree_structure(self.params)
                got = jax.tree_util.tree_structure(loaded)
                if tmpl != got:
                    raise ValueError(
                        f"load_checkpoint: {ck_path} tree structure does not "
                        "match the model (wrong export / missing LoRA leaves?)"
                    )
                dt = jnp.bfloat16 if cfg.mixed_precision_mode == "bf16" else jnp.float32
                self.params = jax.tree.map(
                    lambda t, x: jnp.asarray(x, t.dtype if hasattr(t, "dtype") else dt),
                    self.params, loaded,
                )
            print(f"[trainer] Loaded weights from {ck_path}")

        # Mesh-sharded training (new capability vs the single-device
        # reference, SURVEY §2.12): TP/FSDP-shard params over a
        # (data, fsdp, tensor) mesh BEFORE optimizer init so the optimizer
        # state inherits the same shardings; batches shard on the data axis
        # per step, and checkpoint resume re-places leaves onto the
        # templates' shardings (checkpoints.load_train_checkpoint).
        self.mesh = None
        self.sp = None
        self.pp = None
        if cfg.pipeline_stages and cfg.mesh_shape:
            raise ValueError("pipeline_stages and mesh_shape are mutually exclusive")
        if cfg.pipeline_stages and cfg.sequence_parallel:
            raise ValueError("pipeline_stages and sequence_parallel are mutually exclusive")
        if cfg.mesh_shape:
            from mlx_video_tpu.parallel.mesh import create_mesh
            from mlx_video_tpu.parallel.sharding import shard_params

            self.mesh = create_mesh(tuple(cfg.mesh_shape))
            self.params = shard_params(self.params, self.mesh)
            if cfg.sequence_parallel:
                self.sp = (self.mesh, "fsdp")
            print(
                f"[trainer] mesh={dict(zip(('data', 'fsdp', 'tensor'), cfg.mesh_shape))}"
                f" sequence_parallel={bool(self.sp)}"
            )
        elif cfg.pipeline_stages:
            # GPipe pipeline parallelism (parallel/pipeline.py): blocks
            # layer-sharded into stages on a (data, pipe) mesh; batches
            # stay unsharded and are microbatched inside the pipelined
            # forward. Targets cross-slice (DCN) scale-out.
            from mlx_video_tpu.parallel.pipeline import (
                pipeline_mesh,
                shard_params_pipeline,
            )

            pp_mesh = pipeline_mesh(
                cfg.pipeline_stages, data=cfg.pipeline_data,
                tensor=cfg.pipeline_tensor, fsdp=cfg.pipeline_fsdp,
            )
            self.params = shard_params_pipeline(self.params, pp_mesh)
            num_mb = cfg.pipeline_microbatches
            if not num_mb:
                # default: as many microbatches as stages (smallest bubble),
                # capped to what the batch actually divides into
                import math

                num_mb = math.gcd(cfg.batch_size, cfg.pipeline_stages)
            # fail at init, not minutes later inside the first grad_step
            if cfg.batch_size % num_mb != 0:
                raise ValueError(
                    f"batch_size={cfg.batch_size} not divisible by "
                    f"pipeline_microbatches={num_mb}"
                )
            if (cfg.batch_size // num_mb) % cfg.pipeline_data != 0:
                raise ValueError(
                    f"microbatch size {cfg.batch_size // num_mb} not divisible "
                    f"by pipeline_data={cfg.pipeline_data}"
                )
            data_axis = "data" if cfg.pipeline_data > 1 else None
            self.pp = (pp_mesh, "pipe", num_mb, data_axis)
            print(
                f"[trainer] pipeline mesh=(data={cfg.pipeline_data},"
                f" pipe={cfg.pipeline_stages}, fsdp={cfg.pipeline_fsdp},"
                f" tensor={cfg.pipeline_tensor}) microbatches={num_mb}"
            )

        schedule = make_lr_schedule(cfg.scheduler_type, cfg.lr, cfg.steps)
        self.optimizer = make_optimizer(
            learning_rate=schedule,
            weight_decay=cfg.weight_decay,
            max_grad_norm=cfg.max_grad_norm,
            trainable_mask=trainable,
        )
        self.opt_state = self.optimizer.init(self.params)
        self.start_step = 0

        if cfg.resume:
            latest = ckpt.latest_checkpoint(Path(cfg.output_dir))
            if latest is not None:
                self.params, self.opt_state, self.start_step = ckpt.load_train_checkpoint(
                    latest, self.params, self.opt_state
                )
                print(f"[trainer] Resumed from {latest} at step {self.start_step}")

        self._init_wandb()

    # -- setup ------------------------------------------------------------

    def _load_dataset(self):
        cfg = self.cfg
        if cfg.data_root:
            sources = cfg.data_sources
            if sources is None:
                sources = {"latents": "latents", "conditions": "conditions"}
                if cfg.with_audio:
                    sources[cfg.audio_latents_dir] = "audio_latents"
                if cfg.strategy == "video_to_video":
                    sources[cfg.reference_latents_dir] = "ref_latents"
            return PrecomputedDataset(cfg.data_root, sources)
        return DummyDataset(
            width=cfg.dummy_width,
            height=cfg.dummy_height,
            num_frames=cfg.dummy_num_frames,
            prompt_sequence_length=cfg.dummy_prompt_len,
            with_audio=cfg.with_audio,
            with_reference=cfg.strategy == "video_to_video",
        )

    def _load_params(self) -> dict:
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.mixed_precision_mode == "bf16" else jnp.float32
        path = Path(cfg.model_repo)
        if path.exists():
            files = [path] if path.is_file() else sorted(path.glob("*.safetensors"))
            # load_dit_params handles both PT/MLX-layout checkpoints (key
            # sanitizer) and our native-format output (transformer_step_N
            # etc.); cast only float leaves to the training dtype so
            # quantized (int8/aux) leaves keep their stored dtypes.
            params = load_dit_params(files, self.model_config, dtype=dtype, strict=False)

            def _cast(path, x):
                name = str(path[-1].key) if path and hasattr(path[-1], "key") else ""
                keep = name in ("int8_scale", "scales", "biases") or not jnp.issubdtype(
                    x.dtype, jnp.floating
                )
                return x if keep or x.dtype == dtype else jnp.asarray(x, dtype)

            return jax.tree_util.tree_map_with_path(_cast, params)
        raise FileNotFoundError(
            f"Model weights not found at {cfg.model_repo}; pass params= for in-memory init."
        )

    def _init_wandb(self) -> None:
        if not self.cfg.wandb_enabled:
            return
        try:
            import wandb

            wandb.init(
                project=self.cfg.wandb_project,
                entity=self.cfg.wandb_entity,
                tags=list(self.cfg.wandb_tags) if self.cfg.wandb_tags else None,
                config={"strategy": self.cfg.strategy, "steps": self.cfg.steps, "lr": self.cfg.lr},
            )
            # only after init succeeds: a failed init (no API key, no
            # network) must leave _wandb unset or the first log() call
            # would abort the whole training run
            self._wandb = wandb
        except Exception:
            print("[trainer] W&B requested but unavailable.")

    # -- loop -------------------------------------------------------------

    def _prepare(self, batch: Batch):
        if self.cfg.strategy == "video_to_video":
            return prepare_video_to_video(batch)
        return prepare_text_to_video(batch, with_audio=self.cfg.with_audio)

    def train(self) -> float:
        from mlx_video_tpu.parallel.distributed import PreemptionGuard

        guard = PreemptionGuard()
        if self.cfg.handle_preemption:
            guard.install()
        try:
            return self._train_loop(guard)
        finally:
            guard.uninstall()

    def _train_loop(self, guard) -> float:
        cfg = self.cfg
        key = jax.random.key(cfg.seed)
        accum_steps = max(1, cfg.grad_accum_steps)
        accum = None
        save_pending = False
        last_loss = float("nan")
        from collections import deque

        # recent per-step losses (bounded; tests assert stream-exact resume)
        self.loss_history = deque(maxlen=4096)

        if (
            cfg.validation_interval
            and self.validation_fn is not None
            and not cfg.validation_skip_initial
            and self.start_step == 0
        ):
            self.validation_fn(self.params, 0)

        # Stream-exact resume: one batch == one step, and both the epoch
        # position and the per-step RNG derive from the step counter alone —
        # a resumed run consumes the SAME batches with the SAME noise keys
        # the uninterrupted run would have, with no iterator state in the
        # checkpoint (the TPU-native answer to SURVEY §5's
        # "optimizer state + data-iterator state"). The skipped prefix of
        # the resume epoch is dropped by index math (no file reads).
        from mlx_video_tpu.trainer.datasets import num_batches_per_epoch

        spe = max(1, num_batches_per_epoch(self.dataset, cfg.batch_size))
        step = self.start_step
        epoch = step // spe
        while step < cfg.steps:
            for batch in iter_batches(
                self.dataset, cfg.batch_size, shuffle=True, seed=cfg.seed + epoch,
                skip=(step % spe) if step == self.start_step else 0,
            ):
                if step >= cfg.steps:
                    break
                t0 = time.time()
                sb = self._prepare(batch)
                if self.mesh is not None and cfg.batch_size % self.mesh.shape["data"] == 0:
                    from mlx_video_tpu.parallel.sharding import shard_batch

                    sb = shard_batch(sb, self.mesh)
                # Step-derived key (not a sequential split chain): the noise
                # at step N is identical whether the run was interrupted or
                # not — RNG state needs no checkpointing.
                sub = jax.random.fold_in(key, step)
                loss, grads = grad_step(
                    self.params, sb, sub, self.model_config,
                    first_frame_conditioning_p=cfg.first_frame_conditioning_p,
                    timestep_sampling_mode=cfg.timestep_sampling_mode,
                    timestep_sampling_std=cfg.timestep_sampling_std,
                    sp=self.sp,
                    pp=self.pp,
                )
                if accum is None:
                    accum, accum_count = grads, 1
                else:
                    accum, accum_count = accumulate_grads(accum, grads), accum_count + 1

                if (step + 1) % accum_steps == 0:
                    self.params, self.opt_state = apply_updates(
                        self.params, self.opt_state, accum, self.optimizer, accum_steps
                    )
                    accum = None

                last_loss = float(loss)
                self.loss_history.append(last_loss)
                if step % cfg.log_every == 0:
                    msg = f"step {step}: loss={last_loss:.6f}"
                    if cfg.debug:
                        msg += f" | step_time={time.time() - t0:.2f}s"
                    print(msg)
                    if self._wandb is not None:
                        self._wandb.log({"loss": last_loss, "step": step}, step=step)

                if (
                    cfg.validation_interval
                    and self.validation_fn is not None
                    and step > 0
                    and step % cfg.validation_interval == 0
                ):
                    self.validation_fn(self.params, step)
                step += 1
                # Periodic saves AFTER the increment: a checkpoint's step
                # label means "steps completed", matching the preemption and
                # final saves — resume then starts at the NEXT batch instead
                # of re-applying an already-applied gradient (the pre-
                # increment version replayed one step on resume).
                # Only at accumulation-window boundaries (accum is None): a
                # checkpoint taken mid-window cannot carry the partial
                # gradient sum, so resuming from it would silently drop
                # g_0..g_i of the window — the same exact-resume hazard the
                # preemption save below guards against. A save that lands
                # mid-window is deferred to the next boundary (at most
                # accum_steps-1 steps later).
                if cfg.save_every and step % cfg.save_every == 0:
                    save_pending = True
                if save_pending and accum is None and step < cfg.steps:
                    save_pending = False
                    self.save_checkpoint(step)
                    ckpt.prune_checkpoints(Path(cfg.output_dir), cfg.checkpoint_keep_last_n)
                # Preemption (SIGTERM): every host agrees on the stop step,
                # checkpoints it exactly, and exits cleanly — restart with
                # cfg.resume picks up from here (parallel/distributed.py).
                # Only honored at accumulation-window boundaries (accum is
                # None): stopping mid-window would drop the partial gradient
                # sum and break the exact-resume contract; the deferral is
                # bounded by accum_steps-1 steps. should_checkpoint(step)
                # also rate-limits the multi-host agreement collective.
                if cfg.handle_preemption and accum is None and guard.should_checkpoint(step):
                    self.save_checkpoint(step)
                    ckpt.prune_checkpoints(Path(cfg.output_dir), cfg.checkpoint_keep_last_n)
                    marker = Path(cfg.output_dir) / "PREEMPTED"
                    marker.parent.mkdir(parents=True, exist_ok=True)
                    marker.write_text(str(step))
                    print(f"[trainer] preempted: saved step {step}, exiting for restart")
                    return last_loss
            epoch += 1

        if accum is not None:
            # final PARTIAL window: divide by the microbatches actually
            # accumulated, not the full accum_steps (which would underweight
            # the last update by accum_count/accum_steps)
            self.params, self.opt_state = apply_updates(
                self.params, self.opt_state, accum, self.optimizer, accum_count
            )
        self.save_checkpoint(cfg.steps)
        ckpt.prune_checkpoints(Path(cfg.output_dir), cfg.checkpoint_keep_last_n)
        return last_loss

    # -- checkpointing ----------------------------------------------------

    def save_checkpoint(self, step: int) -> None:
        """LoRA adapters / full weights + full resume state
        (reference: trainer.py:650-660 + optimizer-state extension).

        Multi-host: every process must call this (the shard gathers are
        collectives); only process 0 writes files.
        """
        out_dir = Path(self.cfg.output_dir)
        # Gather non-addressable shards to full host arrays BEFORE the
        # export writers call np.asarray (which raises on sharded leaves).
        needs_gather = any(
            isinstance(l, jax.Array) and not l.is_fully_addressable
            for l in jax.tree.leaves(self.params)
        )
        params = (
            jax.tree.map(ckpt._to_host, self.params) if needs_gather else self.params
        )
        if jax.process_index() == 0:
            out_dir.mkdir(parents=True, exist_ok=True)
            if self.cfg.training_mode == "lora":
                save_lora(out_dir / f"lora_step_{step}.safetensors", params, self.model_config)
            else:
                flat = {k: np.asarray(v) for k, v in flatten_params(params).items()}
                save_safetensors(
                    out_dir / f"transformer_step_{step}.safetensors",
                    flat,
                    metadata={"format": "mlx_video_tpu"},
                )
        ckpt.save_train_checkpoint(
            out_dir / f"state_step_{step}.safetensors", self.params, self.opt_state, step
        )
