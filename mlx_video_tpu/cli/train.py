"""``python -m mlx_video_tpu.cli.train`` — LoRA / full finetune CLI.

Flag surface mirrors the reference trainer CLI
(reference: mlx_video/mlx_trainer/trainer.py:744-898); also accepts LTX-2
style YAML configs via ``--config``.
"""

from __future__ import annotations

import argparse
from dataclasses import fields
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="LTX-2 trainer (TPU)")
    p.add_argument("--config", default=None, help="LTX-2-schema YAML config")
    p.add_argument("--model-repo", default="Lightricks/LTX-2")
    p.add_argument("--pipeline", default="dev", choices=["dev", "distilled"])
    p.add_argument("--training-mode", default="full", choices=["full", "lora"])
    p.add_argument("--strategy", default="text_to_video",
                   choices=["text_to_video", "video_to_video", "ic_lora"])
    p.add_argument("--with-audio", action="store_true")
    p.add_argument("--data-root", default=None)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--output-dir", default="./checkpoints")
    p.add_argument("--save-every", type=int, default=100)
    p.add_argument("--keep-last-n", type=int, default=-1)
    p.add_argument("--lora-rank", type=int, default=8)
    p.add_argument("--lora-alpha", type=float, default=16.0)
    p.add_argument("--grad-accum-steps", type=int, default=1)
    p.add_argument("--max-grad-norm", type=float, default=1.0)
    p.add_argument("--scheduler-type", default="constant",
                   choices=["constant", "linear", "cosine"])
    p.add_argument("--timestep-sampling-mode", default="uniform",
                   choices=["uniform", "shifted_logit_normal"])
    p.add_argument("--first-frame-conditioning-p", type=float, default=0.1)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--debug", action="store_true")
    p.add_argument("--mesh", default=None, help="data,fsdp,tensor mesh shape, e.g. 1,1,8")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    from mlx_video_tpu.trainer.config import TrainingConfig, load_training_config
    from mlx_video_tpu.trainer.trainer import Trainer

    if args.config:
        cfg = load_training_config(Path(args.config))
    else:
        cfg = TrainingConfig(
            model_repo=args.model_repo,
            pipeline=args.pipeline,
            training_mode=args.training_mode,
            strategy="video_to_video" if args.strategy == "ic_lora" else args.strategy,
            with_audio=args.with_audio,
            data_root=args.data_root,
            batch_size=args.batch_size,
            steps=args.steps,
            lr=args.lr,
            seed=args.seed,
            output_dir=args.output_dir,
            save_every=args.save_every,
            checkpoint_keep_last_n=args.keep_last_n,
            lora_rank=args.lora_rank,
            lora_alpha=args.lora_alpha,
            grad_accum_steps=args.grad_accum_steps,
            max_grad_norm=args.max_grad_norm,
            scheduler_type=args.scheduler_type,
            timestep_sampling_mode=args.timestep_sampling_mode,
            first_frame_conditioning_p=args.first_frame_conditioning_p,
            resume=args.resume,
            debug=args.debug,
            mesh_shape=[int(x) for x in args.mesh.split(",")] if args.mesh else None,
        )

    trainer = Trainer(cfg)
    final_loss = trainer.train()
    print(f"Training complete. final loss={final_loss:.6f}")


if __name__ == "__main__":
    main()
