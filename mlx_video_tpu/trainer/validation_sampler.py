"""Validation sampling during training.

Behavioral spec: reference mlx_video/mlx_trainer/validation_sampler.py:13-100
(wraps generate_video per prompt/image/reference-video). The sampler holds a
ModelBundle whose transformer params are swapped for the in-training params
each call — weights stay resident, no reload churn.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Optional, Sequence

import jax.numpy as jnp


class ValidationSampler:
    def __init__(
        self,
        models,
        text_encoder=None,
        output_dir: Path = Path("./validation"),
        prompts: Sequence[str] = (),
        negative_prompt: str = "",
        width: int = 512,
        height: int = 512,
        num_frames: int = 33,
        steps: int = 8,
        cfg_scale: float = 4.0,
        fps: float = 24.0,
        seed: int = 0,
        pipeline: str = "distilled",
        images: Optional[Sequence[str]] = None,
        precomputed_text=None,
    ):
        self.models = models
        self.text_encoder = text_encoder
        self.precomputed_text = precomputed_text
        self.output_dir = Path(output_dir)
        self.prompts = list(prompts)
        self.negative_prompt = negative_prompt
        self.width, self.height = width, height
        self.num_frames, self.steps = num_frames, steps
        self.cfg_scale, self.fps, self.seed = cfg_scale, fps, seed
        self.pipeline = pipeline
        self.images = list(images or [])

    def __call__(self, params: dict, step: int) -> list:
        """Generate one validation clip per prompt with the given params."""
        from mlx_video_tpu.pipelines.generate import (
            PipelineType,
            TextConditioning,
            generate_video,
        )

        self.output_dir.mkdir(parents=True, exist_ok=True)
        models = dataclasses.replace(self.models, transformer_params=params)
        outputs = []
        for i, prompt in enumerate(self.prompts):
            if self.precomputed_text is not None:
                text = self.precomputed_text[i] if isinstance(self.precomputed_text, list) else self.precomputed_text
            elif self.text_encoder is not None:
                video_emb, audio_emb = self.text_encoder.encode(prompt)
                neg = None
                if self.negative_prompt:
                    neg, _ = self.text_encoder.encode(self.negative_prompt)
                text = TextConditioning(
                    video_embeddings=video_emb,
                    video_neg_embeddings=neg,
                    audio_embeddings=audio_emb,
                )
            else:
                raise ValueError("ValidationSampler needs a text encoder or precomputed text")
            out = self.output_dir / f"step_{step}_prompt_{i}.mp4"
            images = [(self.images[i], 0, 1.0)] if i < len(self.images) else []
            generate_video(
                models,
                text,
                prompt=prompt,
                height=self.height,
                width=self.width,
                num_frames=self.num_frames,
                fps=self.fps,
                seed=self.seed,
                pipeline=PipelineType(self.pipeline),
                stage1_steps=min(self.steps, 8),
                num_inference_steps=self.steps,
                cfg_scale=self.cfg_scale,
                images=images,
                output_path=out,
                tiling="none",
            )
            outputs.append(out)
        return outputs
