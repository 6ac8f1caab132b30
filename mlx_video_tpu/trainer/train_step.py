"""Jit-compiled flow-matching training step.

Behavioral spec: reference mlx_video/mlx_trainer/training_strategies/
text_to_video.py:35-127 (x_t = (1-sigma)x + sigma*eps, target v = eps - x,
first-frame conditioning mask, masked MSE) and trainer.py:546-648 (grad
accumulation / clip / AdamW update).

TPU-native: the whole step (noising, forward, loss, grad, clip, optimizer
update) is one jitted function, shardable over a (data, fsdp, tensor) mesh
by annotating params and batch (parallel/sharding.py).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from mlx_video_tpu.config import LTXModelConfig
from mlx_video_tpu.models.ltx.model import Modality, ltx_apply
from mlx_video_tpu.pipelines.denoise import flatten_video_latents, precompute_video_pe


class TrainBatch(NamedTuple):
    """Precomputed-latent training batch.

    latents:   (B, C, F, H, W) clean video latents
    positions: (B, 3, S, 2) RoPE position grid
    context:   (B, S_ctx, caption_channels) text embeddings
    """

    latents: jax.Array
    positions: jax.Array
    context: jax.Array


def flow_matching_loss(
    params: dict,
    config: LTXModelConfig,
    batch: TrainBatch,
    noise: jax.Array,
    sigmas: jax.Array,
    loss_mask: Optional[jax.Array] = None,
    first_frame_conditioned: Optional[jax.Array] = None,
) -> jax.Array:
    """Masked flow-matching MSE (reference: text_to_video.py:35-127).

    sigmas: (B,) per-sample noise levels.
    first_frame_conditioned: optional (B,) 0/1 — when 1, the first latent
    frame's timestep is zeroed and its loss masked (I2V conditioning during
    training).
    """
    latents = batch.latents
    b, c, f, h, w = latents.shape
    s = f * h * w
    dtype = latents.dtype

    sig = sigmas.reshape(b, 1, 1, 1, 1).astype(jnp.float32)
    lat32 = latents.astype(jnp.float32)
    noise32 = noise.astype(jnp.float32)
    noisy = ((1.0 - sig) * lat32 + sig * noise32).astype(dtype)
    target = (noise32 - lat32).astype(jnp.float32)

    timesteps = jnp.broadcast_to(sigmas.astype(dtype)[:, None], (b, s))
    frame_mask = jnp.ones((b, s), dtype=jnp.float32)
    if first_frame_conditioned is not None:
        per_frame = jnp.ones((b, f), dtype=jnp.float32)
        per_frame = per_frame.at[:, 0].set(1.0 - first_frame_conditioned.astype(jnp.float32))
        per_token = jnp.repeat(per_frame, h * w, axis=1)
        timesteps = timesteps * per_token.astype(dtype)
        frame_mask = per_token

    tokens = flatten_video_latents(noisy)
    vel, _ = ltx_apply(
        params,
        config,
        video=Modality(
            latent=tokens, timesteps=timesteps, context=batch.context, positions=batch.positions
        ),
    )
    vel = jnp.transpose(vel, (0, 2, 1)).reshape(b, c, f, h, w).astype(jnp.float32)

    err = jnp.square(vel - target)
    mask5 = frame_mask.reshape(b, 1, f, h, w)
    if loss_mask is not None:
        mask5 = mask5 * loss_mask.astype(jnp.float32)
    return jnp.sum(err * mask5) / jnp.maximum(jnp.sum(mask5) * c, 1.0)


def sample_shifted_logit_normal(
    key: jax.Array, batch: int, num_tokens: int, std: float = 1.0
) -> jax.Array:
    """Shifted logit-normal timestep sampler with the seq-len-dependent shift
    (reference: mlx_trainer/timestep_samplers.py:10-55, trainer.py:357-369;
    anchors at generate.py:343-344)."""
    import math

    from mlx_video_tpu.pipelines.schedulers import BASE_SHIFT_ANCHOR, MAX_SHIFT_ANCHOR

    tokens = min(num_tokens, MAX_SHIFT_ANCHOR)
    mm = (2.05 - 0.95) / (MAX_SHIFT_ANCHOR - BASE_SHIFT_ANCHOR)
    shift = tokens * mm + (0.95 - mm * BASE_SHIFT_ANCHOR)
    normal = jax.random.normal(key, (batch,)) * std + shift
    return jax.nn.sigmoid(normal)


def make_optimizer(
    learning_rate=1e-4, weight_decay: float = 0.01, max_grad_norm: Optional[float] = 1.0,
    b1: float = 0.9, b2: float = 0.999,
) -> optax.GradientTransformation:
    """AdamW with global-norm clipping (reference: trainer.py:297-326)."""
    chain = []
    if max_grad_norm is not None:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(optax.adamw(learning_rate, b1=b1, b2=b2, weight_decay=weight_decay))
    return optax.chain(*chain)


@partial(jax.jit, static_argnames=("config", "optimizer"), donate_argnums=(0, 1))
def train_step(
    params: dict,
    opt_state,
    config: LTXModelConfig,
    optimizer: optax.GradientTransformation,
    batch: TrainBatch,
    key: jax.Array,
) -> Tuple[dict, object, jax.Array]:
    """One full training step: sample sigma/noise -> loss -> grad -> update."""
    b = batch.latents.shape[0]
    s = batch.positions.shape[2]
    k_noise, k_sigma = jax.random.split(key)
    noise = jax.random.normal(k_noise, batch.latents.shape, dtype=jnp.float32)
    sigmas = sample_shifted_logit_normal(k_sigma, b, s)

    loss, grads = jax.value_and_grad(flow_matching_loss)(params, config, batch, noise, sigmas)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss
