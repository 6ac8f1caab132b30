"""Training strategies: text-to-video and video-to-video (IC-LoRA).

Behavioral spec: reference mlx_video/mlx_trainer/training_strategies/
{base_strategy,text_to_video,video_to_video}.py:
- flow matching x_t = (1 - sigma) x + sigma eps, target v = eps - x;
- first-frame conditioning with probability p: conditioned tokens keep the
  CLEAN latent, timestep 0, and are excluded from the loss;
- V2V/IC-LoRA: clean reference latents are prepended on the sequence axis
  with their own position grid, always conditioned, loss-masked;
- loss = token-masked mean over sum-of-squared-channel error.

Split host/device: ``prepare_*`` builds static-shaped arrays host-side from
the batch dicts; ``make_inputs``/``compute_loss`` are jittable.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mlx_video_tpu.config import LTXModelConfig
from mlx_video_tpu.models.ltx.model import Modality, ltx_apply
from mlx_video_tpu.pipelines.positions import create_audio_position_grid, create_position_grid
from mlx_video_tpu.pipelines.schedulers import BASE_SHIFT_ANCHOR, MAX_SHIFT_ANCHOR

DEFAULT_FPS = 24.0


class StrategyBatch(NamedTuple):
    """Static-shaped arrays cut from a dataset Batch (host-side prepare)."""

    video_latents: jax.Array  # (B, S, C) patchified clean latents
    positions: jax.Array  # (B, 3, S, 2)
    context: jax.Array  # (B, S_ctx, D_ctx)
    context_mask: Optional[jax.Array]  # (B, S_ctx) bool
    first_frame_token_mask: jax.Array  # (B, S) bool: tokens of frame 0
    # bool (B, S): tokens that are ALWAYS conditioned (V2V reference tokens);
    # kept as an array (not an int) so the whole StrategyBatch is a jit-able
    # pytree with no static leaves.
    always_conditioned_mask: jax.Array
    audio_latents: Optional[jax.Array] = None  # (B, T, C*M)
    audio_positions: Optional[jax.Array] = None
    audio_context: Optional[jax.Array] = None


class ModelInputs(NamedTuple):
    video: Modality
    audio: Optional[Modality]
    video_targets: jax.Array
    audio_targets: Optional[jax.Array]
    video_loss_mask: jax.Array
    audio_loss_mask: Optional[jax.Array]


def patchify_video_latents(latents: np.ndarray) -> np.ndarray:
    """(B, C, F, H, W) -> (B, F*H*W, C) (reference: base_strategy.py:57-63)."""
    while latents.ndim > 5 and latents.shape[1] == 1:
        latents = latents.squeeze(1)
    b, c, f, h, w = latents.shape
    return np.transpose(latents, (0, 2, 3, 4, 1)).reshape(b, f * h * w, c)


def patchify_audio_latents(latents: np.ndarray) -> np.ndarray:
    """(B, C, T, M) -> (B, T, C*M) (reference: base_strategy.py:65-70)."""
    while latents.ndim > 4 and latents.shape[1] == 1:
        latents = latents.squeeze(1)
    b, c, t, m = latents.shape
    return np.transpose(latents, (0, 2, 1, 3)).reshape(b, t, c * m)


def _dims(lat: Dict[str, Any]) -> Tuple[int, int, int, float]:
    f = int(np.asarray(lat["num_frames"]).reshape(-1)[0])
    h = int(np.asarray(lat["height"]).reshape(-1)[0])
    w = int(np.asarray(lat["width"]).reshape(-1)[0])
    fps = float(np.asarray(lat.get("fps", [DEFAULT_FPS])).reshape(-1)[0])
    return f, h, w, fps


def _context(cond: Dict[str, Any]) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    embeds = cond.get("video_prompt_embeds", cond.get("prompt_embeds"))
    if embeds is None:
        raise ValueError("Missing prompt embeddings in conditions")
    embeds = np.asarray(embeds, dtype=np.float32)
    if embeds.ndim == 2:
        embeds = embeds[None]
    mask = cond.get("prompt_attention_mask")
    if mask is not None:
        mask = np.asarray(mask)
        if mask.ndim == 1:
            mask = mask[None]
    return embeds, mask


def _first_frame_token_mask(b: int, f: int, h: int, w: int) -> np.ndarray:
    mask = np.zeros((b, f, h, w), dtype=bool)
    mask[:, 0] = True
    return mask.reshape(b, f * h * w)


def prepare_text_to_video(batch, with_audio: bool = False) -> StrategyBatch:
    """Host-side batch prep for the T2V strategy (reference: text_to_video.py:35-127)."""
    lat = batch.latents
    f, h, w, fps = _dims(lat)
    video = patchify_video_latents(np.asarray(lat["latents"], dtype=np.float32))
    b = video.shape[0]
    context, context_mask = _context(batch.conditions)
    positions = create_position_grid(b, f, h, w, fps=fps)

    audio_lat = audio_pos = audio_ctx = None
    if with_audio and batch.audio_latents is not None:
        audio_lat = patchify_audio_latents(np.asarray(batch.audio_latents["latents"], np.float32))
        audio_pos = create_audio_position_grid(b, audio_lat.shape[1])
        a_embeds = batch.conditions.get("audio_prompt_embeds")
        audio_ctx = np.asarray(
            a_embeds if a_embeds is not None else context, dtype=np.float32
        )
        if audio_ctx.ndim == 2:
            audio_ctx = audio_ctx[None]

    return StrategyBatch(
        video_latents=jnp.asarray(video),
        positions=jnp.asarray(positions),
        context=jnp.asarray(context),
        context_mask=jnp.asarray(context_mask) if context_mask is not None else None,
        first_frame_token_mask=jnp.asarray(_first_frame_token_mask(b, f, h, w)),
        always_conditioned_mask=jnp.zeros((b, video.shape[1]), dtype=bool),
        audio_latents=jnp.asarray(audio_lat) if audio_lat is not None else None,
        audio_positions=jnp.asarray(audio_pos) if audio_pos is not None else None,
        audio_context=jnp.asarray(audio_ctx) if audio_ctx is not None else None,
    )


def prepare_video_to_video(batch) -> StrategyBatch:
    """Host-side batch prep for V2V/IC-LoRA: reference latents prepended on
    the token axis (reference: video_to_video.py:30-120)."""
    lat, ref = batch.latents, batch.ref_latents
    if ref is None:
        raise ValueError("video_to_video strategy requires reference_latents")
    f, h, w, fps = _dims(lat)
    rf, rh, rw, _ = _dims(ref)
    target = patchify_video_latents(np.asarray(lat["latents"], np.float32))
    reference = patchify_video_latents(np.asarray(ref["latents"], np.float32))
    b = target.shape[0]
    ref_seq_len = reference.shape[1]
    context, context_mask = _context(batch.conditions)

    positions = np.concatenate(
        [
            create_position_grid(b, rf, rh, rw, fps=fps),
            create_position_grid(b, f, h, w, fps=fps),
        ],
        axis=2,
    )
    combined = np.concatenate([reference, target], axis=1)
    ff_mask = np.concatenate(
        [np.zeros((b, ref_seq_len), dtype=bool), _first_frame_token_mask(b, f, h, w)], axis=1
    )

    return StrategyBatch(
        video_latents=jnp.asarray(combined),
        positions=jnp.asarray(positions),
        context=jnp.asarray(context),
        context_mask=jnp.asarray(context_mask) if context_mask is not None else None,
        first_frame_token_mask=jnp.asarray(ff_mask),
        always_conditioned_mask=jnp.asarray(
            np.concatenate(
                [np.ones((b, ref_seq_len), dtype=bool), np.zeros((b, target.shape[1]), dtype=bool)],
                axis=1,
            )
        ),
    )


def sample_sigmas(
    key: jax.Array, batch: int, seq_len: int, mode: str = "uniform", std: float = 1.0
) -> jax.Array:
    """Timestep samplers (reference: timestep_samplers.py:10-55)."""
    if mode == "shifted_logit_normal":
        m = (2.05 - 0.95) / (MAX_SHIFT_ANCHOR - BASE_SHIFT_ANCHOR)
        shift = m * seq_len + (0.95 - m * BASE_SHIFT_ANCHOR)
        return jax.nn.sigmoid(jax.random.normal(key, (batch,)) * std + shift)
    return jax.random.uniform(key, (batch,))


def make_inputs(
    sb: StrategyBatch,
    key: jax.Array,
    first_frame_conditioning_p: float = 0.1,
    timestep_sampling_mode: str = "uniform",
    timestep_sampling_std: float = 1.0,
) -> ModelInputs:
    """Jittable: sample sigma/noise, noise the latents, build Modalities.

    Conditioned tokens (all reference tokens + first-frame tokens with prob
    p) keep the clean latent, get timestep 0, and are loss-masked
    (reference: text_to_video.py:72-98, video_to_video.py:76-120).
    """
    k_sigma, k_noise, k_keep, k_anoise = jax.random.split(key, 4)
    video = sb.video_latents
    b, s, c = video.shape

    sigmas = sample_sigmas(k_sigma, b, s, timestep_sampling_mode, timestep_sampling_std)

    # first-frame conditioning applied per-sample with probability p
    keep = jax.random.uniform(k_keep, (b, 1)) < first_frame_conditioning_p
    ff_mask = jnp.logical_and(sb.first_frame_token_mask, keep)
    cond_mask = jnp.logical_or(ff_mask, sb.always_conditioned_mask)

    noise = jax.random.normal(k_noise, video.shape, dtype=jnp.float32)
    sig = sigmas[:, None, None]
    noisy = (1.0 - sig) * video + sig * noise
    noisy = jnp.where(cond_mask[..., None], video, noisy)
    targets = noise - video
    # reference tokens carry zero targets (loss-masked anyway)
    targets = jnp.where(cond_mask[..., None], jnp.zeros_like(targets), targets)

    timesteps = jnp.where(cond_mask, 0.0, jnp.broadcast_to(sigmas[:, None], (b, s)))

    video_mod = Modality(
        # The noising math above runs in an fp32 island (noise is fp32, so
        # `noisy` promotes); cast back at the model boundary or a bf16 model
        # sees an fp32 query against a bf16 context key and attention
        # rejects the mixed dtypes. Targets deliberately STAY fp32 for the
        # loss (pred is upcast there).
        latent=noisy.astype(video.dtype),
        timesteps=timesteps.astype(video.dtype),
        context=sb.context,
        context_mask=sb.context_mask,
        positions=sb.positions,
    )

    audio_mod = audio_targets = audio_mask = None
    if sb.audio_latents is not None:
        a = sb.audio_latents
        ab, at, _ = a.shape
        a_noise = jax.random.normal(k_anoise, a.shape, dtype=jnp.float32)
        a_sig = sigmas[:, None, None]
        a_noisy = (1.0 - a_sig) * a + a_sig * a_noise
        audio_targets = a_noise - a
        audio_mod = Modality(
            latent=a_noisy.astype(a.dtype),  # fp32 noise island -> model dtype
            timesteps=jnp.broadcast_to(sigmas[:, None], (ab, at)).astype(a.dtype),
            context=sb.audio_context,
            context_mask=sb.context_mask,
            positions=sb.audio_positions,
        )
        audio_mask = jnp.ones((ab, at), dtype=bool)

    return ModelInputs(
        video=video_mod,
        audio=audio_mod,
        video_targets=targets,
        audio_targets=audio_targets,
        video_loss_mask=jnp.logical_not(cond_mask),
        audio_loss_mask=audio_mask,
    )


def _model_compute_dtype(params: dict):
    """The transformer's compute dtype, probed from a leaf that is dense
    float in every mode (full / LoRA / quantized-base): the adaLN
    scale-shift table."""
    for top in ("video", "audio"):
        sub = params.get(top)
        if isinstance(sub, dict) and "scale_shift_table" in sub:
            return sub["scale_shift_table"].dtype
    for leaf in jax.tree.leaves(params):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf.dtype
    return jnp.float32


def _cast_inputs_to_model_dtype(inputs: "ModelInputs", params: dict) -> "ModelInputs":
    """Cast model-bound activations to the parameter dtype at the boundary.

    The noising math runs in an fp32 island and datasets deliver fp32
    latents/embeddings; feeding those to a bf16 model would either crash
    (fp32 query vs bf16 context key in attention rejects mixed dtypes) or
    silently promote every matmul to fp32, forfeiting bf16 MXU rate and
    doubling activation memory. Loss targets/masks stay fp32 — only what
    the transformer consumes is cast."""
    dtype = _model_compute_dtype(params)

    def cast_mod(mod):
        if mod is None:
            return None
        return mod._replace(
            latent=mod.latent.astype(dtype),
            timesteps=mod.timesteps.astype(dtype),
            context=None if mod.context is None else mod.context.astype(dtype),
        )

    return inputs._replace(video=cast_mod(inputs.video), audio=cast_mod(inputs.audio))


def compute_loss(
    video_pred: jax.Array,
    audio_pred: Optional[jax.Array],
    inputs: ModelInputs,
) -> jax.Array:
    """Token-masked mean of channel-summed squared error
    (reference: base_strategy.py:40-54)."""
    v = jnp.sum(jnp.square(video_pred.astype(jnp.float32) - inputs.video_targets), axis=-1)
    v = jnp.where(inputs.video_loss_mask, v, 0.0)
    loss = jnp.sum(v) / jnp.maximum(jnp.sum(inputs.video_loss_mask), 1)
    if audio_pred is not None and inputs.audio_targets is not None:
        a = jnp.sum(jnp.square(audio_pred.astype(jnp.float32) - inputs.audio_targets), axis=-1)
        a = jnp.where(inputs.audio_loss_mask, a, 0.0)
        loss = loss + jnp.sum(a) / jnp.maximum(jnp.sum(inputs.audio_loss_mask), 1)
    return loss


def strategy_loss_fn(
    params: dict,
    config: LTXModelConfig,
    sb: StrategyBatch,
    key: jax.Array,
    first_frame_conditioning_p: float = 0.1,
    timestep_sampling_mode: str = "uniform",
    timestep_sampling_std: float = 1.0,
    sp=None,
    pp=None,
) -> jax.Array:
    """Full jittable loss: inputs -> model forward -> masked MSE.

    ``sp``: optional (Mesh, axis) — sequence-parallel ring attention inside
    the forward (long-video training; see models/ltx/model.py).
    ``pp``: optional (Mesh, axis, num_microbatches[, data_axis]) — GPipe
    pipeline parallelism over the block stack (parallel/pipeline.py);
    mutually exclusive with ``sp`` (ring attention inside a pipeline stage
    is not composed in this version).
    """
    inputs = make_inputs(
        sb, key, first_frame_conditioning_p, timestep_sampling_mode, timestep_sampling_std
    )
    inputs = _cast_inputs_to_model_dtype(inputs, params)
    if pp is not None:
        if sp is not None:
            raise ValueError("sp (ring attention) and pp (pipeline) are mutually exclusive")
        from mlx_video_tpu.parallel.pipeline import apply_from_tuple

        v_pred, a_pred = apply_from_tuple(pp)(
            params, config, video=inputs.video, audio=inputs.audio
        )
    else:
        v_pred, a_pred = ltx_apply(params, config, video=inputs.video, audio=inputs.audio, sp=sp)
    return compute_loss(v_pred, a_pred, inputs)
