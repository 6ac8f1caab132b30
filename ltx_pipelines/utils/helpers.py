"""Denoising-loop helpers over LatentState (parity API, JAX-native).

Behavioral spec: reference ltx_pipelines/utils/helpers.py:29-382 (euler loop,
gradient-estimating euler loop, state noising, modality construction).
"""

from __future__ import annotations

from dataclasses import replace
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ltx_core.components.protocols import DiffusionStepProtocol, Noiser
from ltx_core.types import LatentState
from ltx_core.utils import to_denoised, to_velocity
from mlx_video_tpu.models.ltx.model import Modality


def get_device() -> str:
    return str(jax.devices()[0])


def cleanup_memory() -> None:
    """XLA manages HBM; nothing to juggle (reference calls mx.clear_cache)."""


def post_process_latent(denoised: jax.Array, denoise_mask: jax.Array, clean: jax.Array) -> jax.Array:
    """Blend denoised with clean by the denoise mask (reference: helpers.py:234-236)."""
    mask = denoise_mask.astype(denoised.dtype)
    return denoised * mask + clean.astype(denoised.dtype) * (1.0 - mask)


def timesteps_from_mask(denoise_mask: jax.Array, sigma) -> jax.Array:
    """(B, S, 1)-mask -> per-token sigma (reference: helpers.py:251-253)."""
    return (denoise_mask[..., 0] if denoise_mask.ndim == 3 else denoise_mask) * sigma


def modality_from_latent_state(
    state: LatentState, context: jax.Array, sigma, context_mask=None
) -> Modality:
    """(reference: helpers.py:238-249)."""
    return Modality(
        latent=state.latent,
        timesteps=timesteps_from_mask(state.denoise_mask, sigma).astype(state.latent.dtype),
        positions=state.positions,
        context=context,
        context_mask=context_mask,
    )


def euler_denoising_loop(
    sigmas,
    video_state: LatentState,
    audio_state: LatentState,
    stepper: DiffusionStepProtocol,
    denoise_fn: Callable,
) -> Tuple[LatentState, LatentState]:
    """(reference: helpers.py:91-108)."""
    for step_idx in range(int(len(sigmas) - 1)):
        denoised_video, denoised_audio = denoise_fn(video_state, audio_state, sigmas, step_idx)
        denoised_video = post_process_latent(
            denoised_video, video_state.denoise_mask, video_state.clean_latent
        )
        denoised_audio = post_process_latent(
            denoised_audio, audio_state.denoise_mask, audio_state.clean_latent
        )
        video_state = replace(
            video_state, latent=stepper.execute(video_state.latent, denoised_video, sigmas, step_idx)
        )
        audio_state = replace(
            audio_state, latent=stepper.execute(audio_state.latent, denoised_audio, sigmas, step_idx)
        )
    return video_state, audio_state


def gradient_estimating_euler_denoising_loop(
    sigmas,
    video_state: LatentState,
    audio_state: LatentState,
    stepper: DiffusionStepProtocol,
    denoise_fn: Callable,
    ge_gamma: float = 2.0,
) -> Tuple[LatentState, LatentState]:
    """Gradient-estimating Euler: extrapolate with the velocity delta
    (reference: helpers.py:110-151)."""
    prev_v_vel = prev_a_vel = None

    def update(noisy, denoised, sigma, prev):
        current = to_velocity(noisy, denoised, sigma)
        if prev is not None:
            total = ge_gamma * (current - prev) + prev
            denoised = to_denoised(noisy, total, sigma)
        return current, denoised

    for step_idx in range(int(len(sigmas) - 1)):
        denoised_video, denoised_audio = denoise_fn(video_state, audio_state, sigmas, step_idx)
        denoised_video = post_process_latent(
            denoised_video, video_state.denoise_mask, video_state.clean_latent
        )
        denoised_audio = post_process_latent(
            denoised_audio, audio_state.denoise_mask, audio_state.clean_latent
        )
        if float(sigmas[step_idx + 1]) == 0:
            return (
                replace(video_state, latent=denoised_video),
                replace(audio_state, latent=denoised_audio),
            )
        prev_v_vel, denoised_video = update(
            video_state.latent, denoised_video, float(sigmas[step_idx]), prev_v_vel
        )
        prev_a_vel, denoised_audio = update(
            audio_state.latent, denoised_audio, float(sigmas[step_idx]), prev_a_vel
        )
        video_state = replace(
            video_state, latent=stepper.execute(video_state.latent, denoised_video, sigmas, step_idx)
        )
        audio_state = replace(
            audio_state, latent=stepper.execute(audio_state.latent, denoised_audio, sigmas, step_idx)
        )
    return video_state, audio_state


def noise_state(state: LatentState, noiser: Noiser, noise_scale: float = 1.0) -> LatentState:
    """Mask-scaled renoising of a state (reference: helpers.py:153-231)."""
    noise = noiser.noise(state.latent)
    mask = state.denoise_mask.astype(state.latent.dtype)
    # broadcast (B, 1, F, 1, 1) or (B, S, 1) masks over the latent
    while mask.ndim < state.latent.ndim:
        mask = mask[..., None]
    effective = noise_scale * mask.reshape(mask.shape[: state.latent.ndim])
    latent = noise * effective + state.latent * (1.0 - effective)
    return replace(state, latent=latent)


def clean_response(text: str) -> str:
    """Strip chat-template artifacts from enhanced prompts
    (reference: helpers.py:354-360)."""
    text = text.strip()
    for token in ("<start_of_turn>model", "<end_of_turn>", "<eos>"):
        text = text.replace(token, "")
    return text.strip().strip('"')


def assert_resolution(height: int, width: int, is_two_stage: bool) -> None:
    """(reference: helpers.py:382+)."""
    divisor = 64 if is_two_stage else 32
    if height % divisor or width % divisor:
        raise ValueError(f"height/width must be divisible by {divisor}, got {height}x{width}")
