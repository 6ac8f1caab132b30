"""End-to-end video generation orchestration.

Behavioral spec: reference mlx_video/generate.py:2035-4197 (generate_video):
dimension padding with crop-back, 1+8k frame rounding, distilled two-stage
(stage1 half-res -> 2x latent upsample -> renoise -> stage2 refine), dev
single-stage CFG, keyframe/IC-LoRA conditioning, tiled streaming decode into
an MP4 writer, joint/separate audio with vocoder decode and mux.

TPU-native design notes:
- All model weights stay resident (optionally sharded) instead of the
  reference's serial load/free choreography (generate.py:2853-3506) — HBM
  budgeting is a sharding concern, not a cache-juggling one.
- Text conditioning arrives as precomputed embeddings or a TextEncoder
  callable (SURVEY §7 step 4/5: the precomputed path is the first-class
  e2e slice; the Gemma encoder plugs into the same interface).
"""

from __future__ import annotations

import os
import threading
import time
from dataclasses import dataclass, field
from enum import Enum
from pathlib import Path
from typing import Callable, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from mlx_video_tpu.config import LTXModelConfig
from mlx_video_tpu.io import media
from mlx_video_tpu.models.ltx.upsampler import upsample_latents, upsample_latents_cl  # noqa: F401
from mlx_video_tpu.models.ltx.video_vae import ops as vae_ops
from mlx_video_tpu.models.ltx.video_vae.decoder import (
    DecoderConfig,
    video_decoder_apply,  # noqa: F401 (re-exported for callers composing in-graph)
    video_decoder_apply_chunked,
)
from mlx_video_tpu.models.ltx.video_vae.encoder import (  # noqa: F401
    video_encoder_apply,
    video_encoder_apply_cl,
    video_encoder_apply_cl_chunked,
)
from mlx_video_tpu.models.ltx.video_vae.tiling import TilingConfig, decode_with_tiling
from mlx_video_tpu.pipelines import denoise as dn
from mlx_video_tpu.pipelines.conditioning import (
    LatentState,
    VideoConditionByKeyframeIndex,
    VideoConditionByLatentIndex,
    add_noise_with_state,
    apply_conditioning,
)
from mlx_video_tpu.pipelines.positions import (
    AUDIO_LATENT_CHANNELS,
    AUDIO_MEL_BINS,
    compute_audio_frames,
    create_audio_position_grid,
    create_position_grid,
)
from mlx_video_tpu.pipelines.schedulers import (
    STAGE_1_SIGMAS,
    STAGE_2_SIGMAS,
    ltx2_scheduler,
    subsample_refinement_sigmas,
    subsample_sigmas,
)
from mlx_video_tpu.utils.profiling import PhaseTimer, log_memory, ui_event

SPATIAL_SCALE = 32
TEMPORAL_SCALE = 8


class PipelineType(Enum):
    """Pipeline selector (reference: generate.py:299-305)."""

    DISTILLED = "distilled"
    DEV = "dev"
    KEYFRAME = "keyframe"
    IC_LORA = "ic_lora"


@dataclass
class ModelBundle:
    """All loaded model components used by generation."""

    transformer_params: dict
    transformer_config: LTXModelConfig
    vae_decoder_params: dict
    vae_decoder_config: DecoderConfig
    vae_encoder_params: Optional[dict] = None
    vae_encoder_config: Optional[object] = None
    upsampler_params: Optional[dict] = None
    stage2_transformer_params: Optional[dict] = None
    # Audio (joint or separate generation + decode)
    audio_decoder_params: Optional[dict] = None
    audio_decoder_config: Optional[object] = None
    vocoder_params: Optional[dict] = None
    vocoder_config: Optional[object] = None
    audio_transformer_params: Optional[dict] = None
    audio_transformer_config: Optional[LTXModelConfig] = None

    @property
    def latents_mean(self):
        return self.vae_decoder_params["latents_mean"]

    @property
    def latents_std(self):
        return self.vae_decoder_params["latents_std"]


@dataclass
class TextConditioning:
    """Precomputed text context (reference interface: generate.py:2768-2855)."""

    video_embeddings: jax.Array  # (B, S_ctx, caption_channels)
    video_neg_embeddings: Optional[jax.Array] = None
    audio_embeddings: Optional[jax.Array] = None
    audio_neg_embeddings: Optional[jax.Array] = None


@dataclass
class GenerateResult:
    video_path: Optional[Path]
    latents: np.ndarray
    audio_latents: Optional[np.ndarray] = None
    video: Optional[np.ndarray] = None
    phase_timer: Optional[PhaseTimer] = None
    # num_videos > 1: one mp4 per video ({stem}_{i}.mp4); video_path is [0]
    video_paths: Optional[List[Path]] = None


def pad_dimensions(
    height: int, width: int, divisor: int
) -> Tuple[int, int, Optional[Tuple[int, int, int, int]]]:
    """Pad H/W up to a divisor, returning crop-back params
    (reference: generate.py:2238-2259)."""
    if height % divisor == 0 and width % divisor == 0:
        return height, width, None
    pad_h = (divisor - height % divisor) % divisor
    pad_w = (divisor - width % divisor) % divisor
    pad_top, pad_left = pad_h // 2, pad_w // 2
    crop = (pad_top, pad_left, height, width)
    return height + pad_h, width + pad_w, crop


def round_frames(num_frames: int) -> int:
    """Round UP to 1 + 8k (reference: generate.py:2261-2266)."""
    if num_frames % 8 == 1:
        return num_frames
    return ((num_frames - 1 + 7) // 8) * 8 + 1


def _masked_renoise(state: LatentState, key: jax.Array, sigma0: float) -> LatentState:
    """latent = noise*mask*s0 + latent*(1 - mask*s0) (reference: generate.py:3153-3161)."""
    return add_noise_with_state(state, key, sigma0)


def _resolve_frame_idx(frame_idx: int, num_frames: int, latent_frames: int) -> int:
    """Map a VIDEO-frame index to a LATENT-frame index
    (reference: generate.py:2612-2619): identity when it already fits the
    latent grid, else proportional rescale — the CLI's --image-frame-idx is
    in media frames while conditioning indexes latent frames."""
    if frame_idx < latent_frames:
        return frame_idx
    if num_frames <= 1 or latent_frames <= 1:
        return 0
    scaled = int((frame_idx / (num_frames - 1) * (latent_frames - 1)) + 0.5)
    return int(max(0, min(latent_frames - 1, scaled)))


def _encode_conditionings(
    models: ModelBundle,
    images: Sequence[Tuple[str, int, float]],
    videos: Sequence[Tuple[str, int, float]],
    height: int,
    width: int,
    num_frames: int,
    mode: str,
    dtype,
):
    """VAE-encode image/video conditionings at one resolution
    (reference: generate.py:3059-3124)."""
    if models.vae_encoder_params is None:
        raise ValueError("Image/video conditioning requires a loaded VAE encoder")
    conds = []
    # Per-block jits with eager layout transposes (params are jit ARGUMENTS
    # in every block call): the monolithic encoder graph device-compiles
    # pathologically at full geometry — PERF.md round 2.
    def encode(v):
        out_cl = video_encoder_apply_cl_chunked(
            models.vae_encoder_params, models.vae_encoder_config, vae_ops.to_channels_last(v)
        )
        return vae_ops.to_channels_first(out_cl)
    latent_frames = 1 + (num_frames - 1) // 8
    for img_path, frame_idx, strength in images:
        image = media.load_image(img_path, height=height, width=width)
        tensor = jnp.asarray(media.prepare_image_for_encoding(image, height, width), dtype=dtype)
        latent = encode(tensor)
        frame_idx = _resolve_frame_idx(frame_idx, num_frames, latent_frames)
        cls = VideoConditionByKeyframeIndex if mode == "guide" else VideoConditionByLatentIndex
        if mode == "guide":
            conds.append(cls(keyframes=latent, frame_idx=frame_idx, strength=strength))
        else:
            conds.append(cls(latent=latent, frame_idx=frame_idx, strength=strength))
    for vid_path, frame_idx, strength in videos:
        frames = media.load_video(vid_path, height=height, width=width, frame_cap=num_frames)
        tensor = jnp.asarray(media.prepare_video_for_encoding(frames, height, width), dtype=dtype)
        latent = encode(tensor)
        frame_idx = _resolve_frame_idx(frame_idx, num_frames, latent_frames)
        conds.append(
            VideoConditionByKeyframeIndex(keyframes=latent, frame_idx=frame_idx, strength=strength)
        )
    return conds


def _init_state_with_conditioning(
    shape, conds, key: jax.Array, sigma0: float, dtype
) -> Tuple[jax.Array, Optional[LatentState]]:
    """Build the initial (possibly conditioned) latent
    (reference: generate.py:3142-3165, 3431-3454)."""
    if conds:
        state = LatentState(
            latent=jnp.zeros(shape, dtype=dtype),
            clean_latent=jnp.zeros(shape, dtype=dtype),
            denoise_mask=jnp.ones((shape[0], 1, shape[2], 1, 1), dtype=dtype),
        )
        state = apply_conditioning(state, conds)
        state = _masked_renoise(state, key, sigma0)
        return state.latent, state
    latents = jax.random.normal(key, shape, dtype=jnp.float32).astype(dtype)
    return latents, None


def select_tiling(tiling: str, height: int, width: int, num_frames: int, stream: bool):
    """Tiling mode selection incl. stream forcing (reference: generate.py:3522-3563)."""
    if tiling == "none":
        cfg = None
    elif tiling == "auto":
        cfg = TilingConfig.auto(height, width, num_frames)
    elif tiling == "default":
        cfg = TilingConfig.default()
    elif tiling == "aggressive":
        cfg = TilingConfig.aggressive()
    elif tiling == "conservative":
        cfg = TilingConfig.conservative()
    elif tiling == "spatial":
        cfg = TilingConfig.spatial_only()
    elif tiling == "temporal":
        cfg = TilingConfig.temporal_only()
    else:
        cfg = TilingConfig.auto(height, width, num_frames)
    if stream and cfg is None:
        tile_size = 64
        if num_frames < tile_size:
            tile_size = max(16, (num_frames // 8) * 8) or 16
        overlap = 24 if tile_size >= 64 else 8
        cfg = TilingConfig.temporal_only(tile_size=tile_size, overlap=overlap)
    return cfg


def decode_latents(
    models: ModelBundle,
    latents: jax.Array,
    tiling_config: Optional[TilingConfig],
    decode_timestep: Optional[float] = None,
    noise_key: Optional[jax.Array] = None,
    on_frames_ready=None,
    mesh=None,
    device_blend: Optional[bool] = None,
) -> np.ndarray:
    """Tiled (or whole) VAE decode -> (B, 3, F, H, W) float in [-1, 1].

    With ``mesh``: decoder params must be replicated over the mesh
    (parallel.sharding.replicate_params — generate_video does this); each
    decode input is placed H-sharded (shard_spatial) so the conv stages run
    as one GSPMD program with halo exchanges — the mesh does the spatial
    splitting that host-side tiling does on one chip.
    """
    dec_cfg = models.vae_decoder_config
    timestep = None
    if decode_timestep is not None:
        timestep = jnp.full((latents.shape[0],), decode_timestep, dtype=jnp.float32)

    if mesh is not None:
        from mlx_video_tpu.parallel.sharding import shard_spatial

        def _place(x):
            return shard_spatial(x, mesh, h_axis=3)
    else:
        def _place(x):
            return x

    # Host-driven decode: per-stage jits (bounded compile times per stage,
    # independent caching across tile shapes) instead of one monolith.
    def decode_jit(x):
        return video_decoder_apply_chunked(
            models.vae_decoder_params, dec_cfg, _place(x), timestep=timestep, noise_key=noise_key
        )
    if tiling_config is None:
        dev = decode_jit(latents)
        if mesh is None and jax.default_backend() != "cpu":
            # halve the device->host readback (fp16 rounding ~0.05% on a
            # [-1,1] signal — far above the 35 dB pipeline gates)
            dev = dev.astype(jnp.float16)
        out = np.asarray(dev).astype(np.float32)
        if on_frames_ready is not None:
            on_frames_ready(out, 0)
        return out
    # Device-side blending by default on an accelerator (the host-blend path
    # reads back ~3x the final video in fp32 tile overlap+precision bytes —
    # the dominant cost of the decode phase through the tunnel, PERF.md r5).
    # The mesh path keeps host blending: the canvas would need its own
    # sharding story, and GSPMD decode already splits spatially on-device.
    if device_blend is None:
        device_blend = mesh is None and jax.default_backend() != "cpu"
    if device_blend and mesh is None:
        from mlx_video_tpu.models.ltx.video_vae.tiling import decode_with_tiling_device

        return decode_with_tiling_device(
            decode_jit,
            np.asarray(latents),
            tiling_config,
            spatial_scale=SPATIAL_SCALE,
            temporal_scale=TEMPORAL_SCALE,
            on_frames_ready=on_frames_ready,
            fetch_dtype=np.float16,
        )
    return decode_with_tiling(
        lambda tile: decode_jit(jnp.asarray(tile)),
        np.asarray(latents),
        tiling_config,
        spatial_scale=SPATIAL_SCALE,
        temporal_scale=TEMPORAL_SCALE,
        on_frames_ready=on_frames_ready,
    )



def _check_params_dtype(models: "ModelBundle", dtype) -> None:
    """Fail fast on a params/pipeline dtype mismatch (otherwise it surfaces
    as an opaque scan carry-type error deep in the compiled denoise loop)."""
    probe = models.transformer_params.get("video", {}).get("patchify_proj", {}).get("weight")
    if probe is not None and jnp.issubdtype(probe.dtype, jnp.floating) and probe.dtype != dtype:
        raise ValueError(
            f"transformer params are {probe.dtype} but the pipeline dtype is "
            f"{jnp.dtype(dtype).name}; load the weights in the pipeline dtype "
            f"or pass dtype={probe.dtype} to generate_video."
        )


# Geometries whose decode programs were already warm-dispatched in THIS
# process (program loads are per-process; see _warmup_decode_programs).
_WARMED_DECODE_GEOMETRIES: set = set()

# One AOT preload per process (the thread loads every indexed entry).
_AOT_PRELOADED = False


def generate_video(
    models: ModelBundle,
    text: TextConditioning,
    prompt: str = "",
    height: int = 512,
    width: int = 512,
    num_frames: int = 33,
    fps: float = 24.0,
    seed: int = 0,
    num_videos: int = 1,
    seeds: Optional[Sequence[int]] = None,
    pipeline: PipelineType = PipelineType.DISTILLED,
    # distilled options
    stage1_steps: int = 8,
    stage2_steps: int = 3,
    sigma_subsample: str = "farthest",
    stage2_cfg: bool = False,
    cfg_scale: float = 4.0,
    # dev options
    num_inference_steps: int = 40,
    cfg_cache_interval: int = 1,
    attn_broadcast_interval: int = 1,
    teacache_threshold: float = 0.0,
    cfg_sequential: bool = False,
    optimize_layouts: bool = False,
    # conditioning
    images: Sequence[Tuple[str, int, float]] = (),
    video_conditionings: Sequence[Tuple[str, int, float]] = (),
    # audio
    audio: bool = False,
    audio_mode: str = "auto",
    audio_steps: int = 8,
    audio_filter: Optional[str] = None,
    audio_bitrate: str = "256k",
    output_audio_path: Optional[Union[str, Path]] = None,
    # output
    output_path: Optional[Union[str, Path]] = None,
    tiling: str = "auto",
    stream: bool = False,
    video_encoder: str = "ffmpeg",
    decode_latents_only: bool = False,
    dtype=jnp.bfloat16,
    progress_callback=None,
    profile: bool = False,
    mem_log: bool = False,
    mesh=None,
    sequence_parallel: bool = False,
    pipeline_parallel: int = 0,
    pipeline_microbatches: int = 1,
    pipeline_data: int = 1,
    pipeline_tensor: int = 1,
    low_memory: bool = False,
    aux_int8_staging: bool = False,
    overlap_staging: Optional[bool] = None,
    aux_park_device: Optional[bool] = None,
    keep_transformer: bool = False,
) -> GenerateResult:
    """Generate a video (and optionally audio). See module docstring for the
    orchestration spec mapping.

    ``mesh``: optional ``jax.sharding.Mesh`` with axes (data, fsdp, tensor).
    Pass transformer params pre-placed via ``parallel.sharding.shard_params``
    (the CLI does this for ``--mesh``); the denoise scan then compiles as one
    GSPMD program with XLA-inserted collectives over the mesh. Latents are
    gathered to the default device at stage boundaries so the (lighter)
    upsampler/VAE stages run single-device.

    ``sequence_parallel``: with ``mesh``, additionally run every DiT
    self-attention as ring attention with the token axis sharded over the
    ``fsdp`` mesh axis — raises the max F*H*W beyond one chip's HBM for
    long/large videos (token count must divide the axis size; falls back
    to local attention otherwise).

    ``pipeline_parallel``: >0 runs every DiT forward GPipe
    pipeline-parallel with that many stages on a (data, pipe) mesh built
    here (parallel/pipeline.py); ``pipeline_microbatches`` (must divide the
    latent batch — 1 for single-video generation) and ``pipeline_data``
    tune the schedule. Mutually exclusive with ``mesh``/
    ``sequence_parallel``; targets cross-slice (DCN) scale-out and batch
    serving.

    ``low_memory``: single-chip staging — the reference's serial load/free
    choreography (``del transformer; mx.clear_cache()``,
    generate.py:3504-3506) translated to host<->HBM swaps: the VAE
    decoder/upsampler params live on the host while the transformer
    denoises (19B q4 + its scan arena alone fill most of a 16 GB chip),
    each moves on-device only for its phase, and the transformer params are
    freed after the final denoise. The bundle's ``transformer_params`` are
    None afterwards; reload before reuse.

    ``aux_int8_staging``: with ``low_memory``, park the aux-stage params
    (upsampler/VAE/audio) host-side as per-group int8 so each staging
    transfer moves half the bytes; dequantized to bf16 on device in one
    jitted dispatch (io/staging.py). Weight-only int8 on conv stacks —
    drift is bounded in tests/test_staging.py.

    ``aux_park_device``: with ``aux_int8_staging``, park the int8-quantized
    aux trees in HBM instead of host RAM — the parked form is ~2x smaller
    than bf16 (per-group int8 + scales, ~0.9 GiB for upsampler+decoder at
    full geometry), and when that fits beside the transformer + scan arena
    the staging TRANSFERS disappear entirely: "staging in" is one on-device
    dequant dispatch. Default off (env ``MLX_VIDEO_AUX_PARK=device``
    enables) — geometries whose scan arena already fills HBM (config-3
    5184-token batched CFG) must keep the host park. Ignored without
    aux_int8_staging (a bf16 park in HBM frees nothing).

    ``overlap_staging``: with ``low_memory``, issue the aux-param
    host->device copies ASYNCHRONOUSLY while the denoise scans are still
    executing (upsampler before stage 1, decoder at the start of the
    upsample phase) instead of fencing and transferring with the chip idle
    — the transfer rides the DMA/transfer path under compute. The cost is
    transient HBM coexistence of the in-flight aux buffers with the scan
    arena (~0.5-1 GiB int8-parked; double that raw), which the w4a8 19B +
    512^2x33 geometry has room for (PERF.md r4). Default ON under
    low_memory (env ``MLX_VIDEO_OVERLAP_STAGING=0`` or ``False`` disables
    — e.g. for geometries whose scan arena already fills HBM). The
    reference behavior being beaten is the strictly serial load/free
    choreography (mlx_video/generate.py:3504-3506).
    """
    timer = PhaseTimer()
    if seeds is not None:
        # Explicit per-video seeds (batch serving coalesces requests with
        # arbitrary seeds); overrides the seed+i derivation. Resolved FIRST:
        # the text-conditioning broadcast below needs the final num_videos.
        if not seeds:
            raise ValueError("seeds must be non-empty")
        if num_videos == 1:
            num_videos = len(seeds)
        elif len(seeds) != num_videos:
            raise ValueError(f"len(seeds)={len(seeds)} != num_videos={num_videos}")
        seed = int(seeds[0])
    if num_videos < 1:
        raise ValueError("num_videos must be >= 1")
    # Text conditioning casts to the pipeline dtype at the boundary:
    # precomputed embeddings load as fp32 (cli --embeddings), and an fp32
    # context against bf16 weights makes attention reject the mixed
    # query/key dtypes mid-denoise (same boundary rule as the trainer's
    # strategy inputs).
    def _cast_emb(x):
        return None if x is None else jnp.asarray(x, dtype)

    text = TextConditioning(
        video_embeddings=_cast_emb(text.video_embeddings),
        video_neg_embeddings=_cast_emb(text.video_neg_embeddings),
        audio_embeddings=_cast_emb(text.audio_embeddings),
        audio_neg_embeddings=_cast_emb(text.audio_neg_embeddings),
    )
    if num_videos > 1:
        def _bcast(x):
            if x is None:
                return None
            if x.shape[0] == num_videos:
                return x
            if x.shape[0] == 1:
                return jnp.broadcast_to(x, (num_videos,) + x.shape[1:])
            raise ValueError(
                f"text conditioning batch {x.shape[0]} does not match "
                f"num_videos={num_videos} (pass 1 prompt to broadcast or N)"
            )

        text = TextConditioning(
            video_embeddings=_bcast(text.video_embeddings),
            video_neg_embeddings=_bcast(text.video_neg_embeddings),
            audio_embeddings=None,
            audio_neg_embeddings=None,
        )
    if low_memory and mesh is not None:
        # low_memory is the SINGLE-chip host<->HBM staging choreography; a
        # mesh makes it unnecessary (aux stages go mesh-resident below) and
        # the two placement schemes would fight (host-parked trees vs
        # replicated NamedShardings). Fail loudly rather than pick one.
        raise ValueError(
            "low_memory and mesh are mutually exclusive: with >= 2 devices "
            "the upsampler/decoder stay mesh-resident (replicated params, "
            "H-sharded activations) and host staging is not needed"
        )
    if aux_int8_staging and not low_memory:
        raise ValueError(
            "aux_int8_staging is a low_memory transfer codec (int8 on the "
            "host<->HBM wire); it has no effect without low_memory — pass "
            "low_memory=True or drop the flag"
        )
    sp = (mesh, "fsdp") if (sequence_parallel and mesh is not None) else None
    pp = None
    if pipeline_parallel:
        if mesh is not None or sequence_parallel:
            raise ValueError(
                "pipeline_parallel is mutually exclusive with mesh/sequence_parallel"
            )
        if attn_broadcast_interval > 1:
            raise ValueError(
                "attn_broadcast_interval does not compose with pipeline_parallel"
            )
        if pipeline_microbatches > 1 or pipeline_data > 1:
            # Generation always denoises a batch of ONE video (shape1 below),
            # so microbatch/data splits have nothing to divide — they are
            # training-scale knobs (trainer pipeline_microbatches /
            # pipeline_data). Fail here, not steps later inside the scan.
            raise ValueError(
                "generate_video runs a latent batch of 1; pipeline_microbatches/"
                "pipeline_data have nothing to split — use pipeline_parallel "
                "stages (+ pipeline_tensor) for inference, and the trainer "
                "config for microbatched pipelines"
            )
        from mlx_video_tpu.parallel.pipeline import pipeline_mesh, shard_params_pipeline

        pp_mesh = pipeline_mesh(pipeline_parallel, data=pipeline_data, tensor=pipeline_tensor)
        # NOTE: mutates the bundle like low_memory does — every transformer
        # param set (stage-1, optional stage-2, optional audio) must live
        # pipe-sharded or a 19B stage-2 would sit whole on one device.
        # shard_params_pipeline is idempotent (device_put to an identical
        # sharding is a no-op), so repeat serve requests cost a tree walk,
        # not copies.
        models.transformer_params = shard_params_pipeline(models.transformer_params, pp_mesh)
        if models.stage2_transformer_params is not None:
            models.stage2_transformer_params = shard_params_pipeline(
                models.stage2_transformer_params, pp_mesh
            )
        if models.audio_transformer_params is not None:
            models.audio_transformer_params = shard_params_pipeline(
                models.audio_transformer_params, pp_mesh
            )
        pp = (
            pp_mesh, "pipe", pipeline_microbatches,
            "data" if pipeline_data > 1 else None,
        )
        mesh = pp_mesh  # stage-boundary gathers replicate over the pipe mesh

    _host_dev = jax.devices("cpu")[0] if low_memory else None
    if aux_park_device is None:
        import os as _os_pk

        aux_park_device = _os_pk.environ.get("MLX_VIDEO_AUX_PARK", "host") == "device"
    # The park target for the int8 codec: host RAM (classic staging) or HBM
    # (no wire at all — the parked int8 tree rides beside the transformer).
    _park_dev = (
        jax.devices()[0] if (aux_park_device and aux_int8_staging) else _host_dev
    )

    def _device_fence():
        """Drain the device queue with an honest fence: enqueue a trivial
        computation and FETCH its value. Through the axon tunnel
        block_until_ready returns early, and dispatch is async — a staging
        device_put issued while the previous phase's multi-GB arena is
        still executing makes the two coexist and OOMs (r3 chip runs:
        config-3 decoder staging after the dev scan, config-4 encoder
        host-staging after cond_encode)."""
        if jax.default_backend() == "cpu":
            return
        float(jnp.sum(jnp.ones((8,), jnp.float32)))

    def _stage(tree, to_host: bool):
        """Move a param tree host<->device (low_memory only). Blocks until
        the copy lands: device_put is async, and launching the next heavy
        stage while the old device buffers are still draining re-creates the
        exact coexistence this staging exists to avoid. With
        ``aux_int8_staging`` the host side holds int8 (half the wire bytes,
        io/staging.py)."""
        if not low_memory or tree is None:
            return tree
        _device_fence()
        if aux_int8_staging:
            from mlx_video_tpu.io import staging as _st

            if to_host:
                return _st.park_int8(tree, _park_dev)
            if _st.is_parked(tree):
                return _st.unpark_int8(tree, jax.devices()[0])
        target = _host_dev if to_host else jax.devices()[0]
        moved = jax.device_put(tree, target)
        jax.block_until_ready(moved)
        return moved

    if overlap_staging is None:
        import os as _os_ov

        overlap_staging = _os_ov.environ.get("MLX_VIDEO_OVERLAP_STAGING", "1") != "0"
    _overlap = low_memory and overlap_staging and pp is None
    _prefetch_handles: dict = {}

    def _prefetch(attr: str) -> None:
        """Issue the async host->device copies for a host-staged tree WHILE
        the device is busy (no fence, no block): the bytes ride the transfer
        path under the executing scan instead of serializing after it. The
        handle is consumed by _stage_in; unpark_begin handles both
        int8-parked and plain trees (io/staging.py)."""
        if not _overlap or attr in _prefetch_handles:
            return
        tree = getattr(models, attr)
        if tree is None:
            return
        from mlx_video_tpu.io import staging as _st

        _prefetch_handles[attr] = _st.unpark_begin(tree, jax.devices()[0])

    def _stage_in(attr: str):
        """Bring a host-staged tree on-device, consuming a prefetch when one
        is in flight (dequant dispatch + block only); otherwise the fenced
        synchronous _stage."""
        h = _prefetch_handles.pop(attr, None)
        if h is not None:
            from mlx_video_tpu.io import staging as _st

            return _st.unpark_finish(h)
        return _stage(getattr(models, attr), to_host=False)

    _decode_warmed = [False]

    def _warm_key(latent_shape, tiling_cfg_w):
        return (
            tuple(latent_shape), repr(tiling_cfg_w), jnp.dtype(dtype).name,
            repr(models.vae_decoder_config),
        )

    def _warmup_decode_programs(latent_shape, tiling_cfg_w, noise_k) -> None:
        """Pre-load the VAE decoder stage executables while the decoder
        params are still on the host->HBM wire. A fresh process pays ~2.5 s
        of device-side program load on the FIRST dispatch of each AOT-cached
        stage (PERF.md r3) — serial after the staging transfer in the naive
        order. Executables key on avals, not values, so dispatching every
        distinct tile shape once on device-synthesized ZEROS params (no
        transfer) queues those loads under the staging stall instead. The
        dispatches are not awaited; the queue drains while _stage_in blocks
        on the transfer. MLX_VIDEO_WARM_DECODE=0 disables."""
        import os as _os_w

        mode = _os_w.environ.get("MLX_VIDEO_WARM_DECODE", "1")
        # Process-level dedup beside the per-call flag: program loads are
        # per PROCESS, so a resident server re-warming (zeros decode on
        # device, ~0.3 s) every request would be pure waste.
        wkey = _warm_key(latent_shape, tiling_cfg_w)
        if mode == "0" or _decode_warmed[0] or wkey in _WARMED_DECODE_GEOMETRIES:
            return
        # CPU has no deferred device program load to dodge — skip the wasted
        # compute except under "force" (tests exercise the path with it).
        if mode != "force" and (not _overlap or jax.default_backend() == "cpu"):
            return
        if models.vae_decoder_params is None or models.vae_decoder_config is None:
            return
        _decode_warmed[0] = True
        _WARMED_DECODE_GEOMETRIES.add(wkey)
        from mlx_video_tpu.io.staging import _is_parked_leaf
        from mlx_video_tpu.models.ltx.video_vae.tiling import tile_latent_shapes

        def z(leaf):
            if _is_parked_leaf(leaf):
                return jnp.zeros(leaf["q"].shape, jnp.dtype(leaf["dtype"]))
            return jnp.zeros(leaf.shape, leaf.dtype)

        zeros = jax.tree.map(z, models.vae_decoder_params, is_leaf=_is_parked_leaf)
        ch = models.vae_decoder_config.in_channels
        for tf, th, tw in tile_latent_shapes(latent_shape, tiling_cfg_w):
            video_decoder_apply_chunked(
                zeros, models.vae_decoder_config,
                jnp.zeros((1, ch, tf, th, tw), dtype),
                timestep=jnp.full((1,), 0.05, dtype=jnp.float32),
                noise_key=noise_k,
            )
        # Device-blend decode programs (blend + finalize jits) for the tiled
        # path — small programs, but their per-process compiles/loads would
        # otherwise land inside the decode phase.
        if tiling_cfg_w is not None and mesh is None and (
            mode == "force" or jax.default_backend() != "cpu"
        ):
            from mlx_video_tpu.models.ltx.video_vae.tiling import (
                warm_device_blend_programs,
            )

            warm_device_blend_programs(
                latent_shape, tiling_cfg_w, decoded_dtype=dtype,
            )

    _warm_gate = threading.Event()

    def _warmup_decode_programs_threaded(latent_shape, tiling_cfg_w, noise_k):
        """Run the decode-program warmup on a SIDE THREAD.

        The r4 inline placement (after stage-1's latents fetch) has no stall
        left to hide under once the aux params are device-parked — the ~10 s
        of per-process AOT program loads became the decode phase itself
        (PERF.md r4 config-2). Loads are host+tunnel work; a daemon thread
        issues them without blocking this thread's dispatch chain (the
        measured r4 regression was INLINE mid-scan dispatch serializing
        ahead of the latents-fetch RPC).

        MLX_VIDEO_WARM_DECODE selects the trigger:
          late (default) — r4 behavior (inline, post-stage1 / drain
            window). The proven-safe placement: allocations happen at
            enqueue on this backend and one RESOURCE_EXHAUSTED is sticky,
            and a scan-gated thread was MEASURED to OOM the config-4 AV
            low_memory leg (warm zeros + queued stage outputs racing the
            scan arena, r5) — its serial HBM discipline needs the warm
            dispatches after the scan drains.
          scan — the thread waits on ``_warm_gate``, set right after the
            first denoise scan is DISPATCHED: loads ride the scan
            execution + upsample + stage-2 windows. Opt-in for geometries
            with measured headroom (VideoOnly 512² device-park).
          early — no gate: loads also ride conditioning encode and layout
            placement. Fastest, tightest HBM coexistence.
          0 — off."""
        mode = os.environ.get("MLX_VIDEO_WARM_DECODE", "late")
        if mode in ("0", "late", "1"):
            return
        if mode == "early":
            _warm_gate.set()

        def _body():
            _warm_gate.wait(timeout=900.0)
            _warmup_decode_programs(latent_shape, tiling_cfg_w, noise_k)

        threading.Thread(target=_body, daemon=True, name="decode-warmup").start()

    def _restage_if_host_parked(tree):
        """Undo a PREVIOUS low_memory run's host-parking on a reused bundle.

        low_memory mutates the bundle (params committed to the CPU device);
        a later non-low_memory run would otherwise jit host-committed params
        against device arrays and fail with 'incompatible devices'. No-op
        when the default backend IS the CPU (tests) or nothing is parked.
        """
        if low_memory or tree is None:
            return tree
        from mlx_video_tpu.io import staging as _st

        if _st.is_parked(tree):
            # Previous run parked it as int8 (aux_int8_staging); restore
            # full-precision device residency for this non-low_memory run.
            # Applies on ANY backend — a parked tree is not usable params.
            return _st.unpark_int8(tree, jax.devices()[0])
        if jax.default_backend() == "cpu":
            return tree
        leaves = jax.tree.leaves(tree)
        if not leaves or not hasattr(leaves[0], "devices"):
            return tree
        devs = leaves[0].devices()
        if all(d.platform == "cpu" for d in devs):
            moved = jax.device_put(tree, jax.devices()[0])
            jax.block_until_ready(moved)
            return moved
        return tree

    if low_memory:
        models.vae_decoder_params = _stage(models.vae_decoder_params, to_host=True)
        models.upsampler_params = _stage(models.upsampler_params, to_host=True)
        if models.audio_decoder_params is not None:
            models.audio_decoder_params = _stage(models.audio_decoder_params, to_host=True)
            models.vocoder_params = _stage(models.vocoder_params, to_host=True)
    elif mesh is not None:
        # Mesh-resident aux stages: replicate the (small) upsampler/decoder
        # conv stacks over the mesh so upsample and VAE decode run as GSPMD
        # programs with H-sharded activations (shard_spatial below) instead
        # of every device redundantly computing the full stage on replicated
        # latents. With >= 2 chips this removes the need for low_memory
        # staging entirely: the per-device share of the aux params is small
        # next to the FSDP-sharded 19B. Idempotent across serve requests.
        from mlx_video_tpu.io import staging as _st
        from mlx_video_tpu.parallel.sharding import replicate_params

        for _attr in ("upsampler_params", "vae_decoder_params"):
            _v = getattr(models, _attr)
            if _v is not None:
                if _st.is_parked(_v):
                    # A previous low_memory+aux_int8_staging run on this
                    # bundle left the tree host-parked as int8 dicts;
                    # replicate_params would device_put the dtype string.
                    _v = _st.unpark_int8(_v, jax.devices()[0])
                setattr(models, _attr, replicate_params(_v, mesh))
    else:
        for attr in (
            "vae_decoder_params", "vae_encoder_params", "upsampler_params",
            "audio_decoder_params", "vocoder_params",
        ):
            setattr(models, attr, _restage_if_host_parked(getattr(models, attr)))

    def _gather(x):
        """Replicate a mesh-sharded array across the mesh between pipeline
        stages (no-op without a mesh). Device-side reshard — an XLA
        all-gather over ICI, not a device->host->device numpy bounce.
        Replicated (not single-device) placement keeps the device set
        identical to the sharded transformer params, so the following stage
        jits as one GSPMD program instead of failing on mixed commitments."""
        if mesh is None or x is None:
            return x
        return jax.device_put(
            x, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
        )
    is_distilled = pipeline in (PipelineType.DISTILLED, PipelineType.KEYFRAME, PipelineType.IC_LORA)
    conditioning_mode = "guide" if pipeline == PipelineType.KEYFRAME else "replace"
    if pipeline == PipelineType.IC_LORA and not video_conditionings:
        raise ValueError("IC-LoRA pipeline requires video conditionings")
    if pipeline == PipelineType.DEV and video_conditionings:
        raise ValueError("Video conditioning is only supported in ic_lora/distilled pipelines.")

    divisor = 64 if is_distilled else 32
    height, width, crop_params = pad_dimensions(height, width, divisor)
    num_frames = round_frames(num_frames)
    latent_channels = models.transformer_config.in_channels
    latent_frames = 1 + (num_frames - 1) // TEMPORAL_SCALE
    latent_h, latent_w = height // SPATIAL_SCALE, width // SPATIAL_SCALE
    # Resolved up-front (cheap, and it fails fast on a bad preset): the
    # decode-warmup overlap needs the tile shapes before the denoise scans.
    tiling_config = select_tiling(tiling, height, width, num_frames, stream)

    if sigma_subsample not in ("uniform", "farthest"):
        raise ValueError("sigma_subsample must be 'uniform' or 'farthest'.")

    # Audio mode resolution (reference: generate.py:2278-2304).
    joint_audio = separate_audio = False
    if audio:
        if audio_mode == "auto":
            audio_mode = "separate" if pipeline != PipelineType.DEV else "joint"
        joint_audio = audio_mode == "joint"
        separate_audio = audio_mode == "separate"
        if joint_audio and not models.transformer_config.model_type.audio_enabled:
            raise ValueError("Joint audio requires an AudioVideo transformer config")
    audio_frames = compute_audio_frames(num_frames, fps) if audio else 0

    # Batched multi-prompt generation (new capability vs the reference's
    # strictly single-video pipeline): N videos share every denoise scan —
    # the transformer is the cost center, and batching its forwards is the
    # single-chip throughput lever. Video i uses jax.random.key(seed + i)
    # with the SAME split(8) schedule as a single run, so a batched run's
    # latents are bit-identical to N independent runs at seeds s..s+N-1
    # (pinned by tests). Decode + write stay per-video loops (host-driven).
    if num_videos > 1:
        if audio:
            raise ValueError("num_videos > 1 does not compose with audio yet")
        if images or video_conditionings:
            raise ValueError(
                "num_videos > 1 does not compose with image/video conditioning"
            )

    key = jax.random.key(seed)
    keys = jax.random.split(key, 8)
    vid_seeds = list(seeds) if seeds is not None else [seed + i for i in range(num_videos)]
    vid_keys = [jax.random.split(jax.random.key(int(si)), 8) for si in vid_seeds]

    # Decode-program loads move to a side thread (gated by _warm_gate per
    # MLX_VIDEO_WARM_DECODE; =late keeps the r4 inline points).
    if not decode_latents_only and output_path is not None:
        _warmup_decode_programs_threaded(
            (1, latent_channels, latent_frames, latent_h, latent_w),
            tiling_config, keys[2],
        )
    # AOT executable PRELOAD (no arguments, no dispatch — pure host+tunnel
    # work + device program memory): ship the cached binaries this
    # environment used before to the chip on a side thread, so first
    # dispatches skip the ~2-3 s/stage serialized-program upload that
    # otherwise lands inside the denoise/decode phases (PERF.md r5). Unlike
    # the zeros-dispatch warmup this cannot race HBM arenas (it allocates
    # only program memory, bounded by MLX_VIDEO_AOT_PRELOAD_MB).
    global _AOT_PRELOADED
    if (
        not _AOT_PRELOADED
        and jax.default_backend() != "cpu"
        and os.environ.get("MLX_VIDEO_AOT_PRELOAD", "1") != "0"
    ):
        _AOT_PRELOADED = True

        def _preload_aot():
            from mlx_video_tpu.utils import aot as _aot

            t0 = time.time()
            # Decode-path entries only: the denoise scans' loads already
            # ride the pre-scan windows (their phases are steady without
            # preloading), and shipping the ~40 MB scan binaries here was
            # measured REGRESSING config-3 by ~20 s — the uploads contend
            # with the tunnel-bound cond-encode/layout-placement phases
            # (PERF.md r5). Decoder/upsampler/audio entries are small and
            # their first dispatch is the decode phase itself — the one
            # place with no earlier window.
            n = _aot.preload_disk_executables(
                ("_decoder", "upsample_latents", "decode_audio", "aux_dequant"),
                max_bytes=int(os.environ.get("MLX_VIDEO_AOT_PRELOAD_MB", "256")) * 2**20,
            )
            if n:
                print(f"[aot] preloaded {n} executables in {time.time() - t0:.1f}s",
                      flush=True)

        threading.Thread(target=_preload_aot, daemon=True, name="aot-preload").start()

    def _batched_noise(kidx: int, shape) -> jax.Array:
        """fp32 noise with per-video keys; bit-equal to the single-run
        stream for each video in the batch."""
        if num_videos == 1:
            return jax.random.normal(keys[kidx], shape, dtype=jnp.float32)
        return jnp.concatenate(
            [
                jax.random.normal(vk[kidx], (1,) + tuple(shape[1:]), dtype=jnp.float32)
                for vk in vid_keys
            ],
            axis=0,
        )

    params = models.transformer_params
    config = models.transformer_config

    audio_latents = None
    audio_positions = None
    if joint_audio:
        audio_positions = jnp.asarray(create_audio_position_grid(1, audio_frames))
        audio_latents = jax.random.normal(
            keys[5], (1, AUDIO_LATENT_CHANNELS, audio_frames, AUDIO_MEL_BINS), dtype=jnp.float32
        ).astype(dtype)

    audio_kwargs = {}
    if joint_audio:
        audio_kwargs = dict(
            audio_latents=audio_latents,
            audio_positions=audio_positions,
            audio_context=text.audio_embeddings,
            audio_neg_context=text.audio_neg_embeddings,
        )
    # Quality/speed dials are video-only: reject the combination LOUDLY
    # (matching denoise()'s ValueError and serve's 400) — silently running
    # without the dial would let a user benchmark/quality-tune against a
    # configuration that is not actually active.
    if audio_kwargs and (
        cfg_cache_interval > 1 or attn_broadcast_interval > 1 or teacache_threshold > 0.0
    ):
        raise ValueError(
            "the caching dials (cfg_cache_interval, attn_broadcast_interval, "
            "teacache_threshold) support the video-only path; drop the dial "
            "or generate audio separately (audio_mode=separate)"
        )

    def _optimized_layouts(p, lat, pos, ctx, neg, scale, extra):
        """Place transformer params in XLA's preferred input layouts for
        this denoise geometry before the scan compiles: with default
        layouts XLA prepends multi-GB in-program relayout copies of the
        stacked weight tensors (measured ~3 GB for the 48-layer w4a8
        stacks — the difference between the 19B batched-CFG dev scan
        fitting one 16 GB chip or OOMing; see dn.preferred_param_formats).
        Single-device only: mesh/SP/PP params carry NamedShardings that a
        single-device Format re-placement would silently unshard."""
        if not optimize_layouts or mesh is not None or sp is not None or pp is not None:
            return p
        with timer.phase("layout_opt"):
            fmts = dn.preferred_param_formats(
                p, config, lat, pos, ctx, neg_context=neg, cfg_scale=scale,
                cfg_sequential=cfg_sequential, **extra,
            )
            # donate: at 19B both placements of the tree cannot coexist on
            # one chip. Only safe when this function owns every live ref —
            # i.e. the tree IS a bundle attribute (rebound below); a caller-
            # composed tree (runtime-LoRA overlay sharing base leaves with a
            # cache) keeps its sources.
            donate = models.transformer_params is p or models.stage2_transformer_params is p
            new = dn.relayout_params(p, fmts, donate=donate)
            if models.transformer_params is p:
                models.transformer_params = new
            if models.stage2_transformer_params is p:
                models.stage2_transformer_params = new
            return new

    if is_distilled:
        if not 1 <= stage1_steps <= len(STAGE_1_SIGMAS) - 1:
            raise ValueError(f"stage1_steps must be between 1 and {len(STAGE_1_SIGMAS) - 1}.")
        if stage2_steps not in (1, 2, 3):
            raise ValueError("stage2_steps must be 1, 2, or 3.")

        _check_params_dtype(models, dtype)

        stage1_h, stage1_w = latent_h // 2, latent_w // 2
        s1_sigmas = subsample_sigmas(STAGE_1_SIGMAS, stage1_steps, sigma_subsample)
        s2_sigmas = subsample_refinement_sigmas(STAGE_2_SIGMAS, stage2_steps, sigma_subsample)

        # Conditionings at both stage resolutions (reference: generate.py:3059-3124).
        s1_conds = s2_conds = []
        if images or video_conditionings:
            # A prior low_memory run leaves the encoder host-staged; bring it
            # back before encoding (mixed host/device jit args don't mix).
            models.vae_encoder_params = _stage(models.vae_encoder_params, to_host=False)
            with timer.phase("cond_encode"):
                s1_conds = _encode_conditionings(
                    models, images, video_conditionings, height // 2, width // 2,
                    num_frames, conditioning_mode, dtype,
                )
                s2_conds = _encode_conditionings(
                    models, images, (), height, width, num_frames, conditioning_mode, dtype
                )
            # The encoder is done for good; under low_memory retire it to the
            # host before the 19B denoise arena claims the HBM it occupies.
            models.vae_encoder_params = _stage(models.vae_encoder_params, to_host=True)

        positions1 = jnp.asarray(
            create_position_grid(num_videos, latent_frames, stage1_h, stage1_w)
        )
        shape1 = (num_videos, latent_channels, latent_frames, stage1_h, stage1_w)
        if num_videos > 1:
            latents, state1 = _batched_noise(0, shape1).astype(dtype), None
        else:
            latents, state1 = _init_state_with_conditioning(
                shape1, s1_conds, keys[0], s1_sigmas[0], dtype
            )
            if mesh is not None and state1 is not None:
                # see the dev-branch note: encoder-jit outputs are committed
                # to one device; replicate before the GSPMD denoise.
                latents = _gather(latents)
                state1 = jax.tree.map(_gather, state1)

        params = _optimized_layouts(
            params, latents, positions1, text.video_embeddings, None, 1.0, audio_kwargs
        )
        # Overlap: the upsampler's host->device copies are issued NOW so
        # they transfer underneath the stage-1 scan (and its blocking
        # latents fetch) instead of stalling the chip afterwards. The
        # in-flight buffers coexist with the 320-token stage-1 arena — the
        # smallest arena in the pipeline, by design.
        _prefetch("upsampler_params")
        with timer.phase("stage1_denoise"):
            latents, audio_latents = dn.denoise(
                params, config, latents, positions1, text.video_embeddings, s1_sigmas,
                state=state1, progress_callback=progress_callback, sequence_parallel=sp,
                pipeline_parallel=pp,
                attn_broadcast_interval=attn_broadcast_interval,
                teacache_threshold=teacache_threshold,
                cfg_sequential=cfg_sequential,
                **audio_kwargs,
            )
            _warm_gate.set()  # scan dispatched: decode-program loads may ride it
            # (decode-program warmup dispatches AFTER this phase's latents
            # fetch, not here: dispatching it while the scan is in flight
            # measured WORSE on the chip — the per-stage program loads
            # serialize ahead of the latents-fetch RPC and inflate this
            # phase by more than they save in decode; A/B in PERF.md r4.)
            latents, audio_latents = _gather(latents), _gather(audio_latents)
            if joint_audio:
                audio_kwargs["audio_latents"] = audio_latents
            if low_memory:
                # Honest device sync (a host fetch of the small latents): with
                # async dispatch the next stage's buffers would be enqueued
                # while this scan's multi-GB temp arena is still live — the
                # two arenas together can exceed single-chip HBM at 19B scale.
                latents = jnp.asarray(np.asarray(latents), dtype=latents.dtype)
        log_memory("stage1 complete", profile or mem_log)

        # Overlap: issue the decoder (+ audio) copies here — they queue on
        # the transfer path behind the upsampler's remaining bytes and flow
        # during the upsample compute, stage-2 scan, and final latents
        # fetch, so the decode phase starts with its params already landed.
        if not decode_latents_only and output_path is not None:
            _prefetch("vae_decoder_params")
            if models.audio_decoder_params is not None:
                _prefetch("audio_decoder_params")
                _prefetch("vocoder_params")
            # Queue the decoder stage program loads now: they execute while
            # _stage_in below blocks on the upsampler's remaining transfer.
            _warmup_decode_programs(
                (1, latent_channels, latent_frames, latent_h, latent_w),
                tiling_config, keys[2],
            )
        with timer.phase("upsample"):
            if models.upsampler_params is None:
                raise ValueError("Distilled pipeline requires upsampler weights")
            ups_params = _stage_in("upsampler_params")
            lat_mean = _stage(models.latents_mean, to_host=False)
            lat_std = _stage(models.latents_std, to_host=False)
            if mesh is not None:
                # Mesh-resident upsample: H-sharded latents x replicated conv
                # params -> each device upsamples its H slice (GSPMD inserts
                # the conv halo exchanges). _gather above made the latents
                # replicated; this reshard is a device-side slice, not a
                # host bounce.
                from mlx_video_tpu.parallel.sharding import (
                    replicate_params,
                    shard_spatial,
                )

                lat_mean = replicate_params(lat_mean, mesh)
                lat_std = replicate_params(lat_std, mesh)
                latents = shard_spatial(latents, mesh, h_axis=3)
            # Params must be jit ARGUMENTS: closure-captured arrays are inlined
            # as program constants — a host round-trip plus an in-executable
            # copy of the whole upsampler (OOMs next to a resident 19B model).
            # Channels-last core jitted, layout transposes eager (PERF.md r2).
            from mlx_video_tpu.utils.aot import aot_jit

            lat_cl = aot_jit(upsample_latents_cl, name="upsample_latents_cl")(
                ups_params, vae_ops.to_channels_last(latents), lat_mean, lat_std
            )
            latents = vae_ops.to_channels_first(lat_cl)
            if mesh is not None:
                # Stage-2 denoise consumes replicated latents (its GSPMD
                # program shards tokens/batch itself) — all-gather the H
                # slices back over ICI.
                latents = _gather(latents)
            if low_memory:
                # retire the upsampler arena before stage 2 re-enters the 19B
                latents = jnp.asarray(np.asarray(latents), dtype=latents.dtype)
                del ups_params

        # Stage 2: renoise at sigma0 then refine (reference: generate.py:3285-3326).
        positions2 = jnp.asarray(
            create_position_grid(num_videos, latent_frames, latent_h, latent_w)
        )
        state2 = None
        if s2_conds:
            state2 = LatentState(
                latent=latents,
                clean_latent=jnp.zeros_like(latents),
                denoise_mask=jnp.ones((1, 1, latent_frames, 1, 1), dtype=dtype),
            )
            state2 = apply_conditioning(state2, s2_conds)
            state2 = _masked_renoise(state2, keys[1], s2_sigmas[0])
            if mesh is not None:
                state2 = jax.tree.map(_gather, state2)
            latents = state2.latent
        else:
            noise = _batched_noise(1, latents.shape).astype(dtype)
            latents = noise * s2_sigmas[0] + latents * (1.0 - s2_sigmas[0])
        if joint_audio and audio_latents is not None:
            a_noise = jax.random.normal(keys[6], audio_latents.shape, dtype=jnp.float32).astype(dtype)
            audio_latents = a_noise * s2_sigmas[0] + audio_latents * (1.0 - s2_sigmas[0])
            audio_kwargs["audio_latents"] = audio_latents

        stage2_params = models.stage2_transformer_params or params
        s2_cfg_on = stage2_cfg and text.video_neg_embeddings is not None
        stage2_params = _optimized_layouts(
            stage2_params, latents, positions2, text.video_embeddings,
            text.video_neg_embeddings if s2_cfg_on else None,
            cfg_scale if s2_cfg_on else 1.0, audio_kwargs,
        )
        with timer.phase("stage2_denoise"):
            if stage2_cfg and text.video_neg_embeddings is not None:
                # CFG refinement refines audio too (reference: generate.py:3341-3356
                # routes joint audio through denoise_dev_av with neg embeddings).
                if joint_audio and text.audio_neg_embeddings is None:
                    raise ValueError(
                        "stage2_cfg with joint audio requires audio_neg_embeddings "
                        "(the negative-prompt audio context) in TextConditioning."
                    )
                latents, audio_latents = dn.denoise(
                    stage2_params, config, latents, positions2, text.video_embeddings, s2_sigmas,
                    neg_context=text.video_neg_embeddings, cfg_scale=cfg_scale,
                    state=state2, progress_callback=progress_callback,
                    sequence_parallel=sp, pipeline_parallel=pp,
                    attn_broadcast_interval=attn_broadcast_interval,
                    teacache_threshold=teacache_threshold,
                    cfg_sequential=cfg_sequential,
                    **audio_kwargs,
                )
            else:
                latents, audio_latents = dn.denoise(
                    stage2_params, config, latents, positions2, text.video_embeddings, s2_sigmas,
                    state=state2, progress_callback=progress_callback, sequence_parallel=sp,
                    pipeline_parallel=pp,
                    attn_broadcast_interval=attn_broadcast_interval,
                    teacache_threshold=teacache_threshold,
                    cfg_sequential=cfg_sequential,
                    **audio_kwargs,
                )
            latents, audio_latents = _gather(latents), _gather(audio_latents)
        log_memory("stage2 complete", profile or mem_log)
    else:
        # Dev single-stage CFG (reference: generate.py:3374-3495).
        _check_params_dtype(models, dtype)
        dev_conds = []
        if images:
            models.vae_encoder_params = _stage(models.vae_encoder_params, to_host=False)
            with timer.phase("cond_encode"):
                dev_conds = _encode_conditionings(
                    models, images, (), height, width, num_frames, conditioning_mode, dtype
                )
            models.vae_encoder_params = _stage(models.vae_encoder_params, to_host=True)
        num_tokens = latent_frames * latent_h * latent_w
        sigmas = ltx2_scheduler(steps=num_inference_steps, num_tokens=num_tokens)
        positions = jnp.asarray(
            create_position_grid(num_videos, latent_frames, latent_h, latent_w)
        )
        shape = (num_videos, latent_channels, latent_frames, latent_h, latent_w)
        if num_videos > 1:
            latents, state = _batched_noise(0, shape).astype(dtype), None
        else:
            latents, state = _init_state_with_conditioning(
                shape, dev_conds, keys[0], float(sigmas[0]), dtype
            )
            if mesh is not None and state is not None:
                # Conditioned latents are encoder-jit outputs committed to
                # one device; replicate them over the mesh so the GSPMD
                # denoise program sees a consistent device set.
                latents = _gather(latents)
                state = jax.tree.map(_gather, state)
        params = _optimized_layouts(
            params, latents, positions, text.video_embeddings,
            text.video_neg_embeddings, cfg_scale, audio_kwargs,
        )
        with timer.phase("dev_denoise"):
            latents, audio_latents = dn.denoise(
                params, config, latents, positions, text.video_embeddings, sigmas,
                neg_context=text.video_neg_embeddings, cfg_scale=cfg_scale,
                state=state, progress_callback=progress_callback, sequence_parallel=sp,
                pipeline_parallel=pp,
                # quality/speed dials: reuse the CFG guidance delta / the
                # per-layer attention outputs between full recomputes
                # (video-only; see denoise.py)
                cfg_cache_interval=cfg_cache_interval,
                attn_broadcast_interval=attn_broadcast_interval,
                teacache_threshold=teacache_threshold,
                cfg_sequential=cfg_sequential,
                **audio_kwargs,
            )
            _warm_gate.set()  # scan dispatched: decode-program loads may ride it
            latents, audio_latents = _gather(latents), _gather(audio_latents)
        log_memory("denoise complete", profile or mem_log)

    # Separate audio generation (reference: generate.py:3928-4047).
    if separate_audio:
        if models.audio_transformer_params is None:
            raise ValueError("Separate audio requires an AudioOnly transformer")
        if text.audio_embeddings is None:
            raise ValueError("Separate audio requires audio text embeddings")
        a_positions = jnp.asarray(create_audio_position_grid(1, audio_frames))
        a_init = jax.random.normal(
            keys[7], (1, AUDIO_LATENT_CHANNELS, audio_frames, AUDIO_MEL_BINS), dtype=jnp.float32
        ).astype(dtype)
        with timer.phase("audio_denoise"):
            audio_latents = dn.denoise_audio_only(
                models.audio_transformer_params,
                models.audio_transformer_config or config,
                a_init, a_positions, text.audio_embeddings,
                subsample_sigmas(STAGE_1_SIGMAS, audio_steps, "farthest"),
                audio_neg_context=text.audio_neg_embeddings,
                cfg_scale=cfg_scale if text.audio_neg_embeddings is not None else 1.0,
            )
            audio_latents = _gather(audio_latents)

    # Host fetch FIRST: it is also the honest completion fence for the
    # denoise program — freeing the transformer and staging the decoder
    # below must not overlap a still-executing scan arena (r3 chip run:
    # config-3 OOM'd staging the decoder while the dev scan drained).
    # With overlap_staging the decoder copies ARE issued before this fence
    # (int8-parked they are ~0.4 GiB in flight); a geometry whose arena
    # cannot spare that disables the overlap, keeping this fence strict.
    if not decode_latents_only and output_path is not None:
        # Rides the denoise drain window: the staging transfers and decoder
        # program loads below overlap the still-executing scan. Timed as
        # its own phase so the overlap is visible instead of vanishing
        # between phases (the config-3 warm table undercounted ~45 s here).
        with timer.phase("decode_prefetch_warmup"):
            _prefetch("vae_decoder_params")
            if audio and models.audio_decoder_params is not None:
                _prefetch("audio_decoder_params")
                _prefetch("vocoder_params")
            _warmup_decode_programs(
                (1, latent_channels, latent_frames, latent_h, latent_w),
                tiling_config, keys[2],
            )
    # This fetch is where the still-executing denoise scan actually drains:
    # the denoise phases above time DISPATCH only (async), so without its
    # own phase the scan's wall (~65 s at config-3 40-step) would be
    # attributed to nothing and the phase table would undercount the run.
    # The _prefetch/_warmup calls above deliberately ride this drain window.
    with timer.phase("denoise_drain_fetch"):
        latents_np = np.asarray(latents, dtype=np.float32)
        audio_np = (
            np.asarray(audio_latents, dtype=np.float32) if audio_latents is not None else None
        )

    if low_memory:
        # Reference-parity staging (generate.py:3504-3506 del transformer +
        # clear_cache): drop every transformer param ref so HBM is free for
        # the decode convs, then bring the decoder on-device — but only if
        # this call will actually decode (latents-only returns below would
        # pay a large blocking host->device copy for nothing).
        # ``keep_transformer`` (resident serving): skip the drop — the aux
        # staging/park discipline still applies, but the DiT stays in HBM
        # beside the decode arena. Fits at w4a8 19B + 512²x33 on a 16 GB
        # chip; geometries whose decode arena needs the transformer's space
        # must keep the default.
        if not keep_transformer:
            models.transformer_params = None
            models.stage2_transformer_params = None
            models.audio_transformer_params = None
            params = None  # noqa: F841 — local alias of transformer_params
            stage2_params = None  # noqa: F841
            import gc

            gc.collect()
        if not decode_latents_only and output_path is not None:
            models.vae_decoder_params = _stage_in("vae_decoder_params")
            if models.audio_decoder_params is not None:
                models.audio_decoder_params = _stage_in("audio_decoder_params")
                models.vocoder_params = _stage_in("vocoder_params")
    if decode_latents_only or output_path is None:
        if profile:
            timer.report()
        return GenerateResult(
            video_path=None, latents=latents_np, audio_latents=audio_np, phase_timer=timer
        )

    # Decode + write (reference: generate.py:3522-3857).
    output_path = Path(output_path)
    writer_h, writer_w = (height, width) if crop_params is None else (crop_params[2], crop_params[3])
    video_file = output_path.with_suffix(".temp.mp4") if audio else output_path

    # Live JPEG preview during streaming decode (reference: generate.py:3657-3740).
    import os as _os

    preview_path = _os.environ.get("MLX_VIDEO_PREVIEW_PATH")
    preview_every = int(_os.environ.get("MLX_VIDEO_PREVIEW_EVERY", "12"))
    preview_max_dim = int(_os.environ.get("MLX_VIDEO_PREVIEW_MAX_DIM", "512"))
    last_preview = [-preview_every]
    from mlx_video_tpu.utils.profiling import has_event_sinks

    def _emit_preview(frame_u8: np.ndarray, idx: int) -> None:
        # Two consumers: an atomically-replaced JPEG file (env-configured,
        # reference parity) and in-process event sinks (serve's streaming
        # endpoint forwards base64 preview frames to the HTTP client).
        # One JPEG encode feeds both — this runs on the generation thread
        # while the device lock is held.
        want_stream = has_event_sinks()
        if (preview_path is None and not want_stream) or idx - last_preview[0] < preview_every:
            return
        try:
            import io as _io

            from PIL import Image

            img = Image.fromarray(frame_u8)
            if preview_max_dim > 0:
                img.thumbnail((preview_max_dim, preview_max_dim))
            buf = _io.BytesIO()
            img.save(buf, format="JPEG", quality=85)
            jpeg = buf.getvalue()
            if preview_path is not None:
                tmp = preview_path + ".tmp"
                with open(tmp, "wb") as fh:
                    fh.write(jpeg)
                _os.replace(tmp, preview_path)
            if want_stream:
                import base64

                ui_event({
                    "kind": "preview",
                    "frame": int(idx),
                    "jpeg_b64": base64.b64encode(jpeg).decode(),
                })
            last_preview[0] = idx
        except Exception:
            pass

    # num_videos > 1: denoise was batched (the cost center); decode + write
    # loop per video — the tiled decoder and mp4 writer are host-driven and
    # per-video shapes keep the compiled tile programs identical across the
    # batch (one compile, N reuses).
    video_files = (
        [video_file]
        if num_videos == 1
        else [
            output_path.with_name(f"{output_path.stem}_{i}{output_path.suffix}")
            for i in range(num_videos)
        ]
    )
    with timer.phase("vae_decode"):
        decoded = []
        for vid_idx, vf in enumerate(video_files):
            # frame indices restart at 0 per video: reset the preview
            # throttle or previews silently stop after the first video
            last_preview[0] = -preview_every
            writer = media.VideoWriter(vf, writer_w, writer_h, fps, encoder=video_encoder)
            t0 = time.perf_counter()
            frames_done = [0]

            def on_ready(frames: np.ndarray, start_idx: int) -> None:
                u8 = media.frames_to_uint8(frames)[:num_frames - start_idx]
                if crop_params is not None:
                    top, left, out_h, out_w = crop_params
                    u8 = u8[:, top : top + out_h, left : left + out_w]
                writer.write(u8)
                _emit_preview(u8[-1], start_idx + u8.shape[0] - 1)
                frames_done[0] += u8.shape[0]
                ui_event(
                    {
                        "kind": "progress",
                        "phase": "decode",
                        "current": frames_done[0],
                        "total": num_frames,
                        "video": vid_idx,
                        "eta_seconds": (time.perf_counter() - t0)
                        / max(frames_done[0], 1)
                        * max(num_frames - frames_done[0], 0),
                    }
                )

            decoded.append(
                decode_latents(
                    models,
                    latents[vid_idx : vid_idx + 1] if num_videos > 1 else latents,
                    tiling_config, decode_timestep=0.05, mesh=mesh,
                    # per-video key: the timestep-conditioned decoder injects
                    # noise, and video i must decode identically to its
                    # independent seed-i run regardless of batching
                    noise_key=keys[2] if num_videos == 1 else vid_keys[vid_idx][2],
                    on_frames_ready=on_ready,
                )
            )
            writer.close()
        video_np = decoded[0] if num_videos == 1 else np.concatenate(decoded, axis=0)

    # Audio decode + mux (reference: generate.py:3928-4160).
    if audio and audio_np is not None and models.audio_decoder_params is not None:
        from mlx_video_tpu.models.ltx.audio_vae.processing import save_wav
        from mlx_video_tpu.models.ltx.audio_vae.vocoder import decode_audio

        with timer.phase("audio_decode"):
            wav = decode_audio(
                jnp.asarray(audio_np),
                models.audio_decoder_params,
                models.audio_decoder_config,
                models.vocoder_params,
                models.vocoder_config,
            )
            wav_path = (
                Path(output_audio_path) if output_audio_path else output_path.with_suffix(".wav")
            )
            save_wav(str(wav_path), np.asarray(wav), models.vocoder_config.output_sample_rate)
        with timer.phase("audio_mux"):
            if media.mux_audio(
                video_file, wav_path, output_path,
                audio_filter=audio_filter, audio_bitrate=audio_bitrate,
                audio_sample_rate=models.vocoder_config.output_sample_rate
                if models.vocoder_config is not None else 24000,
            ):
                video_file.unlink(missing_ok=True)
            else:
                video_file.rename(output_path)
    elif video_file != output_path and video_file.exists():
        # audio was requested but could not be produced (no audio latents /
        # no audio decoder): the video must still land at output_path, not
        # be orphaned at *.temp.mp4.
        video_file.rename(output_path)

    result_paths = video_files if num_videos > 1 else None

    if low_memory and keep_transformer:
        # Resident-serving steady state: leave the aux trees PARKED so the
        # NEXT request starts pre-parked — the park's bf16+int8 transient
        # then happens HERE, with no scan arena live (the safest moment),
        # instead of racing the next request's stage-1 scan (measured
        # RESOURCE_EXHAUSTED at 19B, PERF.md r5). _stage fences internally.
        models.vae_decoder_params = _stage(models.vae_decoder_params, to_host=True)
        models.upsampler_params = _stage(models.upsampler_params, to_host=True)
        if models.audio_decoder_params is not None:
            models.audio_decoder_params = _stage(models.audio_decoder_params, to_host=True)
            models.vocoder_params = _stage(models.vocoder_params, to_host=True)

    if profile:
        timer.report()
    return GenerateResult(
        video_path=video_files[0] if num_videos > 1 else output_path,
        latents=latents_np,
        audio_latents=audio_np,
        video_paths=result_paths,
        video=video_np,
        phase_timer=timer,
    )
