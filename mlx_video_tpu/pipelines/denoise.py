"""Denoising loops for the distilled / dev / AV / audio-only pipelines.

Behavioral spec: reference mlx_video/generate.py:564-881 (denoise_distilled),
1060-1327 (denoise_dev CFG), 1330-1703 (denoise_dev_av / denoise_audio_only).

TPU-native design (deliberately different from the reference's per-step
``mx.compile`` + ``mx.eval`` batching):

- The WHOLE sigma loop is one ``lax.scan`` inside one module-level
  ``jax.jit`` — one compile per (shape, config) combination, cached across
  calls; zero per-step dispatch overhead. A Python-loop mode
  (``progress_callback``) reuses one jitted step for step-level progress.
- CFG runs batched (2B) by default — on TPU the doubled batch rides the MXU
  essentially for free vs. two sequential forwards
  (reference cfg_batch: generate.py:1239-1255).
- Euler update in fp32 (reference: generate.py:835-845); the final step
  (sigma_next = 0) uses the same formula, which reduces to ``denoised``.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mlx_video_tpu.config import LTXModelConfig
from mlx_video_tpu.models.ltx import rope as rope_lib
from mlx_video_tpu.models.ltx.model import Modality, adaln_apply, ltx_apply, to_denoised
from mlx_video_tpu.ops.linear import linear
from mlx_video_tpu.ops.norms import rms_norm
from mlx_video_tpu.pipelines.conditioning import LatentState, apply_denoise_mask


def flatten_video_latents(latents: jax.Array) -> jax.Array:
    """(B, C, F, H, W) -> (B, F*H*W, C) token layout (reference: generate.py:651)."""
    b, c = latents.shape[0], latents.shape[1]
    return jnp.transpose(latents.reshape(b, c, -1), (0, 2, 1))


def unflatten_video_latents(tokens: jax.Array, shape) -> jax.Array:
    """(B, S, C) -> (B, C, F, H, W)."""
    b, c, f, h, w = shape
    return jnp.transpose(tokens, (0, 2, 1)).reshape(b, c, f, h, w)


def flatten_audio_latents(latents: jax.Array) -> jax.Array:
    """(B, C, T, M) -> (B, T, C*M) (reference: generate.py:665-667)."""
    b, c, t, m = latents.shape
    return jnp.transpose(latents, (0, 2, 1, 3)).reshape(b, t, c * m)


def unflatten_audio_latents(tokens: jax.Array, shape) -> jax.Array:
    """(B, T, C*M) -> (B, C, T, M)."""
    b, c, t, m = shape
    return jnp.transpose(tokens.reshape(b, t, c, m), (0, 2, 1, 3))


def video_timesteps_mask(state: Optional[LatentState], shape, dtype) -> jax.Array:
    """Per-token denoise mask (B, F*H*W) from per-frame state
    (reference: generate.py:597-606).

    With no conditioning state every token shares one sigma, so the mask
    collapses to (B, 1): adaLN modulation then stays (B, 1, 6*dim) instead of
    (B, S, 6*dim) — numerically identical by broadcast, but it removes
    ~6*dim*S per-layer modulation reads from HBM (measured ~3% of the
    48-layer forward at DiT geometry) and the per-token timestep MLP.
    """
    b, _, f, h, w = shape
    if state is None:
        return jnp.ones((b, 1), dtype=dtype)
    mask = jnp.broadcast_to(state.denoise_mask.reshape(b, 1, f, 1, 1), (b, 1, f, h, w))
    return mask.reshape(b, f * h * w).astype(dtype)


def precompute_video_pe(config: LTXModelConfig, positions: jax.Array):
    return rope_lib.precompute_freqs_cis(
        positions,
        dim=config.inner_dim,
        theta=config.positional_embedding_theta,
        max_pos=config.positional_embedding_max_pos,
        use_middle_indices_grid=config.use_middle_indices_grid,
        num_attention_heads=config.num_attention_heads,
        rope_type=config.rope_type,
        double_precision=config.double_precision_rope,
    )


def precompute_audio_pe(config: LTXModelConfig, positions: jax.Array):
    return rope_lib.precompute_freqs_cis(
        positions,
        dim=config.audio_inner_dim,
        theta=config.positional_embedding_theta,
        max_pos=config.audio_positional_embedding_max_pos,
        use_middle_indices_grid=config.use_middle_indices_grid,
        num_attention_heads=config.audio_num_attention_heads,
        rope_type=config.rope_type,
        double_precision=config.double_precision_rope,
    )


def _euler_step(latents, denoised, sigma, sigma_next):
    """fp32 Euler update; exact at sigma_next=0 (reference: generate.py:835-847)."""
    lat = latents.astype(jnp.float32)
    den = denoised.astype(jnp.float32)
    out = den + sigma_next.astype(jnp.float32) * (lat - den) / sigma.astype(jnp.float32)
    return out.astype(latents.dtype)


def _cfg_combine(pos, neg, scale: float):
    """v = v_pos + (scale-1)(v_pos - v_neg) (reference: generate.py:1136, 1283)."""
    return pos + (scale - 1.0) * (pos - neg)


def _double(x):
    """(B, ...) -> (2B, ...); XLA lowers this to a broadcast, not a copy."""
    return jnp.concatenate([x, x], axis=0)


def _half(x, i: int):
    """(2B, ...) -> the i-th (B, ...) half (inverse of the CFG doubling)."""
    return jnp.split(x, 2, axis=0)[i]


def _host_step_event(step, sigma, total: int):
    from mlx_video_tpu.utils.profiling import step_event

    step_event(int(step) + 1, total, sigma=float(sigma))


def _tc_signal(params, config, v_tokens, ts):
    """TeaCache change signal: block-0's adaLN-modulated self-attention input.

    The timestep-modulated input to the first transformer block tracks how
    much a denoise step will change the velocity field far better than the
    raw latent does (TeaCache, arXiv:2411.19108). Cost: one 128->4096
    patchify matmul + the adaLN MLP — ~3% of a full forward. fp32, (B,S,D).
    """
    vparams = params["video"]
    x = linear(vparams["patchify_proj"], v_tokens)
    mod, _ = adaln_apply(
        vparams["adaln_single"],
        (ts * config.timestep_scale_multiplier).reshape(-1),
        x.dtype,
    )
    # ts is (B, S) with conditioning, (B, 1) without (shared sigma); the
    # modulation broadcasts over the token axis either way.
    b, s_t = ts.shape[0], ts.shape[1]
    d = x.shape[-1]
    mod = mod.reshape(b, s_t, 6, d).astype(jnp.float32)
    # block 0's scale_shift_table (blocks are scan-stacked on axis 0)
    tab0 = params["blocks"]["scale_shift_table"][0].astype(jnp.float32)
    shift = tab0[0][None, None, :] + mod[:, :, 0, :]
    scale = tab0[1][None, None, :] + mod[:, :, 1, :]
    xn = rms_norm(x, eps=config.norm_eps).astype(jnp.float32)
    return xn * (1.0 + scale) + shift


def _make_apply(pp):
    """Forward selector: plain ``ltx_apply`` or the pipeline-parallel one.

    ``pp`` = (mesh, axis, num_microbatches[, data_axis]) routes every
    per-step DiT forward through the GPipe stage loop
    (parallel/pipeline.py) — serving-batch scale-out over a ``pipe`` mesh
    axis (cross-slice/DCN); mutually exclusive with ``sp`` ring attention.
    """
    if pp is None:
        return ltx_apply
    from mlx_video_tpu.parallel.pipeline import apply_from_tuple

    return apply_from_tuple(pp)


def _denoise_step(
    params, bundle, config, cfg_scale, use_cfg, enable_audio, progress, num_steps, sp,
    cfg_cache_interval, pp, attn_broadcast_interval, use_teacache, teacache_threshold,
    cfg_sequential, carry, xs
):
    """One Euler step over both modalities. ``bundle`` holds all loop-constant
    arrays (contexts, positions, RoPE tables, masks, conditioning state).

    With ``progress`` set, each step emits a host-side progress event via
    ``jax.debug.callback`` — the TPU-native counterpart of the reference's
    per-step echo (generate.py:765-775): the sigma loop stays ONE compiled
    ``lax.scan`` and progress still streams as device steps retire.

    ``cfg_cache_interval > 1`` (video-only CFG): the guidance delta
    ``v_pos - v_neg`` is recomputed every k-th step and reused in between —
    cached steps run ONE batch-1 forward instead of the batched-2B one,
    cutting CFG denoise FLOPs by ~(k-1)/(2k) (new capability; the guidance
    direction drifts slowly across adjacent sigmas, cf. delta-caching /
    attention-broadcast literature). Exact when pos == neg context; a
    quality/speed dial otherwise.
    """
    apply = _make_apply(pp)
    tc = use_teacache and not enable_audio
    cfg_caching = use_cfg and cfg_cache_interval > 1 and not enable_audio
    pab_k = attn_broadcast_interval if not enable_audio else 1
    pab_cache = None
    tc_carry = None
    if tc:
        v_lat, a_lat, tc_carry = carry
        v_delta = None
    elif cfg_caching:
        v_lat, a_lat, v_delta = carry
    elif pab_k > 1:
        v_lat, a_lat, pab_cache = carry
        v_delta = None
    else:
        v_lat, a_lat = carry
        v_delta = None
    sig_pair, step_idx = xs
    sigma, sigma_next = sig_pair[0], sig_pair[1]
    if progress:
        jax.debug.callback(
            partial(_host_step_event, total=num_steps), step_idx, sigma, ordered=True
        )
    dtype = v_lat.dtype if not enable_audio or v_lat.ndim == 5 else a_lat.dtype

    if tc:
        # TeaCache (arXiv:2411.19108), adaptive full-forward reuse: the
        # relative L1 change of block-0's timestep-modulated input is
        # accumulated across steps; while it stays under the threshold the
        # cached velocity is reused and the ENTIRE 48-block forward is
        # skipped. Unlike the fixed-interval dials (cfg_cache_interval,
        # attn_broadcast_interval) this spends compute where the trajectory
        # actually bends — e.g. refreshing densely at high sigma and
        # coasting through the tail. Step 0 is always a full step.
        vel_cache, prev_sig, accum = tc_carry
        vshape = v_lat.shape
        v_tokens = flatten_video_latents(v_lat)
        ts = (sigma * bundle["v_mask"]).astype(v_lat.dtype)

        sig = _tc_signal(params, config, v_tokens, ts)
        rel = jnp.mean(jnp.abs(sig - prev_sig)) / (jnp.mean(jnp.abs(prev_sig)) + 1e-8)
        accum_new = accum + rel
        full = jnp.logical_or(step_idx == 0, accum_new >= teacache_threshold)

        def _tc_full(cache_prev):
            if use_cfg:
                mod = Modality(
                    latent=_double(v_tokens), timesteps=_double(ts),
                    context=bundle["context"], positions=bundle["positions"],
                    pe=(bundle["pe_cos"], bundle["pe_sin"]),
                )
                vel, _ = apply(params, config, video=mod, sp=sp)
                pos, neg = jnp.split(vel, 2, axis=0)
                return _cfg_combine(pos, neg, cfg_scale).astype(jnp.float32)
            mod = Modality(
                latent=v_tokens, timesteps=ts,
                context=bundle["context"], positions=bundle["positions"],
                pe=(bundle["pe_cos"], bundle["pe_sin"]),
            )
            vel, _ = apply(params, config, video=mod, sp=sp)
            return vel.astype(jnp.float32)

        v_vel = jax.lax.cond(full, _tc_full, lambda cache_prev: cache_prev, vel_cache)
        accum_out = jnp.where(full, jnp.float32(0.0), accum_new)

        v_vel_t = unflatten_video_latents(v_vel.astype(v_lat.dtype), vshape)
        denoised = to_denoised(v_lat, v_vel_t, sigma)
        if "denoise_mask" in bundle:
            denoised = apply_denoise_mask(denoised, bundle["clean_latent"], bundle["denoise_mask"])
        v_out = _euler_step(v_lat, denoised, sigma, sigma_next)
        return (v_out, a_lat, (v_vel, sig, accum_out)), None

    if cfg_caching:
        vshape = v_lat.shape
        v_tokens = flatten_video_latents(v_lat)
        ts = (sigma * bundle["v_mask"]).astype(v_lat.dtype)
        b = v_tokens.shape[0]

        def _full(delta_prev):
            mod = Modality(
                latent=_double(v_tokens), timesteps=_double(ts),
                context=bundle["context"], positions=bundle["positions"],
                pe=(bundle["pe_cos"], bundle["pe_sin"]),
            )
            vel, _ = apply(params, config, video=mod, sp=sp)
            pos, neg = jnp.split(vel, 2, axis=0)
            return pos, pos.astype(jnp.float32) - neg.astype(jnp.float32)

        def _cached(delta_prev):
            mod = Modality(
                latent=v_tokens, timesteps=ts,
                context=bundle["context"][:b], positions=bundle["positions"][:b],
                pe=(bundle["pe_cos"][:b], bundle["pe_sin"][:b]),
            )
            pos, _ = apply(params, config, video=mod, sp=sp)
            return pos, delta_prev

        v_pos, v_delta = jax.lax.cond(
            step_idx % cfg_cache_interval == 0, _full, _cached, v_delta
        )
        v_vel = (v_pos.astype(jnp.float32) + (cfg_scale - 1.0) * v_delta).astype(v_pos.dtype)
        v_vel = unflatten_video_latents(v_vel, vshape)
        denoised = to_denoised(v_lat, v_vel, sigma)
        if "denoise_mask" in bundle:
            denoised = apply_denoise_mask(denoised, bundle["clean_latent"], bundle["denoise_mask"])
        v_out = _euler_step(v_lat, denoised, sigma, sigma_next)
        return (v_out, a_lat, v_delta), None

    seq_cfg = use_cfg and cfg_sequential
    video_mod = None
    vshape = None
    if v_lat.ndim == 5:  # video enabled
        vshape = v_lat.shape
        v_tokens = flatten_video_latents(v_lat)
        ts = (sigma * bundle["v_mask"]).astype(v_lat.dtype)
        if seq_cfg:
            # Sequential CFG: two batch-B modalities over the pos/neg halves
            # of the bundle's doubled context (positions/pe halves are
            # identical broadcasts, so _half is free).
            video_mod = tuple(
                Modality(
                    latent=v_tokens,
                    timesteps=ts,
                    context=_half(bundle["context"], i),
                    positions=_half(bundle["positions"], i),
                    pe=(_half(bundle["pe_cos"], i), _half(bundle["pe_sin"], i)),
                )
                for i in (0, 1)
            )
        else:
            if use_cfg:
                v_tokens, ts = _double(v_tokens), _double(ts)
            video_mod = Modality(
                latent=v_tokens,
                timesteps=ts,
                context=bundle["context"],
                positions=bundle["positions"],
                pe=(bundle["pe_cos"], bundle["pe_sin"]),
            )

    audio_mod = None
    ashape = None
    if enable_audio:
        ashape = a_lat.shape
        a_tokens = flatten_audio_latents(a_lat)
        a_ts = (sigma * bundle["a_mask"]).astype(a_lat.dtype)
        if seq_cfg:
            audio_mod = tuple(
                Modality(
                    latent=a_tokens,
                    timesteps=a_ts,
                    context=_half(bundle["a_context"], i),
                    positions=_half(bundle["a_positions"], i),
                    pe=(_half(bundle["a_pe_cos"], i), _half(bundle["a_pe_sin"], i)),
                )
                for i in (0, 1)
            )
        else:
            if use_cfg:
                a_tokens, a_ts = _double(a_tokens), _double(a_ts)
            audio_mod = Modality(
                latent=a_tokens,
                timesteps=a_ts,
                context=bundle["a_context"],
                positions=bundle["a_positions"],
                pe=(bundle["a_pe_cos"], bundle["a_pe_sin"]),
            )

    if pab_k > 1:
        # Pyramid Attention Broadcast (arXiv:2408.12588): every k-th step
        # recomputes and caches all per-layer attention outputs; in between
        # the forward reuses them and skips every QKV/softmax/out projection
        # (attention is ~40% of the measured w8a8 step) while the adaLN
        # gates/modulation and FFNs stay fresh. Exact when the cached and
        # fresh attention inputs coincide; a quality/speed dial otherwise.
        def _pab_full(cache_prev):
            vel, _, cache = apply(params, config, video=video_mod, sp=sp, pab="collect")
            return vel, cache

        def _pab_cached(cache_prev):
            vel, _ = apply(params, config, video=video_mod, sp=sp, pab=cache_prev)
            return vel, cache_prev

        v_vel, pab_cache = jax.lax.cond(
            step_idx % pab_k == 0, _pab_full, _pab_cached, pab_cache
        )
        a_vel = None
    elif seq_cfg:
        # Sequential CFG (memory dial): two batch-B forwards back-to-back
        # instead of one batch-2B — halves the transformer's peak activation
        # footprint for HBM-tight e2e configs (the reference's non-cfg_batch
        # default, generate.py:1239-1283). On a compute-bound chip the two
        # calls run on the single TPU stream, so throughput is ~batched CFG.
        v_pos_vel, a_pos_vel = apply(
            params, config,
            video=video_mod[0] if video_mod is not None else None,
            audio=audio_mod[0] if audio_mod is not None else None, sp=sp,
        )
        v_neg_vel, a_neg_vel = apply(
            params, config,
            video=video_mod[1] if video_mod is not None else None,
            audio=audio_mod[1] if audio_mod is not None else None, sp=sp,
        )
        v_vel = (
            _cfg_combine(v_pos_vel, v_neg_vel, cfg_scale)
            if video_mod is not None else None
        )
        a_vel = (
            _cfg_combine(a_pos_vel, a_neg_vel, cfg_scale)
            if audio_mod is not None else None
        )
    else:
        v_vel, a_vel = apply(params, config, video=video_mod, audio=audio_mod, sp=sp)

    v_out = v_lat
    if video_mod is not None:
        if use_cfg and not seq_cfg:
            v_pos, v_neg = jnp.split(v_vel, 2, axis=0)
            v_vel = _cfg_combine(v_pos, v_neg, cfg_scale)
        v_vel = unflatten_video_latents(v_vel, vshape)
        denoised = to_denoised(v_lat, v_vel, sigma)
        if "denoise_mask" in bundle:
            denoised = apply_denoise_mask(denoised, bundle["clean_latent"], bundle["denoise_mask"])
        v_out = _euler_step(v_lat, denoised, sigma, sigma_next)

    a_out = a_lat
    if enable_audio and a_vel is not None:
        if use_cfg and not seq_cfg:
            a_pos, a_neg = jnp.split(a_vel, 2, axis=0)
            a_vel = _cfg_combine(a_pos, a_neg, cfg_scale)
        a_vel = unflatten_audio_latents(a_vel, ashape)
        a_denoised = to_denoised(a_lat, a_vel, sigma)
        a_out = _euler_step(a_lat, a_denoised, sigma, sigma_next)

    if pab_k > 1:
        return (v_out, a_out, pab_cache), None
    return (v_out, a_out), None


_SCAN_STATICS = ("config", "use_cfg", "enable_audio", "progress", "sp",
                 "cfg_cache_interval", "pp", "attn_broadcast_interval",
                 "use_teacache", "cfg_sequential", "return_carry",
                 "progress_total")


def _denoise_scan_impl(
    params, latents, positions, context, neg_context, state,
    audio_latents, audio_positions, audio_context, audio_neg_context,
    sig_pairs, config, cfg_scale, use_cfg, enable_audio, progress=False, sp=None,
    cfg_cache_interval=1, pp=None, attn_broadcast_interval=1, use_teacache=False,
    teacache_threshold=0.0, cfg_sequential=False,
    step_offset=None, dial_carry=None, return_carry=False, progress_total=None,
):
    """The WHOLE denoise call is one compiled program: bundle construction
    (RoPE tables, contexts, masks) + the sigma-scan. Building the bundle
    eagerly costs a long chain of per-op dispatches (~100 ms of fixed
    overhead per call through the axon tunnel, measured); inside the jit it
    is one dispatch and XLA hoists the loop-invariant prep out of the scan.

    ``cfg_scale`` and ``teacache_threshold`` are traced scalar operands, not
    statics: only their on/off-ness (``use_cfg`` / ``use_teacache``) shapes
    the program, so sweeping values shares ONE compiled scan instead of
    paying a full multi-minute recompile per value (a serve client tuning a
    dial would otherwise grow the compile cache without bound).

    **Segmentation** (``step_offset`` / ``dial_carry`` / ``return_carry`` /
    ``progress_total``): a long schedule at big geometry runs as ONE device
    program for 60+ s, which the TPU worker's watchdog kills (r4 chip
    drives: 40-step x 5184-token scans crashed the worker; 8-step scans of
    the identical program were fine). ``denoise()`` therefore dispatches the
    schedule in segments of the SAME compiled program: ``step_offset`` (a
    traced scalar) keeps the absolute step index flowing into the dial
    ``% k`` logic and progress events, ``dial_carry``/``return_carry``
    thread the dial state (TeaCache / guidance-delta / PAB caches) between
    segments, and ``progress_total`` keeps the display denominator at the
    full schedule length. Exact: identical math to the single-scan form.
    """
    bundle = _make_bundle(
        config, latents, positions, context, state, use_cfg, neg_context,
        audio_latents, audio_positions, audio_context, audio_neg_context,
    )
    if latents is not None:
        init_v = latents
        filler_dtype = latents.dtype
    else:
        init_v = jnp.zeros((0,), dtype=audio_latents.dtype)
        filler_dtype = audio_latents.dtype
    init_a = audio_latents if enable_audio else jnp.zeros((0,), dtype=filler_dtype)

    num_steps = sig_pairs.shape[0]
    step = partial(
        _denoise_step, params, bundle, config, cfg_scale, use_cfg, enable_audio,
        progress, progress_total if progress_total is not None else num_steps,
        sp, cfg_cache_interval, pp, attn_broadcast_interval,
        use_teacache, teacache_threshold, cfg_sequential,
    )
    idx = jnp.arange(num_steps, dtype=jnp.int32)
    if step_offset is not None:
        idx = idx + step_offset
    xs = (sig_pairs, idx)
    out_carry = None
    if use_teacache and not enable_audio:
        # TeaCache carry: cached combined velocity (fp32 tokens), previous
        # change signal, accumulated relative change. Step 0 is always full
        # so the zeros velocity init is never read.
        b, c = latents.shape[0], latents.shape[1]
        seq = latents.shape[2] * latents.shape[3] * latents.shape[4]
        init_tc = dial_carry if dial_carry is not None else (
            jnp.zeros((b, seq, c), dtype=jnp.float32),
            jnp.zeros((b, seq, config.inner_dim), dtype=jnp.float32),
            jnp.float32(0.0),
        )
        (v, a, out_carry), _ = jax.lax.scan(step, (init_v, init_a, init_tc), xs)
    elif use_cfg and cfg_cache_interval > 1 and not enable_audio:
        # guidance-delta carry (fp32 tokens); step 0 is always a full step
        # (0 % k == 0) so the zeros init is never read.
        init_delta = dial_carry if dial_carry is not None else jnp.zeros(
            (latents.shape[0], latents.shape[2] * latents.shape[3] * latents.shape[4],
             latents.shape[1]),
            dtype=jnp.float32,
        )
        (v, a, out_carry), _ = jax.lax.scan(step, (init_v, init_a, init_delta), xs)
    elif attn_broadcast_interval > 1 and not enable_audio:
        # per-layer SELF-attention output cache (model dtype; cross-attn is
        # recomputed — see block_apply); step 0 is always a full (collect)
        # step so the zeros init is never read
        n_layers = jax.tree.leaves(params["blocks"])[0].shape[0]
        bf = latents.shape[0] * (2 if use_cfg else 1)
        seq = latents.shape[2] * latents.shape[3] * latents.shape[4]
        init_cache = dial_carry if dial_carry is not None else {
            "self": jnp.zeros((n_layers, bf, seq, config.inner_dim), dtype=latents.dtype),
        }
        (v, a, out_carry), _ = jax.lax.scan(step, (init_v, init_a, init_cache), xs)
    else:
        (v, a), _ = jax.lax.scan(step, (init_v, init_a), xs)
    if return_carry:
        return v, a, out_carry
    return v, a


from mlx_video_tpu.utils.aot import aot_jit as _aot_jit

# dial_carry is donated: between segments the incoming dial state is dead
# the moment the next segment's output exists, and the PAB cache is ~4 GiB
# at dev geometry — an un-aliased in+out pair would not fit beside the 19B.
_denoise_scan = _aot_jit(
    _denoise_scan_impl, static_argnames=_SCAN_STATICS,
    donate_argnames=("dial_carry",),
)


def preferred_param_formats(
    params: dict,
    config: LTXModelConfig,
    latents,
    positions,
    context,
    neg_context=None,
    cfg_scale: float = 1.0,
    audio_latents=None,
    audio_positions=None,
    audio_context=None,
    audio_neg_context=None,
    cfg_sequential: bool = False,
):
    """AOT-lower the denoise scan with compiler-chosen (AUTO) input layouts
    and return the ``jax.experimental.layout.Format`` pytree XLA wants for
    ``params`` at this geometry.

    Why: with default (row-major) param layouts, XLA prepends in-program
    relayout copies of the big weight stacks — measured ~3 GB of HLO temps
    for the 48-layer w4a8 stacks at dev-CFG geometry (the (L, out, words)
    uint32 quant stacks get copied to out-minor (0, 2, 1)). Placing the
    params in the preferred layouts up front (``relayout_params``) removes
    the copies entirely: measured temp drop 1.577 -> 1.044 GiB on the
    4-layer probe, and it is what lets the full 19B batched-CFG dev scan
    fit one 16 GB chip. Step count does not shape layouts, so discovery
    lowers a 2-step scan (cheap, persistently cached).
    """
    from jax.experimental.layout import Format, Layout

    from mlx_video_tpu.utils import layouts as layout_cache

    def _sds(x):
        return jax.ShapeDtypeStruct(x.shape, x.dtype) if hasattr(x, "shape") else x

    use_cfg = cfg_scale != 1.0 and neg_context is not None
    sig_pairs = jax.ShapeDtypeStruct((2, 2), jnp.float32)
    args = jax.tree.map(
        _sds,
        (params, latents, positions, context,
         neg_context if use_cfg else None, None,
         audio_latents, audio_positions, audio_context,
         audio_neg_context if use_cfg else None, sig_pairs),
    )
    statics = (
        config, use_cfg, audio_latents is not None,
        bool(cfg_sequential and use_cfg),
    )
    # Disk-cached discovery: the AUTO compile costs 8-20 s per geometry per
    # process even against a warm persistent XLA cache (59 s of the warm
    # config-4 drive); the formats themselves are a few KB of JSON.
    key = layout_cache.cache_key("denoise_scan_params", args, statics)
    cached = layout_cache.load_formats(key, jax.tree.map(_sds, params))
    if cached is not None:
        return cached

    auto = jax.jit(
        _denoise_scan_impl,
        static_argnames=_SCAN_STATICS,
        in_shardings=Format(Layout.AUTO),
    )
    compiled = auto.lower(
        *args,
        config=config,
        cfg_scale=jax.ShapeDtypeStruct((), jnp.float32),
        use_cfg=use_cfg,
        enable_audio=audio_latents is not None,
        cfg_sequential=bool(cfg_sequential and use_cfg),
    ).compile()
    fmts = compiled.input_formats[0][0]
    layout_cache.save_formats(key, fmts)
    return fmts


def relayout_params(
    params: dict, formats, donate: bool = False, fence_bytes: int = 2 << 30
) -> dict:
    """Re-place a param pytree into the layouts from
    :func:`preferred_param_formats` (leaf-wise on-device relayout).

    ``donate=True`` deletes each source buffer as soon as its relayouted
    copy exists (identity-checked: unchanged-layout leaves come back as the
    same buffer and are NOT deleted). Required at 19B on one chip — holding
    both placements of the full tree is 2x ~8-11 GB. The caller must drop
    every other reference to the input tree (the old leaves raise on use).

    Donated relayouts are FENCED every ``fence_bytes`` of moved leaves: on
    TPU the copies' output buffers are allocated at enqueue time while the
    donated frees only retire as the queue drains, so dispatching the whole
    tree at once makes both placements transiently coexist regardless of
    the deletes (the r4 config-5 chip drive RESOURCE_EXHAUSTED'd exactly
    there — the grad-step preferred formats change nearly every stacked
    leaf). The fence FETCHES a scalar enqueued behind the copies (in-order
    queue; block_until_ready returns early through the tunnel), bounding
    the transient to ``fence_bytes``."""
    import os as _os
    import sys as _sys

    debug = _os.environ.get("MLX_VIDEO_RELAYOUT_DEBUG") == "1"
    moved_since_fence = 0
    on_accel = jax.default_backend() != "cpu"

    def move(path, x, f):
        nonlocal moved_since_fence
        y = jax.device_put(x, f)
        if debug:  # before the fence: shows the leaf in flight on an OOM
            print(
                f"relayout {jax.tree_util.keystr(path)}: "
                f"{getattr(x, 'nbytes', 0) / 2**20:.0f} MiB "
                f"{'moved' if y is not x else 'kept'}",
                file=_sys.stderr, flush=True,
            )
        if donate and y is not x:
            nbytes = getattr(x, "nbytes", 0)
            try:
                x.delete()
            except Exception:
                pass
            moved_since_fence += nbytes
            if on_accel and moved_since_fence >= fence_bytes:
                float(jnp.sum(jnp.ones((8,), jnp.float32)))
                moved_since_fence = 0
        return y

    return jax.tree_util.tree_map_with_path(move, params, formats)


@partial(jax.jit, static_argnames=("config", "use_cfg", "enable_audio", "sp", "pp", "cfg_sequential"))
def _denoise_one(params, bundle, carry, sig_pair, config, cfg_scale, use_cfg, enable_audio, sp=None, pp=None, cfg_sequential=False):
    out, _ = _denoise_step(
        params, bundle, config, cfg_scale, use_cfg, enable_audio, False, 1, sp, 1, pp, 1,
        False, 0.0, cfg_sequential, carry, (sig_pair, jnp.int32(0)),
    )
    return out


@partial(jax.jit, static_argnames=("config", "use_cfg"))
def _make_bundle(
    config,
    latents,
    positions,
    context,
    state,
    use_cfg,
    neg_context,
    audio_latents,
    audio_positions,
    audio_context,
    audio_neg_context,
):
    enable_audio = audio_latents is not None
    bundle = {}
    if latents is not None:
        dtype = latents.dtype
        bundle["v_mask"] = video_timesteps_mask(state, latents.shape, dtype)
        pe = precompute_video_pe(config, positions)
        if use_cfg:
            bundle["context"] = jnp.concatenate([context, neg_context], axis=0)
            bundle["positions"] = _double(positions)
            bundle["pe_cos"], bundle["pe_sin"] = _double(pe[0]), _double(pe[1])
        else:
            bundle["context"] = context
            bundle["positions"] = positions
            bundle["pe_cos"], bundle["pe_sin"] = pe
        if state is not None:
            bundle["clean_latent"] = state.clean_latent
            bundle["denoise_mask"] = state.denoise_mask
    if enable_audio:
        adtype = audio_latents.dtype
        # Audio tokens always share one sigma (no audio conditioning masks):
        # (B, 1) keeps the audio adaLN modulation per-batch, not per-token.
        bundle["a_mask"] = jnp.ones((audio_latents.shape[0], 1), dtype=adtype)
        a_pe = precompute_audio_pe(config, audio_positions)
        if use_cfg:
            bundle["a_context"] = jnp.concatenate([audio_context, audio_neg_context], axis=0)
            bundle["a_positions"] = _double(audio_positions)
            bundle["a_pe_cos"], bundle["a_pe_sin"] = _double(a_pe[0]), _double(a_pe[1])
        else:
            bundle["a_context"] = audio_context
            bundle["a_positions"] = audio_positions
            bundle["a_pe_cos"], bundle["a_pe_sin"] = a_pe
    return bundle


def denoise(
    params: dict,
    config: LTXModelConfig,
    latents: jax.Array,
    positions: jax.Array,
    context: jax.Array,
    sigmas: Sequence[float],
    neg_context: Optional[jax.Array] = None,
    cfg_scale: float = 1.0,
    state: Optional[LatentState] = None,
    audio_latents: Optional[jax.Array] = None,
    audio_positions: Optional[jax.Array] = None,
    audio_context: Optional[jax.Array] = None,
    audio_neg_context: Optional[jax.Array] = None,
    progress_callback: Optional[Callable[[int, int], None]] = None,
    sequence_parallel=None,
    cfg_cache_interval: int = 1,
    pipeline_parallel=None,
    attn_broadcast_interval: int = 1,
    teacache_threshold: float = 0.0,
    cfg_sequential: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Run the full denoise loop.

    - ``cfg_scale == 1.0`` / no ``neg_context``: distilled path (no CFG),
      reference generate.py:564-881.
    - otherwise: dev CFG path with one batched pos/neg forward,
      reference generate.py:1060-1327.
    - ``audio_latents`` enables joint AV denoising over a shared sigma
      schedule (reference: generate.py:642-710, 1330+).
    - ``sequence_parallel``: optional ``(Mesh, axis_name)`` — ring-attention
      sequence sharding of the token axis inside every self-attention
      (long-video capability, SURVEY §2.12); requires the token count to be
      divisible by the axis size.
    - ``cfg_cache_interval``: k > 1 recomputes the CFG guidance delta every
      k-th step and reuses it in between (cached steps run a single batch-1
      forward) — a quality/speed dial for long CFG schedules. Video-only
      CFG; ignored on the distilled path.
    - ``attn_broadcast_interval``: k > 1 recomputes all per-layer attention
      outputs every k-th step and broadcasts them in between (Pyramid
      Attention Broadcast, arXiv:2408.12588) — cached steps skip every
      QKV/softmax/out projection. Video-only; a quality/speed dial.
    - ``pipeline_parallel``: optional (mesh, axis, num_microbatches
      [, data_axis]) — every per-step DiT forward runs GPipe
      pipeline-parallel over the block stack (parallel/pipeline.py);
      mutually exclusive with ``sequence_parallel``. num_microbatches must
      divide the batch.

    - ``teacache_threshold``: > 0 enables TeaCache (arXiv:2411.19108)
      adaptive full-forward reuse: the relative L1 change of block-0's
      timestep-modulated input accumulates across steps and the transformer
      only runs when it crosses the threshold (cached steps reuse the
      previous velocity and skip the forward entirely). Video-only;
      typical values 0.05-0.3 (higher = faster, lossier). Mutually
      exclusive with the fixed-interval caching dials.

    Returns (video_latents, audio_latents-or-None), channels-first.
    """
    use_cfg = cfg_scale != 1.0 and neg_context is not None
    if cfg_sequential and use_cfg:
        if cfg_cache_interval > 1 or attn_broadcast_interval > 1 or teacache_threshold > 0.0:
            raise ValueError(
                "cfg_sequential cannot be combined with cfg_cache_interval, "
                "attn_broadcast_interval, or teacache_threshold (the caching "
                "dials assume the batched-CFG forward shape)"
            )
    if teacache_threshold > 0.0:
        if audio_latents is not None:
            raise ValueError("teacache_threshold supports the video-only path")
        if cfg_cache_interval > 1 or attn_broadcast_interval > 1:
            raise ValueError(
                "teacache_threshold cannot be combined with cfg_cache_interval "
                "or attn_broadcast_interval (one caching dial at a time)"
            )
        if pipeline_parallel is not None or sequence_parallel is not None:
            raise ValueError(
                "teacache_threshold does not compose with pipeline/sequence "
                "parallelism (data-dependent lax.cond around shard_map bodies)"
            )
        if progress_callback is not None:
            raise ValueError("teacache_threshold is a scan-mode feature; "
                             "per-step progress_callback is unsupported with it")
    if attn_broadcast_interval > 1:
        if audio_latents is not None:
            raise ValueError("attn_broadcast_interval supports the video-only path")
        if cfg_cache_interval > 1:
            raise ValueError(
                "attn_broadcast_interval and cfg_cache_interval cannot be combined "
                "(their forward batch shapes conflict inside the scan)"
            )
        if pipeline_parallel is not None or sequence_parallel is not None:
            raise ValueError(
                "attn_broadcast_interval does not compose with pipeline/sequence "
                "parallelism (data-dependent lax.cond around shard_map bodies)"
            )
        if progress_callback is not None:
            raise ValueError("attn_broadcast_interval is a scan-mode feature; "
                             "per-step progress_callback is unsupported with it")
    if pipeline_parallel is not None:
        if sequence_parallel is not None:
            raise ValueError("pipeline_parallel and sequence_parallel are mutually exclusive")
        b_ref = latents.shape[0] if latents is not None else audio_latents.shape[0]
        if b_ref % int(pipeline_parallel[2]) != 0:
            raise ValueError(
                f"batch={b_ref} not divisible by pipeline num_microbatches="
                f"{pipeline_parallel[2]}"
            )
    if cfg_cache_interval > 1:
        if audio_latents is not None:
            raise ValueError("cfg_cache_interval requires video-only CFG (no joint audio)")
        if progress_callback is not None:
            raise ValueError("cfg_cache_interval is a scan-mode feature; "
                             "per-step progress_callback is unsupported with it")
        if not use_cfg:
            cfg_cache_interval = 1  # no CFG -> nothing to cache
    enable_audio = audio_latents is not None
    if enable_audio and (audio_positions is None or audio_context is None):
        raise ValueError("audio_positions/audio_context must be provided with audio_latents")

    if state is not None:
        latents = state.latent

    sig_np = np.asarray(sigmas, dtype=np.float32)
    sig_pairs = jnp.asarray(np.stack([sig_np[:-1], sig_np[1:]], axis=1))
    num_steps = sig_pairs.shape[0]

    if progress_callback is None:
        import os as _os

        from mlx_video_tpu.utils.profiling import progress_echo_enabled

        common = dict(
            config=config, cfg_scale=cfg_scale, use_cfg=use_cfg, enable_audio=enable_audio,
            progress=progress_echo_enabled(), sp=sequence_parallel,
            cfg_cache_interval=cfg_cache_interval, pp=pipeline_parallel,
            attn_broadcast_interval=attn_broadcast_interval,
            use_teacache=teacache_threshold > 0.0,
            teacache_threshold=float(teacache_threshold),
            cfg_sequential=bool(cfg_sequential and use_cfg),
        )
        # Segment long schedules into multiple dispatches of the SAME
        # compiled scan: a single 60+ s device program triggers the TPU
        # worker watchdog (r4: 40-step 5184-token scans crashed the worker;
        # the 8-step prefix of the identical program was fine). step_offset
        # + dial-carry threading keep the math identical to one scan.
        # MLX_VIDEO_SCAN_SEGMENT=0 disables; default 8 steps per dispatch
        # (= the distilled stage-1 schedule, so short runs are one program).
        seg = int(_os.environ.get("MLX_VIDEO_SCAN_SEGMENT", "8"))
        # Host-side streaming: the in-scan debug-callback progress variant
        # is a DIFFERENT, far harder program for the remote TPU compiler —
        # the 19B streamed scan failed compile at the tunnel's ~25-min
        # limit twice (PERF.md r5). On an accelerator, stream by
        # dispatching the CALLBACK-FREE program one step at a time and
        # emitting each event from the host after that step's completion
        # fence: same math, same executable family, truthful event timing.
        # MLX_VIDEO_STREAM_HOST=0 restores the in-scan variant; =1 forces
        # host streaming on any backend (tests).
        _sh = _os.environ.get("MLX_VIDEO_STREAM_HOST", "auto")
        stream_host = common["progress"] and (
            _sh == "1" or (_sh != "0" and jax.default_backend() != "cpu")
        )
        if stream_host:
            common["progress"] = False
            seg = 1
        if stream_host or 0 < seg < num_steps:
            has_video = latents is not None
            v = latents
            a = audio_latents
            carry = None
            off = 0
            while off < num_steps:
                chunk = sig_pairs[off:off + seg]
                v, a, carry = _denoise_scan(
                    params,
                    v if has_video else None,
                    positions, context, neg_context, state,
                    a if enable_audio else None,
                    audio_positions, audio_context, audio_neg_context,
                    chunk,
                    step_offset=jnp.asarray(off, dtype=jnp.int32),
                    dial_carry=carry, return_carry=True,
                    progress_total=num_steps,
                    **common,
                )
                off += int(chunk.shape[0])
                if stream_host:
                    # completion fence (block_until_ready lies through the
                    # tunnel): fetch one element before announcing the step
                    probe = v if has_video else a
                    float(jnp.sum(probe.ravel()[:1].astype(jnp.float32)))
                    _host_step_event(off - 1, float(sig_np[off - 1]), num_steps)
        else:
            v, a = _denoise_scan(
                params, latents, positions, context, neg_context, state,
                audio_latents, audio_positions, audio_context, audio_neg_context,
                sig_pairs,
                **common,
            )
    else:
        bundle = _make_bundle(
            config, latents, positions, context, state, use_cfg, neg_context,
            audio_latents, audio_positions, audio_context, audio_neg_context,
        )
        carry = (
            latents,
            audio_latents if enable_audio else jnp.zeros((0,), dtype=latents.dtype),
        )
        for i in range(num_steps):
            carry = _denoise_one(
                params, bundle, carry, sig_pairs[i],
                config=config, cfg_scale=cfg_scale, use_cfg=use_cfg, enable_audio=enable_audio,
                sp=sequence_parallel, pp=pipeline_parallel,
                cfg_sequential=bool(cfg_sequential and use_cfg),
            )
            progress_callback(i + 1, num_steps)
        v, a = carry

    return v, (a if enable_audio else None)


def denoise_audio_only(
    params: dict,
    config: LTXModelConfig,
    audio_latents: jax.Array,
    audio_positions: jax.Array,
    audio_context: jax.Array,
    sigmas: Sequence[float],
    audio_neg_context: Optional[jax.Array] = None,
    cfg_scale: float = 1.0,
    progress_callback: Optional[Callable[[int, int], None]] = None,
    sequence_parallel=None,
) -> jax.Array:
    """Audio-only denoise loop (reference: generate.py:888-1057)."""
    use_cfg = cfg_scale != 1.0 and audio_neg_context is not None
    sig_np = np.asarray(sigmas, dtype=np.float32)
    sig_pairs = jnp.asarray(np.stack([sig_np[:-1], sig_np[1:]], axis=1))
    num_steps = sig_pairs.shape[0]

    if progress_callback is None:
        from mlx_video_tpu.utils.profiling import progress_echo_enabled

        _, a = _denoise_scan(
            params, None, None, None, None, None,
            audio_latents, audio_positions, audio_context, audio_neg_context,
            sig_pairs,
            config=config, cfg_scale=cfg_scale, use_cfg=use_cfg, enable_audio=True,
            progress=progress_echo_enabled(), sp=sequence_parallel,
        )
        return a
    bundle = _make_bundle(
        config, None, None, None, None, use_cfg, None,
        audio_latents, audio_positions, audio_context, audio_neg_context,
    )
    # Video carry is a 0-d placeholder (ndim != 5 disables the video path).
    carry = (jnp.zeros((0,), dtype=audio_latents.dtype), audio_latents)
    for i in range(num_steps):
        carry = _denoise_one(
            params, bundle, carry, sig_pairs[i],
            config=config, cfg_scale=cfg_scale, use_cfg=use_cfg, enable_audio=True,
            sp=sequence_parallel,
        )
        progress_callback(i + 1, num_steps)
    return carry[1]


# Reference-name aliases (mlx_video/generate.py:564, 1060, 1330): the single
# ``denoise`` entry point covers all three loops here — distilled (no CFG)
# and dev (CFG) are selected by the presence of ``neg_context``/``cfg_scale``,
# and the AV variant by passing an audio modality.
denoise_distilled = denoise
denoise_dev = denoise
denoise_dev_av = denoise
