"""Model-bundle loading: resolve weight files and build all components.

Behavioral spec: reference mlx_video/generate.py:2548-2766 (weight-file
resolution with bits hints, unified ``model.safetensors`` bundle subsets,
per-subsystem fallbacks) and the per-subsystem loaders referenced in
io/vae_weights.py. All weights load once and stay resident (TPU design
note in pipelines/generate.py).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import List, Optional

import jax
import jax.numpy as jnp

from mlx_video_tpu.config import LTXModelConfig, LTXModelType, LTXRopeType, VideoVAEConfig
from mlx_video_tpu.io import vae_weights
from mlx_video_tpu.io.safetensors import read_metadata, scan_keys
from mlx_video_tpu.io.weights import load_dit_params
from mlx_video_tpu.models.ltx.audio_vae.audio_vae import (
    AudioVAEConfig,
    init_audio_decoder,
    init_audio_encoder,
)
from mlx_video_tpu.models.ltx.audio_vae.vocoder import VocoderConfig, init_vocoder
from mlx_video_tpu.models.ltx.upsampler import init_latent_upsampler
from mlx_video_tpu.models.ltx.video_vae.decoder import DecoderConfig, init_video_decoder
from mlx_video_tpu.models.ltx.video_vae.encoder import init_video_encoder
from mlx_video_tpu.pipelines.generate import ModelBundle, PipelineType


def resolve_transformer_file(
    model_path: Path, kind: str, bits_hint: Optional[str] = None
) -> Path:
    """ltx-2-19b-{kind}[-bits][-mlx].safetensors candidates
    (reference: generate.py:3253-3265)."""
    candidates: List[Path] = []
    if bits_hint:
        candidates.append(model_path / f"ltx-2-19b-{kind}-{bits_hint}-mlx.safetensors")
    candidates.append(model_path / f"ltx-2-19b-{kind}-mlx.safetensors")
    candidates.append(model_path / f"ltx-2-19b-{kind}.safetensors")
    for c in candidates:
        if c.exists():
            return c
    raise FileNotFoundError(
        f"Transformer weights not found under {model_path} (tried {[c.name for c in candidates]})"
    )


def resolve_vae_file(model_path: Path, bits_hint: Optional[str] = None) -> Path:
    """(reference: decoder.py:600-615). Quantized single-file snapshots
    (the -mlx / bits-suffixed names resolve_transformer_file prefers) carry
    the VAE tensors in the same file, so those names are candidates too —
    otherwise a snapshot whose transformer resolves fine would fail VAE
    resolution."""
    candidates = [model_path / "vae" / "diffusion_pytorch_model.safetensors"]
    for kind in ("dev", "distilled"):
        if bits_hint:
            candidates.append(model_path / f"ltx-2-19b-{kind}-{bits_hint}-mlx.safetensors")
        candidates.append(model_path / f"ltx-2-19b-{kind}-mlx.safetensors")
        candidates.append(model_path / f"ltx-2-19b-{kind}.safetensors")
    for candidate in candidates:
        if candidate.exists():
            return candidate
    unified = unified_bundle_file(model_path)
    if unified is not None:
        return unified
    raise FileNotFoundError(f"VAE weights not found under {model_path}")


def unified_bundle_file(model_path: Path) -> Optional[Path]:
    """model.safetensors with prefixed subsystem subsets, if present
    (reference: generate.py:2553-2766 unified bundle resolution)."""
    bundle = Path(model_path) / "model.safetensors"
    if not bundle.exists():
        return None
    from mlx_video_tpu.io.safetensors import read_metadata

    try:
        meta = read_metadata(bundle)
    except Exception:
        return None
    if meta.get("format") == "mlx_video_tpu_unified":
        return bundle
    return None


def model_config_for(pipeline: PipelineType, audio: bool) -> LTXModelConfig:
    return LTXModelConfig(
        model_type=LTXModelType.AudioVideo if audio else LTXModelType.VideoOnly,
        rope_type=LTXRopeType.SPLIT,
        double_precision_rope=True,
    )


def resolve_audio_transformer_file(
    model_path: Path, audio_model_path: Optional[Path] = None
) -> Optional[Path]:
    """Weights for the separate-audio AudioOnly transformer — dev weights
    preferred, falling back to the main snapshot
    (reference: generate.py:3970-3982 audio_weight_candidates)."""
    roots = [Path(p) for p in (audio_model_path, model_path) if p is not None]
    names = [
        "ltx-2-19b-dev-mlx.safetensors",
        "ltx-2-19b-dev.safetensors",
        "ltx-2-19b-distilled-mlx.safetensors",
        "ltx-2-19b-distilled.safetensors",
    ]
    for root in roots:
        for name in names:
            if (root / name).exists():
                return root / name
    return None


def load_model_bundle(
    model_path: Path,
    pipeline: PipelineType = PipelineType.DISTILLED,
    audio: bool = False,
    audio_mode: str = "auto",
    audio_model_path: Optional[Path] = None,
    dtype=jnp.bfloat16,
    bits_hint: Optional[str] = None,
    stage2_path: Optional[Path] = None,
    load_encoder: bool = True,
) -> ModelBundle:
    """Load every component present in a reference-layout snapshot."""
    model_path = Path(model_path)
    kind = "dev" if pipeline == PipelineType.DEV else "distilled"
    # Separate audio keeps the main transformer VideoOnly and loads a second
    # AudioOnly transformer (reference: generate.py:3932-4014).
    separate_audio = audio and (
        audio_mode == "separate" or (audio_mode == "auto" and pipeline != PipelineType.DEV)
    )
    config = model_config_for(pipeline, audio and not separate_audio)

    unified = unified_bundle_file(model_path)
    if unified is not None:
        from mlx_video_tpu.io.weights import load_native_params

        transformer = load_native_params(unified, prefix="transformer.")
    else:
        tf_file = resolve_transformer_file(model_path, kind, bits_hint)
        transformer = load_dit_params([tf_file], config, dtype=dtype, strict=False)

    vae_file = resolve_vae_file(model_path, bits_hint)
    dec_cfg = DecoderConfig()
    dec_params = init_video_decoder(jax.random.key(0), dec_cfg, dtype=dtype)
    vae_weights.load_video_decoder_weights(vae_file, dec_params, dtype=dtype)

    enc_params = enc_cfg = None
    if load_encoder:
        enc_cfg = VideoVAEConfig()
        enc_params = init_video_encoder(jax.random.key(0), enc_cfg, dtype=dtype)
        vae_weights.load_video_encoder_weights(vae_file, enc_params, dtype=dtype)

    ups_params = None
    ups_file = model_path / "ltx-2-spatial-upscaler-x2-1.0.safetensors"
    if ups_file.exists():
        ups_params = init_latent_upsampler(jax.random.key(0), dtype=dtype)
        vae_weights.load_upsampler_weights(ups_file, ups_params, dtype=dtype)

    audio_dec = audio_dec_cfg = voc_params = voc_cfg = None
    audio_file = model_path / "audio_vae" / "diffusion_pytorch_model.safetensors"
    if unified is not None and not audio_file.exists():
        audio_file = unified
    if audio and audio_file.exists():
        audio_dec_cfg = AudioVAEConfig()
        audio_dec = init_audio_decoder(jax.random.key(0), audio_dec_cfg, dtype=dtype)
        vae_weights.load_audio_vae_weights(audio_file, None, audio_dec, dtype=dtype)
    voc_file = model_path / "vocoder" / "diffusion_pytorch_model.safetensors"
    if unified is not None and not voc_file.exists():
        voc_file = unified
    if audio and voc_file.exists():
        voc_cfg = VocoderConfig()
        voc_params = init_vocoder(jax.random.key(0), voc_cfg, dtype=dtype)
        vae_weights.load_vocoder_weights(voc_file, voc_params, dtype=dtype)

    stage2 = None
    if stage2_path is not None:
        stage2 = load_dit_params(
            [resolve_transformer_file(Path(stage2_path), kind, bits_hint)],
            config, dtype=dtype, strict=False,
        )

    audio_tf = audio_tf_cfg = None
    if separate_audio:
        audio_file_tf = resolve_audio_transformer_file(model_path, audio_model_path)
        if audio_file_tf is not None:
            audio_tf_cfg = LTXModelConfig(
                model_type=LTXModelType.AudioOnly,
                rope_type=LTXRopeType.SPLIT,
                double_precision_rope=True,
            )
            audio_tf = load_dit_params([audio_file_tf], audio_tf_cfg, dtype=dtype, strict=False)

    return ModelBundle(
        transformer_params=transformer,
        transformer_config=config,
        vae_decoder_params=dec_params,
        vae_decoder_config=dec_cfg,
        vae_encoder_params=enc_params,
        vae_encoder_config=enc_cfg,
        upsampler_params=ups_params,
        stage2_transformer_params=stage2,
        audio_decoder_params=audio_dec,
        audio_decoder_config=audio_dec_cfg,
        vocoder_params=voc_params,
        vocoder_config=voc_cfg,
        audio_transformer_params=audio_tf,
        audio_transformer_config=audio_tf_cfg,
    )


def bits_hint_for(repo: str) -> Optional[str]:
    """Grid-width hint from a repo/path name ("...-8bit...", "...q4...")."""
    repo_l = str(repo).lower()
    if any(x in repo_l for x in ("8bit", "q8", "int8")):
        return "8bit"
    if any(x in repo_l for x in ("4bit", "q4", "int4")):
        return "4bit"
    return None


def quantize_models(
    models: ModelBundle,
    model_path: Path,
    *,
    w8a8: bool = False,
    w4a8: bool = False,
    quantize_bits: Optional[int] = None,
    repo_hint: str = "",
) -> None:
    """Apply the quantized execution mode to every loaded transformer.

    Single source of truth for both CLIs (generate + serve): W4A8 first
    quantizes fresh bf16 params when the tree carries no ``quant_weight``
    nodes, and resolves the STORED grid width from (in order) the explicit
    flag > ``quantization.json`` next to the weights > a repo-name hint >
    4 — assuming 4 bits on an 8-bit repo would silently mis-scale every
    matmul (saturated +127 bins).
    """
    if w8a8 and w4a8:
        raise ValueError("--w8a8 and --w4a8 are mutually exclusive")
    if quantize_bits:
        from mlx_video_tpu.ops.quant import quantize_dit_params

        models.transformer_params = quantize_dit_params(
            models.transformer_params, bits=quantize_bits
        )
    if w8a8:
        from mlx_video_tpu.ops.int8 import quantize_params_w8a8

        models.transformer_params = quantize_params_w8a8(models.transformer_params)
        if models.stage2_transformer_params is not None:
            models.stage2_transformer_params = quantize_params_w8a8(
                models.stage2_transformer_params
            )
    if w4a8:
        from mlx_video_tpu.ops.quant import prepare_w4a8, quantize_dit_params
        from mlx_video_tpu.trainer.aux import read_quantization_metadata

        qmeta = read_quantization_metadata(model_path) or {}
        bits = (
            quantize_bits
            or qmeta.get("bits")
            or {"8bit": 8, "4bit": 4}.get(bits_hint_for(repo_hint))
            or 4
        )
        if qmeta.get("bits") and quantize_bits and qmeta["bits"] != quantize_bits:
            raise ValueError(
                f"--quantize-bits {quantize_bits} conflicts with the "
                f"checkpoint's quantization.json bits={qmeta['bits']}"
            )

        def _has_quant(node) -> bool:
            return isinstance(node, dict) and (
                "quant_weight" in node or any(_has_quant(v) for v in node.values())
            )

        def _to_w4a8(p):
            if not _has_quant(p):
                p = quantize_dit_params(p, bits=bits)
            return prepare_w4a8(p, bits=bits)

        models.transformer_params = _to_w4a8(models.transformer_params)
        if models.stage2_transformer_params is not None:
            models.stage2_transformer_params = _to_w4a8(models.stage2_transformer_params)


def mesh_from_flag(spec: str):
    """Build the (data, fsdp, tensor) mesh from a CLI flag value
    ("auto" or "d,f,t")."""
    from mlx_video_tpu.parallel.mesh import create_mesh, factor_devices

    shape = (
        factor_devices(len(jax.devices()))
        if spec == "auto"
        else tuple(int(x) for x in spec.split(","))
    )
    return create_mesh(shape)


def shard_models(models: ModelBundle, mesh) -> None:
    """Shard every loaded transformer (stage-1, stage-2, audio) on the mesh."""
    from mlx_video_tpu.parallel.sharding import shard_params

    models.transformer_params = shard_params(models.transformer_params, mesh)
    if models.stage2_transformer_params is not None:
        models.stage2_transformer_params = shard_params(
            models.stage2_transformer_params, mesh
        )
    if models.audio_transformer_params is not None:
        models.audio_transformer_params = shard_params(
            models.audio_transformer_params, mesh
        )
