"""Checkpoint conversion: PyTorch LTX-2 -> TPU-native safetensors.

Behavioral spec: reference mlx_video/convert.py:611-917 (per-subsystem
sanitize + transpose, optional LoRA pre-merge, quantization with scope
attn1/core/all, per-layer report, quantization.json metadata emit).

Output layout: one native safetensors per subsystem
(transformer / vae_encoder / vae_decoder / upsampler / audio_* as present),
in this package's pytree-flattened format (io/weights.py), plus
``quantization.json`` when quantizing.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from mlx_video_tpu.config import LTXModelConfig, LTXModelType
from mlx_video_tpu.io.safetensors import save_safetensors
from mlx_video_tpu.io.weights import flatten_params, load_dit_params, save_dit_params
from mlx_video_tpu.lora import LoraSpec, merge_lora_into_params
from mlx_video_tpu.ops.quant import quantize_dit_params


def quantization_report(params: dict) -> List[str]:
    """Per-layer quantized/dense report (reference: convert.py layer report)."""
    lines = []

    def walk(node, path):
        if isinstance(node, dict):
            if "quant_weight" in node:
                lines.append(f"{path}: quantized {node['quant_weight'].dtype}")
            elif "int8_weight" in node:
                lines.append(f"{path}: w8a8 int8")
            elif "weight" in node and getattr(node["weight"], "ndim", 0) >= 2:
                lines.append(f"{path}: dense {node['weight'].dtype}")
            else:
                for k, v in node.items():
                    walk(v, f"{path}.{k}" if path else k)

    walk(params, "")
    return lines


def convert_transformer(
    input_paths: List[Path],
    output_path: Path,
    config: Optional[LTXModelConfig] = None,
    dtype=jnp.bfloat16,
    quantize_bits: Optional[int] = None,
    quantize_group_size: int = 64,
    quantize_scope: str = "core",
    w8a8: bool = False,
    lora_paths: Optional[List[str]] = None,
    lora_strength: float = 1.0,
    report: bool = False,
) -> dict:
    config = config or LTXModelConfig(model_type=LTXModelType.AudioVideo)
    params = load_dit_params(input_paths, config, dtype=dtype, strict=False)

    if lora_paths:
        params = merge_lora_into_params(
            params, [LoraSpec(Path(p), lora_strength) for p in lora_paths], verbose=True
        )

    meta = {}
    if w8a8 and quantize_bits:
        raise ValueError(
            "--w8a8 (int8 execution weights) and --quantize-bits (MLX affine "
            "storage format) are mutually exclusive; pick one."
        )
    if w8a8:
        from mlx_video_tpu.ops.int8 import quantize_params_w8a8

        params = quantize_params_w8a8(params)
        meta = {
            "mode": "w8a8-int8",
            "predicate": "core",
            "dtype": "bf16" if dtype == jnp.bfloat16 else "f32",
        }
        with open(output_path.parent / "quantization.json", "w") as f:
            json.dump(meta, f, indent=2)
    if quantize_bits:
        params = quantize_dit_params(
            params, group_size=quantize_group_size, bits=quantize_bits, scope=quantize_scope
        )
        meta = {
            "bits": quantize_bits,
            "group_size": quantize_group_size,
            "mode": "affine",
            "predicate": quantize_scope,
            "dtype": "bf16" if dtype == jnp.bfloat16 else "f32",
        }
        with open(output_path.parent / "quantization.json", "w") as f:
            json.dump(meta, f, indent=2)

    if report:
        for line in quantization_report(params):
            print(" ", line)

    save_dit_params(output_path, params, metadata={"quantization": json.dumps(meta)} if meta else None)
    print(f"Saved transformer to {output_path}")
    return params


def build_unified_bundle(
    output_path: Path,
    transformer_params: dict,
    model_path: Optional[Path] = None,
    include_audio: bool = True,
) -> int:
    """Emit a single ``model.safetensors`` bundle with prefixed subsystem
    subsets (reference: convert.py:766-830 unified export):
    ``transformer.*`` (native layout), ``vae_decoder.*`` / ``vae_encoder.*``
    / ``audio_vae.*`` / ``vocoder.*`` (source-layout passthrough, readable
    by the per-component loaders' prefix detection). Returns tensor count.
    """
    from mlx_video_tpu.io.safetensors import SafetensorsReader
    from mlx_video_tpu.io.weights import flatten_params

    tensors: Dict[str, np.ndarray] = {
        f"transformer.{k}": np.asarray(v)
        for k, v in flatten_params(transformer_params).items()
    }

    def copy_subset(src: Path, out_prefix: str, strip_prefixes: Tuple[str, ...]):
        with SafetensorsReader(src) as r:
            for key in r.keys():
                k = key
                for sp in strip_prefixes:
                    if k.startswith(sp):
                        k = k[len(sp) :]
                        break
                tensors[out_prefix + k] = np.asarray(r.get(key))

    if model_path is not None:
        model_path = Path(model_path)
        from mlx_video_tpu.loading import resolve_vae_file

        vae_file = resolve_vae_file(model_path)
        with SafetensorsReader(vae_file) as r:
            for key in r.keys():
                k = key[len("vae.") :] if key.startswith("vae.") else key
                if k.startswith("decoder."):
                    tensors["vae_decoder." + k[len("decoder.") :]] = np.asarray(r.get(key))
                elif k.startswith("encoder."):
                    tensors["vae_encoder." + k[len("encoder.") :]] = np.asarray(r.get(key))
                elif k.startswith("per_channel_statistics."):
                    # stats feed both encoder and decoder loaders
                    tensors["vae_decoder." + k] = np.asarray(r.get(key))
                    tensors["vae_encoder." + k] = np.asarray(r.get(key))

        if include_audio:
            audio_file = model_path / "audio_vae" / "diffusion_pytorch_model.safetensors"
            if audio_file.exists():
                copy_subset(audio_file, "audio_vae.", ("audio_vae.",))
            voc_file = model_path / "vocoder" / "diffusion_pytorch_model.safetensors"
            if voc_file.exists():
                copy_subset(voc_file, "vocoder.", ("vocoder.",))

    save_safetensors(output_path, tensors, metadata={"format": "mlx_video_tpu_unified"})
    print(f"Saved unified bundle ({len(tensors)} tensors) to {output_path}")
    return len(tensors)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="Convert LTX-2 checkpoints to TPU-native format")
    parser.add_argument("--input", "-i", "--hf-path", required=True, nargs="+",
                        dest="input", help="Input safetensors file(s)")
    parser.add_argument("--output", "-o", "--mlx-path", required=True, dest="output",
                        help="Output safetensors path")
    parser.add_argument("--model-type", default="av", choices=["av", "video", "audio"])
    parser.add_argument("--pipeline", default=None, choices=["dev", "distilled"],
                        help="Informational; recorded in metadata")
    parser.add_argument("--config", default=None,
                        help="JSON file with LTXModelConfig fields (default: 19B geometry)")
    parser.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    parser.add_argument("--quantize", action="store_true",
                        help="Quantize with the default 4 bits (or --q-bits)")
    parser.add_argument("--quantize-bits", "-q", "--q-bits", type=int, default=None,
                        choices=[2, 4, 8], dest="quantize_bits", help="Quantize to N bits")
    parser.add_argument("--quantize-group-size", "--q-group-size", type=int, default=64,
                        dest="quantize_group_size")
    parser.add_argument("--w8a8", action="store_true",
                        help="Export W8A8 int8 execution weights (native format; "
                             "int8 x int8 -> int32 MXU matmuls at load, ops/int8.py)")
    parser.add_argument("--quantize-scope", "--q-mode", default="core",
                        choices=["attn1", "core", "all"], dest="quantize_scope")
    parser.add_argument("--lora", action="append", default=[], help="LoRA file(s) to pre-merge")
    parser.add_argument("--lora-strength", type=float, default=1.0)
    parser.add_argument("--report", "--report-layers", action="store_true", dest="report",
                        help="Print per-layer report")
    parser.add_argument("--unified", action="store_true",
                        help="Also emit a unified model.safetensors bundle")
    parser.add_argument("--model-path", default=None,
                        help="Snapshot dir with VAE/audio/vocoder files for --unified")
    parser.add_argument("--no-audio", action="store_true",
                        help="Exclude audio components from the unified bundle")
    args = parser.parse_args(argv)
    if args.quantize and args.quantize_bits is None:
        args.quantize_bits = 4

    model_type = {
        "av": LTXModelType.AudioVideo,
        "video": LTXModelType.VideoOnly,
        "audio": LTXModelType.AudioOnly,
    }[args.model_type]
    if args.config:
        cfg_dict = json.loads(Path(args.config).read_text())
        cfg_dict["model_type"] = model_type.value
        config = LTXModelConfig.from_dict(cfg_dict)
    else:
        config = LTXModelConfig(model_type=model_type)
    out = Path(args.output)
    out.parent.mkdir(parents=True, exist_ok=True)
    params = convert_transformer(
        [Path(p) for p in args.input],
        out,
        config=config,
        dtype=jnp.bfloat16 if args.dtype == "bf16" else jnp.float32,
        quantize_bits=args.quantize_bits,
        quantize_group_size=args.quantize_group_size,
        quantize_scope=args.quantize_scope,
        w8a8=args.w8a8,
        lora_paths=args.lora,
        lora_strength=args.lora_strength,
        report=args.report,
    )
    if args.unified:
        build_unified_bundle(
            out.parent / "model.safetensors",
            params,
            model_path=Path(args.model_path) if args.model_path else None,
            include_audio=not args.no_audio,
        )


if __name__ == "__main__":
    main()
