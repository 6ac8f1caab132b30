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
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from mlx_video_tpu.config import LTXModelConfig, LTXModelType
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


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="Convert LTX-2 checkpoints to TPU-native format")
    parser.add_argument("--input", "-i", required=True, nargs="+", help="Input safetensors file(s)")
    parser.add_argument("--output", "-o", required=True, help="Output safetensors path")
    parser.add_argument("--model-type", default="av", choices=["av", "video", "audio"])
    parser.add_argument("--config", default=None,
                        help="JSON file with LTXModelConfig fields (default: 19B geometry)")
    parser.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    parser.add_argument("--quantize-bits", "-q", type=int, default=None,
                        choices=[2, 4, 8], help="Quantize to N bits")
    parser.add_argument("--quantize-group-size", type=int, default=64)
    parser.add_argument("--quantize-scope", default="core", choices=["attn1", "core", "all"])
    parser.add_argument("--lora", action="append", default=[], help="LoRA file(s) to pre-merge")
    parser.add_argument("--lora-strength", type=float, default=1.0)
    parser.add_argument("--report", action="store_true", help="Print per-layer report")
    args = parser.parse_args(argv)

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
    convert_transformer(
        [Path(p) for p in args.input],
        out,
        config=config,
        dtype=jnp.bfloat16 if args.dtype == "bf16" else jnp.float32,
        quantize_bits=args.quantize_bits,
        quantize_group_size=args.quantize_group_size,
        quantize_scope=args.quantize_scope,
        lora_paths=args.lora,
        lora_strength=args.lora_strength,
        report=args.report,
    )


if __name__ == "__main__":
    main()
