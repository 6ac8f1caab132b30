"""``python -m mlx_video_tpu.cli.enhance`` — standalone prompt enhancement.

Behavioral spec: reference mlx_video/enhance.py (Gemma chat generation with
the bundled T2V/I2V system prompts, optional JSON output).
"""

from __future__ import annotations

import argparse
import json


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Enhance a prompt with the Gemma text encoder")
    p.add_argument("--prompt", "-p", required=True)
    p.add_argument("--model-repo", default="Lightricks/LTX-2",
                   help="Base repo (system prompts + connectors)")
    p.add_argument("--enhancer-repo", default=None,
                   help="Override repo for the Gemma weights")
    p.add_argument("--mode", default="t2v", choices=["t2v", "i2v"])
    p.add_argument("--max-tokens", "--max-new-tokens", type=int, default=512,
                   dest="max_tokens")
    p.add_argument("--temperature", type=float, default=0.7)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--json", action="store_true", help="Emit {prompt, enhanced} JSON")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    import jax.numpy as jnp

    from mlx_video_tpu.models.ltx.text_encoder import LTX2TextEncoder
    from mlx_video_tpu.utils.hub import get_model_path

    model_path = get_model_path(args.model_repo)
    te_path = get_model_path(args.enhancer_repo) if args.enhancer_repo else model_path
    encoder = LTX2TextEncoder.load(model_path, te_path, dtype=jnp.bfloat16)
    kwargs = dict(max_new_tokens=args.max_tokens, temperature=args.temperature)
    enhanced = (
        encoder.enhance_i2v(args.prompt, **kwargs)
        if args.mode == "i2v"
        else encoder.enhance_t2v(args.prompt, **kwargs)
    )
    if args.json:
        print(json.dumps({"prompt": args.prompt, "enhanced": enhanced}))
    else:
        print(enhanced)


if __name__ == "__main__":
    main()
