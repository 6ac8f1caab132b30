#!/usr/bin/env python3
"""Decode precomputed latents back to video for inspection
(reference: ltx_trainer/scripts/decode_latents.py)."""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="Decode latents to mp4")
    parser.add_argument("--latents", required=True, help="latent_*.safetensors file or dir")
    parser.add_argument("--output", required=True)
    parser.add_argument("--model-repo", default="Lightricks/LTX-2")
    parser.add_argument("--fps", type=float, default=24.0)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from mlx_video_tpu.io import vae_weights
    from mlx_video_tpu.io.media import write_video
    from mlx_video_tpu.io.safetensors import SafetensorsReader
    from mlx_video_tpu.loading import resolve_vae_file
    from mlx_video_tpu.models.ltx.video_vae.decoder import (
        DecoderConfig,
        init_video_decoder,
        video_decoder_apply,
    )
    from mlx_video_tpu.utils.hub import get_model_path

    model_path = get_model_path(args.model_repo)
    cfg = DecoderConfig()
    params = init_video_decoder(jax.random.key(0), cfg, dtype=jnp.bfloat16)
    vae_weights.load_video_decoder_weights(resolve_vae_file(model_path), params)
    decode = jax.jit(lambda x: video_decoder_apply(params, cfg, x))

    src = Path(args.latents)
    files = [src] if src.is_file() else sorted(src.glob("latent_*.safetensors"))
    out_dir = Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)
    for f in files:
        with SafetensorsReader(f) as r:
            latents = np.asarray(r.get("latents"), dtype=np.float32)
        if latents.ndim == 4:
            latents = latents[None]
        video = np.asarray(decode(jnp.asarray(latents, dtype=jnp.bfloat16)), np.float32)
        out = out_dir / f"{f.stem}.mp4"
        write_video(out, video, args.fps)
        print(f"Decoded {f.name} -> {out}")


if __name__ == "__main__":
    main()
