"""Compile + steady-state timing of the VAE ENCODER at i2v/precompute
geometries on one chip.

The decode path's compile pathologies (PERF.md round 2) were fixed by
conv3d_via_2d + eager boundary transposes; the encoder shares both fixes
through causal_conv3d / video_encoder_apply_cl but its full-geometry
compile was never measured. The encoder is ONE jit (no chunking): this
script tells us whether it needs the decoder's per-stage treatment.

    python scripts/profile_encode.py            # 512^2 x 33f (i2v stage-2 res)
    python scripts/profile_encode.py --small    # 256^2 x 9f  (stage-1 / tests)
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    from mlx_video_tpu.config import VideoVAEConfig
    from mlx_video_tpu.models.ltx.video_vae import ops
    from mlx_video_tpu.models.ltx.video_vae.encoder import (
        init_video_encoder,
        video_encoder_apply_cl,
        video_encoder_apply_cl_chunked,
    )

    def sync(x) -> float:
        return float(jnp.sum(x.astype(jnp.float32)))

    f, h, w = (9, 256, 256) if "--small" in sys.argv else (33, 512, 512)
    cfg = VideoVAEConfig()
    params = init_video_encoder(jax.random.key(0), cfg, dtype=jnp.bfloat16)
    video = jax.random.normal(jax.random.key(1), (1, 3, f, h, w), jnp.bfloat16)
    x_cl = ops.to_channels_last(video)  # eager, as the pipeline does
    sync(x_cl)

    if "--mono" in sys.argv:
        enc_mono = jax.jit(video_encoder_apply_cl, static_argnames=("config",))
        fn = lambda: sync(enc_mono(params, cfg, x_cl))
        label = "mono"
    else:
        fn = lambda: sync(video_encoder_apply_cl_chunked(params, cfg, x_cl))
        label = "chunked"

    t0 = time.time()
    fn()
    print(f"encode[{label}] {f}x{h}x{w}: first(+compile) {time.time()-t0:.1f}s")
    ts = []
    for _ in range(3):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    frames_per_s = f / sorted(ts)[1]
    print(f"encode[{label}] steady: {sorted(ts)[1]*1e3:.1f} ms ({frames_per_s:.0f} frames/s)")


if __name__ == "__main__":
    main()
