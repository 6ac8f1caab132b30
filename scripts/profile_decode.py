"""Per-stage timing of the full-geometry VAE decoder on one chip.

The warm e2e run showed vae_decode = 61.6 s for 512^2 x 33f — ~1000x off
the ~11 TFLOP conv roofline (<1 s). This script isolates where that time
goes: head / each res-block group / each upsample / tail, all warm, synced
by scalar fetch (block_until_ready lies through the axon tunnel), plus a
standalone A/B of lax 3D conv vs a temporal-tap decomposition into 2D
convs at each stage geometry.

    python scripts/profile_decode.py            # full geometry (slow compiles 1st run)
    python scripts/profile_decode.py --convs    # standalone conv A/B only
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

    from functools import partial

    from mlx_video_tpu.models.ltx.video_vae.conv import init_conv3d
    from mlx_video_tpu.models.ltx.video_vae.decoder import (
        DecoderConfig,
        _decoder_head,
        _decoder_stage,
        _decoder_tail,
        init_video_decoder,
    )

    def sync(x) -> float:
        return float(jnp.sum(x.astype(jnp.float32)))

    def timeit(fn, reps: int = 3) -> float:
        fn()  # warm (compile + first dispatch)
        ts = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            ts.append(time.time() - t0)
        return sorted(ts)[len(ts) // 2]

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", file=sys.stderr)

    # Stage geometries of the default decoder at 512^2 x 33f (NDHWC),
    # from 128ch (1,5,16,16) latents:
    #   g0 1024ch (5,16,16) -> up -> g1 512ch (9,32,32) -> up ->
    #   g2 256ch (17,64,64) -> up -> g3 128ch (33,128,128) -> tail
    geoms = [
        (1024, (5, 16, 16)),
        (512, (9, 32, 32)),
        (256, (17, 64, 64)),
        (128, (33, 128, 128)),
    ]

    if "--convs" in sys.argv or "--all" in sys.argv:
        print("== standalone conv A/B: lax 3D conv vs temporal-tap 2D decomposition ==")
        from jax import lax

        for ch, (f, h, w) in geoms:
            key = jax.random.key(0)
            x = jax.random.normal(key, (1, f + 2, h + 2, w + 2, ch), jnp.bfloat16)
            wgt = (jax.random.normal(key, (3, 3, 3, ch, ch), jnp.float32) * 0.02).astype(
                jnp.bfloat16
            )

            @jax.jit
            def conv3d(x, wgt):
                return lax.conv_general_dilated(
                    x, wgt, (1, 1, 1), "VALID",
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                )

            @jax.jit
            def conv3d_as_2d(x, wgt):
                # sum over 3 temporal taps of a (B*F) 2D conv
                b, fp, hp, wp, c = x.shape
                fo = fp - 2
                out = None
                for t in range(3):
                    xt = x[:, t : t + fo].reshape(b * fo, hp, wp, c)
                    o = lax.conv_general_dilated(
                        xt, wgt[t], (1, 1), "VALID",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    )
                    out = o if out is None else out + o
                return out.reshape(b, fo, hp - 2, wp - 2, -1)

            flops = 2 * f * h * w * 27 * ch * ch
            t3 = timeit(lambda: sync(conv3d(x, wgt)))
            t2 = timeit(lambda: sync(conv3d_as_2d(x, wgt)))
            print(
                f"ch={ch:5d} f{f}x{h}x{w}: conv3d {t3*1e3:8.1f} ms ({flops/t3/1e12:6.2f} TF/s)"
                f" | as-2d {t2*1e3:8.1f} ms ({flops/t2/1e12:6.2f} TF/s)"
            )
        if "--all" not in sys.argv:
            return

    print("== per-stage decoder timing (full geometry, warm) ==")
    cfg = DecoderConfig()
    params = init_video_decoder(jax.random.key(1), cfg, dtype=jnp.bfloat16)
    # _decoder_head takes channels-LAST input — the layout transpose happens
    # eagerly in video_decoder_apply_chunked, never inside the stage jits.
    latent = jax.random.normal(jax.random.key(2), (1, 5, 16, 16, 128), jnp.bfloat16)
    ts = jnp.full((1,), cfg.decode_timestep, jnp.float32) * 1000.0
    noise = jax.random.normal(
        jax.random.key(3), (1, 5, 16, 16, 128), jnp.float32
    ).astype(jnp.bfloat16)

    t0 = time.time()
    x = _decoder_head(params, cfg, latent, noise, False)
    sync(x)
    print(f"head: first(+compile) {time.time()-t0:.1f}s", file=sys.stderr)
    t_head = timeit(lambda: sync(_decoder_head(params, cfg, latent, noise, False)))

    xs = [x]
    stage_t = []
    for g in range(cfg.num_upsamples + 1):
        group = params["up_blocks"][str(2 * g)]
        ups = params["up_blocks"].get(str(2 * g + 1))
        t0 = time.time()
        xg = _decoder_stage(group, ups, xs[-1], ts, cfg, False, upsample=ups is not None)
        sync(xg)
        print(f"stage{g}: first(+compile) {time.time()-t0:.1f}s", file=sys.stderr)
        stage_t.append(
            timeit(
                lambda g=g, group=group, ups=ups, xin=xs[-1]: sync(
                    _decoder_stage(group, ups, xin, ts, cfg, False, upsample=ups is not None)
                )
            )
        )
        xs.append(xg)

    t0 = time.time()
    out = _decoder_tail(params, cfg, xs[-1], ts, False)
    sync(out)
    print(f"tail: first(+compile) {time.time()-t0:.1f}s", file=sys.stderr)
    t_tail = timeit(lambda: sync(_decoder_tail(params, cfg, xs[-1], ts, False)))

    total = t_head + sum(stage_t) + t_tail
    print(f"head  {t_head*1e3:9.1f} ms")
    for g, t in enumerate(stage_t):
        print(f"stage{g} {t*1e3:8.1f} ms  ({geoms[g][0]}ch {geoms[g][1]})")
    print(f"tail  {t_tail*1e3:9.1f} ms")
    print(f"TOTAL {total:9.2f} s")


if __name__ == "__main__":
    main()
