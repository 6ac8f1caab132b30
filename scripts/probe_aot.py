"""Probe: does jax.experimental.serialize_executable capture the axon
tunnel's deferred device-side compile?

The per-process compile tax (PERF.md round 2): `jit(f).lower().compile()`
returns in ~1.7 s but the FIRST dispatch pays 5-55 s of device-side compile
that bypasses JAX_COMPILATION_CACHE_DIR. If `serialize()` (PJRT
SerializeExecutable) embeds the device binary, a fresh process that
`deserialize_and_load`s it should first-execute at steady-state cost.

    python scripts/probe_aot.py save   # compile + serialize + time 1st/2nd exec
    python scripts/probe_aot.py load   # fresh process: deserialize + time 1st/2nd

Uses the REAL decoder stage-0 graph at the 512^2x33 e2e geometry (the
largest single contributor to the measured ~50 s decode-phase tax).
"""

from __future__ import annotations

import os
import pickle
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PATH = "/tmp/probe_aot_stage.jaxexec"


def sync(x):
    import jax.numpy as jnp

    return float(jnp.sum(x.astype(jnp.float32)))


def build():
    import jax
    import jax.numpy as jnp

    from mlx_video_tpu.models.ltx.video_vae.decoder import (
        DecoderConfig,
        init_video_decoder,
        _decoder_stage,
    )

    cfg = DecoderConfig()
    params = init_video_decoder(jax.random.key(0), cfg, dtype=jnp.bfloat16)
    group = params["up_blocks"]["0"]
    ups = params["up_blocks"]["1"]
    # stage-0 input at the 512^2 x 33f decode geometry (channels-last)
    x = jnp.zeros((1, 5, 16, 16, cfg.channel_schedule[0]), jnp.bfloat16)
    ts = jnp.full((1,), 50.0, jnp.float32)

    def fn(group, ups, x, ts):
        return _decoder_stage.__wrapped__(group, ups, x, ts, cfg, False, True) \
            if hasattr(_decoder_stage, "__wrapped__") else None

    # call the underlying (un-jitted) stage directly
    from mlx_video_tpu.models.ltx.video_vae import decoder as dec_mod

    raw = getattr(dec_mod, "_decoder_stage_raw", None)
    if raw is None:
        # _decoder_stage is partial(jax.jit)(f) or aot_jit(f): recover f
        raw = getattr(dec_mod._decoder_stage, "__wrapped__", None)
    assert raw is not None, "cannot recover raw stage fn"

    def fn2(group, ups, x, ts):
        return raw(group, ups, x, ts, cfg, False, True)

    return fn2, (group, ups, x, ts)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "save"
    import jax
    from jax.experimental import serialize_executable as se

    fn, args = build()
    if mode == "save":
        t0 = time.time()
        compiled = jax.jit(fn).lower(*args).compile()
        t_compile = time.time() - t0
        t0 = time.time()
        data, in_tree, out_tree = se.serialize(compiled)
        t_ser = time.time() - t0
        with open(PATH, "wb") as f:
            pickle.dump({"bytes": data, "in": in_tree, "out": out_tree}, f)
        t0 = time.time()
        sync(compiled(*args))
        t_first = time.time() - t0
        t0 = time.time()
        sync(compiled(*args))
        t_second = time.time() - t0
        print(
            f"save: compile={t_compile:.2f}s serialize={t_ser:.2f}s "
            f"bytes={len(data)} first={t_first:.2f}s second={t_second:.3f}s"
        )
    else:
        with open(PATH, "rb") as f:
            payload = pickle.load(f)
        t0 = time.time()
        compiled = se.deserialize_and_load(payload["bytes"], payload["in"], payload["out"])
        t_load = time.time() - t0
        t0 = time.time()
        sync(compiled(*args))
        t_first = time.time() - t0
        t0 = time.time()
        sync(compiled(*args))
        t_second = time.time() - t0
        print(
            f"load: deserialize={t_load:.2f}s first={t_first:.2f}s "
            f"second={t_second:.3f}s"
        )


if __name__ == "__main__":
    main()
