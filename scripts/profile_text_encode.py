"""Prompt-encode phase on one chip: Gemma-3-12B (W8A8) -> 49-state
aggregation -> video/audio connectors, at the real 1024-token length.

The last e2e phase never measured on hardware. Weights are synthesized
ON-DEVICE layer by layer (one jitted init+quantize per layer, stacked
int8) so the ~12 GB LM never crosses the tunnel; geometry and dtypes are
exactly the production W8A8 path (LTX2TextEncoder.load(w8a8=True)).

    python scripts/profile_text_encode.py
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from dataclasses import replace

    import jax
    import jax.numpy as jnp

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from mlx_video_tpu.models.gemma3 import Gemma3TextConfig, init_gemma3_params
    from mlx_video_tpu.ops.int8 import quantize_text_encoder_w8a8

    def sync(x) -> float:
        return float(jnp.sum(x.astype(jnp.float32)))

    cfg = Gemma3TextConfig()  # 12B: 48 layers, hidden 3840, inter 15360
    if "--tiny" in sys.argv:
        cfg = replace(cfg, num_hidden_layers=4, vocab_size=1024)
    cfg1 = replace(cfg, num_hidden_layers=1)

    def make_layer(key):
        # one bf16 layer quantized — used only for eval_shape (layout oracle).
        p = init_gemma3_params(key, cfg1, dtype=jnp.bfloat16)
        q = quantize_text_encoder_w8a8({"language_model": {"layers": p["layers"]}})
        return jax.tree.map(lambda x: x[0], q["language_model"]["layers"])

    # Synthesize every STACKED leaf directly at its final shape: int8
    # weights from raw random bits (bitcast, no wider intermediate), small
    # constant scales, zero norm weights. Timing depends on shapes/dtypes
    # only; peak HBM == final footprint (~11 GiB), no donation needed
    # (donation is not honored through the tunnel backend).
    t0 = time.time()
    shapes = jax.eval_shape(make_layer, jax.random.key(0))
    counter = [0]

    def synth(a, stack=True):
        counter[0] += 1
        key = jax.random.fold_in(jax.random.key(7), counter[0])
        shape = ((cfg.num_hidden_layers,) if stack else ()) + a.shape
        if a.dtype == jnp.int8:
            # Weight VALUES are irrelevant to int8 matmul timing — only
            # shapes/dtypes matter — so fill with a fused iota hash: XLA
            # emits a pure elementwise program whose only allocation is the
            # int8 output. (random.bits at these sizes OOMs: threefry holds
            # 2-3x the output in uint32 halves; with uint8 dtype it
            # materializes one 32-bit word per byte, 21 GiB for one leaf.)
            salt = counter[0]

            def gen(shape=shape, salt=salt):
                i = jax.lax.iota(jnp.int32, int(np.prod(shape)))
                h = (i * 1103515245 + salt * 40503) >> 7  # int32-safe LCG mix
                return (h % 251 - 125).astype(jnp.int8).reshape(shape)

            out = jax.jit(gen)()
            # honest per-leaf sync (1-element fetch): without it, async
            # dispatch keeps several multi-GB temp arenas live at once
            # (PERF.md "async arena coexistence")
            float(out[(0,) * len(shape)].astype(jnp.float32))
            return out
        if a.dtype == jnp.float32:  # int8_scale
            return jnp.full(shape, 2e-4, jnp.float32)
        return jnp.zeros(shape, a.dtype)  # norm weights

    layers = jax.tree.map(synth, shapes)
    # embed directly in bf16 (a float32 intermediate at (262144, 3840) is
    # 3.75 GiB we cannot afford next to the 10+ GiB int8 stack)
    embed = jax.jit(
        lambda k: jax.random.normal(
            k, (cfg.vocab_size, cfg.hidden_size), jnp.bfloat16
        ) * 0.02
    )(jax.random.key(1))
    lm = {
        "embed_tokens": {"weight": embed},
        "norm": {"weight": jnp.zeros((cfg.hidden_size,), jnp.bfloat16)},
        "layers": layers,
    }

    # feature extractor synthesized straight into int8 (a bf16 init +
    # quantize pass would add ~4 GiB of transients)
    from mlx_video_tpu.models.ltx.text_encoder import init_feature_extractor

    fe_shapes = jax.eval_shape(
        lambda k: quantize_text_encoder_w8a8(
            {"feature_extractor": init_feature_extractor(
                k, cfg.hidden_size * (cfg.num_hidden_layers + 1), cfg.hidden_size
            )}
        )["feature_extractor"],
        jax.random.key(2),
    )
    fe = jax.tree.map(lambda a: synth(a, stack=False), fe_shapes)

    def gib(tree) -> float:
        return sum(x.nbytes for x in jax.tree.leaves(tree)) / 2**30

    sync(lm["layers"]["self_attn"]["q_proj"]["int8_weight"])
    print(
        f"on-device w8a8 synth: {time.time()-t0:.1f}s — lm {gib(lm):.2f} GiB "
        f"(embed {gib(lm['embed_tokens']):.2f}), feature_extractor {gib(fe):.2f}"
    )

    # The full encoder tree (~LM 13 GiB + extractor + connectors) exceeds one
    # v5e's 16 GB, so measure in the two phases generate_video would stage
    # them in under low_memory: (A) Gemma 49-state forward + aggregation with
    # only LM+extractor resident; (B) the two connectors, initialized only
    # after the LM is freed.
    from mlx_video_tpu.models.gemma3 import gemma3_hidden_states
    from mlx_video_tpu.models.ltx.text_encoder import (
        connector_apply,
        feature_extractor_apply,
        norm_and_concat_hidden_states,
    )

    ids = jnp.ones((1, 1024), dtype=jnp.int32)
    mask = jnp.ones((1, 1024), dtype=jnp.int32)

    def phase_a(lm_params, fe_params, ids, mask):
        states = gemma3_hidden_states(lm_params, cfg, ids, mask)
        concat = norm_and_concat_hidden_states(states, mask, padding_side="left")
        return feature_extractor_apply(fe_params, concat.astype(states[0].dtype))

    a_jit = jax.jit(phase_a)
    t0 = time.time()
    features = a_jit(lm, fe, ids, mask)
    sync(features)
    print(f"phase A (Gemma 48L + 49-state aggregate): first(+compile) {time.time()-t0:.1f}s")
    ts = []
    for _ in range(3):
        t0 = time.time()
        sync(a_jit(lm, fe, ids, mask))
        ts.append(time.time() - t0)
    ta = sorted(ts)[1]
    print(f"phase A steady: {ta*1e3:.1f} ms, features {features.shape}")

    del lm  # free the 13 GiB LM before the connectors (low_memory staging)

    from mlx_video_tpu.models.ltx.text_encoder import init_connector

    vc = init_connector(jax.random.key(3), cfg.hidden_size, dtype=jnp.bfloat16)
    ac = init_connector(jax.random.key(4), cfg.hidden_size, dtype=jnp.bfloat16)

    def phase_b(vc, ac, features, mask):
        video = connector_apply(vc, features, mask)
        audio = connector_apply(ac, features, mask)
        return video, audio

    b_jit = jax.jit(phase_b)
    t0 = time.time()
    video, audio = b_jit(vc, ac, features, mask)
    sync(video)
    print(f"phase B (video+audio connectors): first(+compile) {time.time()-t0:.1f}s")
    ts = []
    for _ in range(3):
        t0 = time.time()
        v, a = b_jit(vc, ac, features, mask)
        sync(v)
        ts.append(time.time() - t0)
    tb = sorted(ts)[1]
    print(f"phase B steady: {tb*1e3:.1f} ms, video {video.shape} audio {audio.shape}")
    print(f"prompt_encode steady total: {(ta+tb)*1e3:.1f} ms")


if __name__ == "__main__":
    main()
