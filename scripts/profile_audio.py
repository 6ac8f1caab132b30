"""Compile + steady-state timing of the AUDIO decode path on one chip.

Drives audio latents -> AudioDecoder (2D causal convs + attention) ->
HiFi-GAN vocoder (ConvTranspose1d 6,5,2,2,2 stacks) at full geometry for a
5-second clip (25 latents/s -> 125 latent frames -> 24 kHz stereo), the
same path generate_video uses for joint/separate audio. Checks whether any
audio op hits the XLA:TPU device-compile pathologies documented in PERF.md
round 2.

    python scripts/profile_audio.py
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

    from mlx_video_tpu.models.ltx.audio_vae.audio_vae import (
        AudioVAEConfig,
        audio_decoder_apply,
        init_audio_decoder,
    )
    from mlx_video_tpu.models.ltx.audio_vae.vocoder import (
        VocoderConfig,
        init_vocoder,
        vocoder_apply,
    )

    def sync(x) -> float:
        return float(jnp.sum(x.astype(jnp.float32)))

    acfg = AudioVAEConfig()
    vcfg = VocoderConfig()
    dec = init_audio_decoder(jax.random.key(0), acfg, dtype=jnp.bfloat16)
    voc = init_vocoder(jax.random.key(1), vcfg, dtype=jnp.bfloat16)

    # 5 s of audio: 25 latents/s -> 125 latent frames, 16 mel-bin latent.
    latent = jax.random.normal(jax.random.key(2), (1, 8, 125, 16), jnp.bfloat16)

    dec_jit = jax.jit(audio_decoder_apply, static_argnames=("config",))
    t0 = time.time()
    spec = dec_jit(dec, acfg, latent)
    sync(spec)
    print(f"audio_decoder: first(+compile) {time.time()-t0:.1f}s, spec {spec.shape}")
    ts = []
    for _ in range(3):
        t0 = time.time()
        sync(dec_jit(dec, acfg, latent))
        ts.append(time.time() - t0)
    print(f"audio_decoder steady: {sorted(ts)[1]*1e3:.1f} ms")

    voc_jit = jax.jit(vocoder_apply, static_argnames=("config",))
    t0 = time.time()
    wav = voc_jit(voc, vcfg, spec)
    sync(wav)
    print(f"vocoder: first(+compile) {time.time()-t0:.1f}s, wav {wav.shape}")
    ts = []
    for _ in range(3):
        t0 = time.time()
        sync(voc_jit(voc, vcfg, spec))
        ts.append(time.time() - t0)
    secs = wav.shape[-1] / 24000.0
    print(f"vocoder steady: {sorted(ts)[1]*1e3:.1f} ms for {secs:.1f}s audio")


if __name__ == "__main__":
    main()
