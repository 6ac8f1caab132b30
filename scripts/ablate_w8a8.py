"""Decompose the w8a8 per-step time by in-graph ablation: replace a
component with a same-shape no-op and re-measure per-step via the 2n
protocol. One process; compilation cache on."""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import sys, time
import numpy as np
import jax, jax.numpy as jnp

from mlx_video_tpu.config import LTXModelConfig, LTXModelType, LTXRopeType
from mlx_video_tpu.models.ltx.model import init_ltx_params
from mlx_video_tpu.ops.int8 import quantize_params_w8a8
from mlx_video_tpu.ops import attention as attn_mod
from mlx_video_tpu.pipelines import denoise as dn
from mlx_video_tpu.pipelines.positions import create_position_grid

config = LTXModelConfig(
    model_type=LTXModelType.VideoOnly, num_attention_heads=16,
    attention_head_dim=128, in_channels=128, out_channels=128, num_layers=48,
    cross_attention_dim=2048, caption_channels=3840, rope_type=LTXRopeType.SPLIT,
)
b, f, h, w = 1, 5, 16, 16
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    params = quantize_params_w8a8(init_ltx_params(jax.random.key(0), config, dtype=jnp.bfloat16))
params = jax.device_put(params, jax.devices()[0])
jax.block_until_ready(params)

latents = jax.random.normal(jax.random.key(1), (b, config.in_channels, f, h, w), dtype=jnp.bfloat16)
positions = jnp.asarray(create_position_grid(b, f, h, w))
context = jax.random.normal(jax.random.key(2), (b, 128, config.caption_channels), dtype=jnp.bfloat16)
sigmas = [1.0, 0.99375, 0.9875, 0.975, 0.909375, 0.725, 0.421875, 0.2, 0.0]
sig2 = sigmas[:2] + [0.0]
sum_jit = jax.jit(lambda v: jnp.sum(v.astype(jnp.float32)))

orig_sdpa_flat = attn_mod.sdpa_flat
orig_fused = attn_mod.sdpa_flat_fused_rope

def noop_flat(q, k, v, heads, bias=None):
    return v if bias is not None else q  # same shape, no attention math

def noop_fused(q, k, v, heads, pe):
    return q

def measure(tag):
    # fresh jit cache per variant: denoise jits internally; clear via new args? —
    # the module-level monkeypatch happens before trace, so retrace by clearing
    jax.clear_caches()
    def run(sg):
        v, _ = dn.denoise(params, config, latents, positions, context, sg)
        return v
    t0 = time.time(); float(sum_jit(run(sigmas))); c8 = time.time() - t0
    t0 = time.time(); float(sum_jit(run(sig2))); c2 = time.time() - t0
    t8s, t2s = [], []
    for _ in range(3):
        t0 = time.time(); float(sum_jit(run(sigmas))); t8s.append(time.time() - t0)
        t0 = time.time(); float(sum_jit(run(sig2))); t2s.append(time.time() - t0)
    per_step = (np.median(t8s) - np.median(t2s)) / 6
    print(f"{tag}: per-step {per_step*1000:.1f} ms (compiles {c8:.0f}s/{c2:.0f}s)", flush=True)
    return per_step

full = measure("full")

import mlx_video_tpu.models.ltx.model as model_mod
attn_mod.sdpa_flat = noop_flat
attn_mod.sdpa_flat_fused_rope = noop_fused
model_mod.sdpa_flat = noop_flat  # model imports the name directly
no_attn = measure("no self+cross attention math")
attn_mod.sdpa_flat = orig_sdpa_flat
attn_mod.sdpa_flat_fused_rope = orig_fused
model_mod.sdpa_flat = orig_sdpa_flat

print(f"attention math total: {(full-no_attn)*1000:.1f} ms/step")
