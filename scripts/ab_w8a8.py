"""A/B: dense bf16 vs W8A8 int8 DiT denoise at bench geometry (proxy-3B).

One variant per process (both params trees + two 48-layer graphs exceed one
v5e chip's HBM): ``python scripts/ab_w8a8.py dense|w8a8``. Params are
initialized and (for w8a8) quantized on the host CPU device, then placed on
the TPU, so no fp32 transient ever lands in HBM. Sync via scalar fetch per
PERF.md methodology.
"""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp

from mlx_video_tpu.config import LTXModelConfig, LTXModelType, LTXRopeType
from mlx_video_tpu.models.ltx.model import init_ltx_params
from mlx_video_tpu.ops.int8 import quantize_params_w8a8
from mlx_video_tpu.pipelines import denoise as dn
from mlx_video_tpu.pipelines.positions import create_position_grid

variant = sys.argv[1] if len(sys.argv) > 1 else "dense"
assert variant in ("dense", "w8a8", "w8a8_cross")
if variant == "w8a8_cross":
    from mlx_video_tpu.ops.attention import use_cross_kernel
    use_cross_kernel(True)


config = LTXModelConfig(
    model_type=LTXModelType.VideoOnly, num_attention_heads=16,
    attention_head_dim=128, in_channels=128, out_channels=128, num_layers=48,
    cross_attention_dim=2048, caption_channels=3840, rope_type=LTXRopeType.SPLIT,
)
b, f, h, w = 1, 5, 16, 16

cpu = jax.devices("cpu")[0]
tpu = jax.devices()[0]
with jax.default_device(cpu):
    params = init_ltx_params(jax.random.key(0), config, dtype=jnp.bfloat16)
    if variant.startswith("w8a8"):
        params = quantize_params_w8a8(params)
params = jax.device_put(params, tpu)
jax.block_until_ready(params)

latents = jax.random.normal(jax.random.key(1), (b, config.in_channels, f, h, w), dtype=jnp.bfloat16)
positions = jnp.asarray(create_position_grid(b, f, h, w))
context = jax.random.normal(jax.random.key(2), (b, 128, config.caption_channels), dtype=jnp.bfloat16)
sigmas = [1.0, 0.99375, 0.9875, 0.975, 0.909375, 0.725, 0.421875, 0.2, 0.0]
n_steps = len(sigmas) - 1

sum_jit = jax.jit(lambda v: jnp.sum(v.astype(jnp.float32)))

def run():
    v, _ = dn.denoise(params, config, latents, positions, context, sigmas)
    return v

t0 = time.time()
v = run()
s = float(sum_jit(v))
print(f"{variant}: compile+first {time.time()-t0:.1f}s sum={s:.3f}", flush=True)
assert np.isfinite(s)

t0 = time.time()
for _ in range(3):
    float(sum_jit(latents))
rpc = (time.time() - t0) / 3
print(f"rpc baseline {rpc*1000:.0f}ms", flush=True)

vals = []
for rep in range(5):
    t0 = time.time()
    v = run()
    float(sum_jit(v))
    el = time.time() - t0 - rpc
    vals.append(n_steps / el)
    print(f"rep{rep}: {n_steps/el:.2f} steps/s", flush=True)
print(f"{variant}: median {np.median(vals):.2f} steps/s")

# stash final latents for a cross-process numerics check
np.save(f"/tmp/ab_w8a8_{variant}.npy", np.asarray(v.astype(jnp.float32)))

# Fixed-cost-cancelling protocol (PERF.md): time an 8-step and a 2-step scan;
# per-step = (t8 - t2) / 6 — tunnel RPC and dispatch costs cancel.
sig2 = sigmas[:2] + [0.0]

def run2():
    v, _ = dn.denoise(params, config, latents, positions, context, sig2)
    return v

v2 = run2(); float(sum_jit(v2))  # compile 2-step scan
t8s, t2s = [], []
for _ in range(4):
    t0 = time.time(); float(sum_jit(run()));  t8s.append(time.time() - t0)
    t0 = time.time(); float(sum_jit(run2())); t2s.append(time.time() - t0)
per_step = (np.median(t8s) - np.median(t2s)) / (n_steps - 2)
print(f"{variant}: per-step (2n-extrapolated) {per_step*1000:.1f} ms = {1/per_step:.2f} steps/s")
