"""On-chip parity check for the flash-attention kernels after the
residual/routing change (single-lane lse residual, in-kernel D = rowsum(dO*O),
save_lse always routed to the online-softmax kernel).

Interpret-mode tests cover the math on CPU; this validates the same programs
through the REAL Mosaic TPU compilation path: forward vs XLA, backward
(forced Pallas dq/dkv kernels) vs XLA grads, including a saturated-logit
case that the clamped single-pass lse used to NaN-poison.

Usage: python scripts/chip_check_flash.py
"""

from __future__ import annotations

import os
import sys

os.environ["MLX_VIDEO_TPU_FLASH_BWD"] = "1"

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mlx_video_tpu.ops.flash_attention import flash_attention as _fa  # noqa: E402

INTERPRET = "--interpret" in sys.argv  # CPU smoke mode for the script itself
if INTERPRET:
    jax.config.update("jax_platforms", "cpu")


def flash_attention(q, k, v, scale):
    return _fa(q, k, v, scale, interpret=INTERPRET)


def check(name, s, scale_inputs=1.0, atol=2e-2, check_fwd=True):
    b, h, d = 1, 4, 128
    k1, k2, k3, k4 = jax.random.split(jax.random.key(0), 4)
    q = jax.random.normal(k1, (b, s, h, d), dtype=jnp.float32) * scale_inputs
    k = jax.random.normal(k2, (b, s, h, d), dtype=jnp.float32) * scale_inputs
    v = jax.random.normal(k3, (b, s, h, d), dtype=jnp.float32)
    co = jax.random.normal(k4, (b, s, h, d), dtype=jnp.float32)
    scale = d**-0.5

    out = flash_attention(q, k, v, scale)
    ref = jax.nn.dot_product_attention(q, k, v, scale=scale)
    fwd_err = float(jnp.max(jnp.abs(out - ref)))

    gf = jax.grad(lambda q, k, v: jnp.sum(flash_attention(q, k, v, scale) * co),
                  argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(lambda q, k, v: jnp.sum(
        jax.nn.dot_product_attention(q, k, v, scale=scale) * co),
        argnums=(0, 1, 2))(q, k, v)
    errs = [float(jnp.max(jnp.abs(a - b_))) for a, b_ in zip(gf, gx)]
    finite = all(bool(jnp.all(jnp.isfinite(a))) for a in gf)
    ok = finite and all(e < atol for e in errs) and (not check_fwd or fwd_err < atol)
    print(f"{name}: fwd_err={fwd_err:.2e} grad_errs={[f'{e:.2e}' for e in errs]} "
          f"finite={finite} -> {'OK' if ok else 'FAIL'}")
    return ok


def main():
    print("devices:", jax.devices())
    ok = True
    if INTERPRET:  # CPU smoke of the script itself: tiny sizes only
        ok &= check("s=256 (interpret smoke)", 256)
        ok &= check("s=256 saturated (interpret smoke)", 256, scale_inputs=12.0,
                    atol=5e-2, check_fwd=False)
        print("CHIP FLASH CHECK (interpret smoke):", "PASS" if ok else "FAIL")
        return 0 if ok else 1
    ok &= check("s=1280 (DiT geometry, single-pass fwd + online-lse bwd)", 1280)
    ok &= check("s=2048 (threshold boundary)", 2048)
    ok &= check("s=2560 (online fwd, multi-k-block bwd)", 2560)
    # saturated logits: rows with self-logits > 80 after 1/sqrt(d). The
    # inference forward (clamped single-pass) is a documented approximation
    # there, so only the gradients gate — they must be finite and exact
    # (the grad path's forward uses the online kernel via save_lse).
    ok &= check("s=1280 saturated (logits > +/-80)", 1280, scale_inputs=12.0,
                atol=5e-2, check_fwd=False)
    print("CHIP FLASH CHECK:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
