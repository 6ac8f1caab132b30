"""GELU(tanh) helper (reference: ltx_core/model/transformer/gelu_approx.py,
a compatibility stub; the engine FFN uses jax.nn.gelu(approximate=True))."""

import jax


def gelu_approx(x):
    return jax.nn.gelu(x, approximate=True)


__all__ = ["gelu_approx"]
