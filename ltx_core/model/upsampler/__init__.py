"""Upsampler re-exports (reference: ltx_core/model/upsampler/__init__.py)."""

from mlx_video_tpu.models.ltx.upsampler import (
    init_latent_upsampler,
    latent_upsampler_apply,
    pixel_shuffle_2d,
    upsample_latents,
)


class LatentUpsamplerConfigurator:
    """Compat configurator (reference: upsampler/__init__.py:6-8)."""

    def __init__(self, *_, **__):
        pass


class LatentUpsampler:
    """Class-style adapter over the functional 2x latent upsampler."""

    def __init__(self, params: dict = None, *, key=None, dtype=None, **init_kw):
        import jax
        import jax.numpy as jnp

        if params is None:
            params = init_latent_upsampler(
                key if key is not None else jax.random.key(0),
                dtype=dtype or jnp.float32,
                **init_kw,
            )
        self.params = params

    def __call__(self, latent):
        return latent_upsampler_apply(self.params, latent)


__all__ = [
    "LatentUpsampler",
    "LatentUpsamplerConfigurator",
    "init_latent_upsampler",
    "latent_upsampler_apply",
    "pixel_shuffle_2d",
    "upsample_latents",
]
