"""End-to-end wiring test for the generate CLI main().

The real main() can only load flagship-geometry snapshots
(loading.model_config_for pins the 19B config), so weights cannot be tiny
on disk; instead load_model_bundle is patched to return an in-memory tiny
bundle and main() runs the FULL user path on CPU: argparse -> quantized
execution setup (shared loading.quantize_models) -> mesh sharding ->
embeddings file -> generate_video -> mp4 on disk. This covers the CLI
orchestration that unit tests of the helpers cannot (flag plumbing, path
handling, profile JSON), at tiny cost.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_video_tpu.config import LTXModelType, VideoVAEConfig, tiny_test_config
from mlx_video_tpu.io.safetensors import save_safetensors
from mlx_video_tpu.models.ltx.model import init_ltx_params
from mlx_video_tpu.models.ltx.upsampler import init_latent_upsampler
from mlx_video_tpu.models.ltx.video_vae.decoder import DecoderConfig, init_video_decoder
from mlx_video_tpu.pipelines.generate import ModelBundle


def _tiny_bundle(dtype=jnp.bfloat16):
    cfg = tiny_test_config(LTXModelType.VideoOnly)
    dec_cfg = DecoderConfig(
        in_channels=cfg.in_channels, base_channels=32, num_layers_per_block=1,
        num_upsamples=3, patch_size=4,
    )
    params = init_ltx_params(jax.random.key(0), cfg, dtype=dtype)
    return ModelBundle(
        transformer_params=params,
        transformer_config=cfg,
        vae_decoder_params=init_video_decoder(jax.random.key(1), dec_cfg, dtype=dtype),
        vae_decoder_config=dec_cfg,
        upsampler_params=init_latent_upsampler(
            jax.random.key(3), in_channels=cfg.in_channels, mid_channels=32,
            num_blocks=1, dtype=dtype,
        ),
    )


@pytest.fixture
def emb_file(tmp_path):
    path = tmp_path / "emb.safetensors"
    rng = np.random.default_rng(0)
    save_safetensors(
        path,
        {"video_prompt_embeds": rng.standard_normal((8, 48)).astype(np.float32)},
    )
    return path


def _run_main(tmp_path, emb_file, bundle, extra_flags=()):
    import mlx_video_tpu.loading as loading
    from mlx_video_tpu.cli.generate import main

    out = tmp_path / "out.mp4"
    orig = loading.load_model_bundle
    loading.load_model_bundle = lambda *a, **k: bundle
    try:
        main([
            "--prompt", "a tiny cat",
            "--checkpoint-path", str(tmp_path),
            "--embeddings", str(emb_file),
            "--height", "64", "--width", "64", "--num-frames", "9",
            "--stage1-steps", "1", "--stage2-steps", "1",
            "--tiling", "none",
            "--output-path", str(out),
            "--profile-json-path", str(tmp_path / "phases.json"),
            *extra_flags,
        ])
    finally:
        loading.load_model_bundle = orig
    return out


class TestGenerateCLIMain:
    def test_main_writes_mp4_and_profile(self, tmp_path, emb_file):
        out = _run_main(tmp_path, emb_file, _tiny_bundle())
        assert out.exists() and out.stat().st_size > 0
        report = json.loads((tmp_path / "phases.json").read_text())
        assert "stage1_denoise" in report["phases"]

    def test_main_w4a8_quantizes_and_runs(self, tmp_path, emb_file):
        """--w4a8 through main(): the shared quantize_models must quantize
        the fresh bf16 tree (serve's old bare prepare_w4a8 was a no-op) and
        the pipeline must run on the quantized tree."""
        bundle = _tiny_bundle()
        out = _run_main(tmp_path, emb_file, bundle, ("--w4a8",))
        assert out.exists() and out.stat().st_size > 0

        def has(node, leaf):
            return isinstance(node, dict) and (
                leaf in node or any(has(v, leaf) for v in node.values())
            )

        assert has(bundle.transformer_params, "quant_weight")
        assert has(bundle.transformer_params, "int8_scale")

    def test_main_mesh_auto(self, tmp_path, emb_file):
        """--mesh auto on the suite's virtual 8-CPU mesh: factor_devices
        picks the shape, shard_models places every transformer, and the
        sharded pipeline still writes the video."""
        out = _run_main(tmp_path, emb_file, _tiny_bundle(), ("--mesh", "auto"))
        assert out.exists() and out.stat().st_size > 0
