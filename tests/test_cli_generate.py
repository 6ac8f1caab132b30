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


class TestLoadEmbeddings:
    def test_audio_key_loads(self, tmp_path):
        """Regression: `get(\"audio\") or ...` evaluated a JAX array's truth
        value and raised whenever the file had an \"audio\" key."""
        from mlx_video_tpu.cli.generate import load_embeddings

        rng = np.random.default_rng(0)
        path = tmp_path / "e.safetensors"
        save_safetensors(path, {
            "video": rng.standard_normal((8, 48)).astype(np.float32),
            "audio": rng.standard_normal((8, 32)).astype(np.float32),
        })
        text = load_embeddings(path)
        assert text.video_embeddings.shape == (1, 8, 48)
        assert text.audio_embeddings.shape == (1, 8, 32)


class TestResolveVaeFile:
    def test_single_file_quantized_snapshot(self, tmp_path):
        """A snapshot with only the bits-suffixed single transformer file
        (quantized-repo layout) carries VAE tensors in the same file: VAE
        resolution must find it, not FileNotFoundError."""
        from mlx_video_tpu.loading import resolve_vae_file

        f = tmp_path / "ltx-2-19b-distilled-4bit-mlx.safetensors"
        save_safetensors(f, {"x": np.zeros((1,), np.float32)})
        assert resolve_vae_file(tmp_path, "4bit") == f
        with pytest.raises(FileNotFoundError):
            resolve_vae_file(tmp_path / "empty")


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


class TestTrainCLIMain:
    def test_flag_wiring_to_training_config(self, monkeypatch):
        """cli.train main(): the ~50-flag argparse surface maps onto
        TrainingConfig correctly (no tiny on-disk snapshot can satisfy the
        48-layer weight loader, so the Trainer itself is stubbed and the
        captured config asserted — this covers exactly the layer the
        trainer unit tests cannot: the CLI wiring)."""
        import mlx_video_tpu.trainer.trainer as trainer_mod
        from mlx_video_tpu.cli.train import main

        captured = {}

        class StubTrainer:
            def __init__(self, cfg, **kw):
                captured["cfg"] = cfg

            def train(self):
                return 0.5

        monkeypatch.setattr(trainer_mod, "Trainer", StubTrainer)
        main([
            "--model-repo", "/weights",
            "--training-mode", "lora",
            "--strategy", "ic_lora",
            "--with-audio",
            "--batch-size", "3",
            "--steps", "77",
            "--lr", "2e-4",
            "--seed", "7",
            "--output-dir", "/out",
            "--save-every", "11",
            "--keep-last-n", "4",
            "--lora-rank", "16",
            "--lora-alpha", "32",
            "--grad-accum-steps", "2",
            "--max-grad-norm", "0.5",
            "--scheduler-type", "constant",
            "--timestep-sampling-mode", "shifted_logit_normal",
            "--mesh", "1,2,4",
            "--sequence-parallel",
            "--no-preemption-handler",
            "--resume",
        ])
        cfg = captured["cfg"]
        assert cfg.training_mode == "lora"
        assert cfg.strategy == "video_to_video"  # ic_lora maps to v2v
        assert cfg.with_audio and cfg.batch_size == 3 and cfg.steps == 77
        assert cfg.lr == 2e-4 and cfg.seed == 7
        assert cfg.save_every == 11 and cfg.checkpoint_keep_last_n == 4
        assert cfg.lora_rank == 16 and cfg.lora_alpha == 32
        assert cfg.grad_accum_steps == 2 and cfg.max_grad_norm == 0.5
        assert cfg.timestep_sampling_mode == "shifted_logit_normal"
        assert cfg.mesh_shape == [1, 2, 4] and cfg.sequence_parallel
        assert cfg.handle_preemption is False and cfg.resume is True

    def test_yaml_config_path(self, monkeypatch, tmp_path):
        """--config routes through load_training_config instead of flags."""
        import mlx_video_tpu.trainer.trainer as trainer_mod
        from mlx_video_tpu.cli.train import main

        yml = tmp_path / "cfg.yaml"
        yml.write_text(
            "model:\n  training_mode: lora\n"
            "optimization:\n  learning_rate: 0.001\n  steps: 5\n"
        )
        captured = {}

        class StubTrainer:
            def __init__(self, cfg, **kw):
                captured["cfg"] = cfg

            def train(self):
                return 0.1

        monkeypatch.setattr(trainer_mod, "Trainer", StubTrainer)
        main(["--config", str(yml)])
        assert captured["cfg"].training_mode == "lora"
        assert captured["cfg"].steps == 5
