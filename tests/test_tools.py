"""Tools tests: VAE weight loaders, convert CLI, precompute buckets, hub, CLIs."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_video_tpu.io.safetensors import save_safetensors
from mlx_video_tpu.io.weights import flatten_params


def _pt_conv3d(a):  # (D,H,W,I,O) -> (O,I,D,H,W)
    return np.ascontiguousarray(np.transpose(np.asarray(a), (4, 3, 0, 1, 2)))


def _pt_conv2d(a):  # (H,W,I,O) -> (O,I,H,W)
    return np.ascontiguousarray(np.transpose(np.asarray(a), (3, 2, 0, 1)))


class TestVideoDecoderWeights:
    def test_round_trip_with_diffusers_remap(self, tmp_path, rng):
        from mlx_video_tpu.io.vae_weights import load_video_decoder_weights
        from mlx_video_tpu.models.ltx.video_vae.decoder import DecoderConfig, init_video_decoder

        cfg = DecoderConfig(
            in_channels=8, base_channels=32, num_layers_per_block=1, num_upsamples=3, patch_size=4
        )
        ref = init_video_decoder(jax.random.key(0), cfg, dtype=jnp.float32)
        # randomize so zeros don't hide mapping errors
        ref = jax.tree.map(
            lambda x: jnp.asarray(rng.normal(size=x.shape).astype(np.float32)), ref
        )

        # build checkpoint in upstream diffusers layout:
        # mid_block.resnets.i (group 0), up_blocks.b.{resnets,upsamplers,time_embedder}
        # (our res_blocks leaves are scan-stacked -> unstack to per-index keys)
        flat = {}
        for flat_key, leaf in flatten_params(ref).items():
            parts = flat_key.split(".")
            if "res_blocks" in parts:
                i = parts.index("res_blocks")
                for j in range(np.asarray(leaf).shape[0]):
                    key_j = ".".join(parts[: i + 1] + [str(j)] + parts[i + 1 :])
                    flat[key_j] = np.asarray(leaf)[j]
            else:
                flat[flat_key] = leaf
        ckpt = {}
        for flat_key, leaf in flat.items():
            arr = np.asarray(leaf)
            parts = flat_key.split(".")
            if parts[0] in ("latents_mean", "latents_std"):
                continue
            if parts[0] == "up_blocks":
                idx = int(parts[1])
                rest = parts[2:]
                if idx == 0 and rest[0] == "res_blocks":
                    name = ".".join(["mid_block", "resnets", parts[3]] + parts[4:])
                elif idx == 0 and rest[0] == "time_embedder":
                    name = ".".join(["mid_block"] + rest)
                elif idx % 2 == 1:  # upsampler -> up_blocks.b.upsamplers.0
                    b = (idx - 1) // 2
                    name = ".".join(["up_blocks", str(b), "upsamplers", "0"] + rest)
                elif rest[0] == "res_blocks":  # diffusers "resnets" naming
                    b = (idx - 2) // 2
                    name = ".".join(["up_blocks", str(b), "resnets"] + rest[1:])
                else:  # group time_embedder
                    b = (idx - 2) // 2
                    name = ".".join(["up_blocks", str(b)] + rest)
            else:
                name = flat_key
            # conv dicts carry a .conv nesting in checkpoints; linears nest
            # under timestep_embedder
            name = name.replace("linear_1", "timestep_embedder.linear_1")
            name = name.replace("linear_2", "timestep_embedder.linear_2")
            if arr.ndim == 5:
                arr = _pt_conv3d(arr)
                name = name.replace(".weight", ".conv.weight")
            elif arr.ndim == 2 and name.endswith("weight"):
                arr = np.ascontiguousarray(arr.T)  # PT linear (O, I)
            ckpt["decoder." + name] = arr
        ckpt["per_channel_statistics.std-of-means"] = rng.uniform(0.5, 2, size=(8,)).astype(np.float32)
        ckpt["per_channel_statistics.mean-of-means"] = rng.normal(size=(8,)).astype(np.float32)

        path = tmp_path / "vae.safetensors"
        save_safetensors(path, ckpt)

        loaded = init_video_decoder(jax.random.key(1), cfg, dtype=jnp.float32)
        n = load_video_decoder_weights(path, loaded, dtype=jnp.float32)
        assert n > 20
        for k, v in flatten_params(ref).items():
            if k.startswith("latents_"):
                continue
            got = flatten_params(loaded)[k]
            np.testing.assert_allclose(np.asarray(got), np.asarray(v), atol=1e-6, err_msg=k)
        np.testing.assert_allclose(
            np.asarray(loaded["latents_std"]), ckpt["per_channel_statistics.std-of-means"]
        )


class TestEncoderUpsamplerWeights:
    def test_encoder_round_trip(self, tmp_path, rng):
        from mlx_video_tpu.config import VideoVAEConfig
        from mlx_video_tpu.io.vae_weights import load_video_encoder_weights
        from mlx_video_tpu.models.ltx.video_vae.encoder import init_video_encoder

        cfg = VideoVAEConfig(
            in_channels=3, out_channels=8, latent_channels=8, patch_size=4,
            encoder_blocks=(("res_x", {"num_layers": 1}), ("compress_space_res", {"multiplier": 2})),
        )
        ref = init_video_encoder(jax.random.key(0), cfg, dtype=jnp.float32)
        ref = jax.tree.map(lambda x: jnp.asarray(rng.normal(size=x.shape).astype(np.float32)), ref)

        ckpt = {}
        for k, leaf in flatten_params(ref).items():
            arr = np.asarray(leaf)
            if k.startswith("per_channel_statistics"):
                continue
            name = k
            if arr.ndim == 5:
                arr = _pt_conv3d(arr)
                name = name.replace(".weight", ".conv.weight")
            ckpt["encoder." + name] = arr
        ckpt["per_channel_statistics.mean-of-means"] = rng.normal(size=(8,)).astype(np.float32)
        ckpt["per_channel_statistics.std-of-means"] = rng.uniform(0.5, 2, (8,)).astype(np.float32)
        path = tmp_path / "vae.safetensors"
        save_safetensors(path, ckpt)

        loaded = init_video_encoder(jax.random.key(1), cfg, dtype=jnp.float32)
        load_video_encoder_weights(path, loaded, dtype=jnp.float32)
        for k, v in flatten_params(ref).items():
            if k.startswith("per_channel_statistics"):
                continue
            np.testing.assert_allclose(
                np.asarray(flatten_params(loaded)[k]), np.asarray(v), atol=1e-6, err_msg=k
            )

    def test_upsampler_round_trip(self, tmp_path, rng):
        from mlx_video_tpu.io.vae_weights import load_upsampler_weights
        from mlx_video_tpu.models.ltx.upsampler import init_latent_upsampler

        ref = init_latent_upsampler(jax.random.key(0), in_channels=8, mid_channels=32, num_blocks=1, dtype=jnp.float32)
        ref = jax.tree.map(lambda x: jnp.asarray(rng.normal(size=x.shape).astype(np.float32)), ref)
        # upstream layout has per-index res-block keys; ours are scan-stacked
        flat = {}
        for k, leaf in flatten_params(ref).items():
            parts = k.split(".")
            if parts[0].endswith("res_blocks"):
                for j in range(np.asarray(leaf).shape[0]):
                    flat[".".join([parts[0], str(j)] + parts[1:])] = np.asarray(leaf)[j]
            else:
                flat[k] = leaf
        ckpt = {}
        for k, leaf in flat.items():
            arr = np.asarray(leaf)
            if arr.ndim == 5:
                arr = _pt_conv3d(arr)
            elif arr.ndim == 4:
                arr = _pt_conv2d(arr)
            ckpt[k] = arr
        path = tmp_path / "ups.safetensors"
        save_safetensors(path, ckpt)

        loaded = init_latent_upsampler(jax.random.key(1), in_channels=8, mid_channels=32, num_blocks=1, dtype=jnp.float32)
        load_upsampler_weights(path, loaded, dtype=jnp.float32)
        for k, v in flatten_params(ref).items():
            np.testing.assert_allclose(
                np.asarray(flatten_params(loaded)[k]), np.asarray(v), atol=1e-6, err_msg=k
            )


class TestVocoderWeights:
    def test_round_trip(self, tmp_path, rng):
        from mlx_video_tpu.io.vae_weights import load_vocoder_weights
        from mlx_video_tpu.models.ltx.audio_vae.vocoder import VocoderConfig, init_vocoder

        cfg = VocoderConfig(
            upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
            resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
            upsample_initial_channel=32, mel_in_channels=32,
        )
        ref = init_vocoder(jax.random.key(0), cfg, dtype=jnp.float32)
        ref = jax.tree.map(lambda x: jnp.asarray(rng.normal(size=x.shape).astype(np.float32)), ref)
        ckpt = {}
        for k, leaf in flatten_params(ref).items():
            arr = np.asarray(leaf)
            if arr.ndim == 3:
                if k.startswith("ups."):
                    arr = np.ascontiguousarray(np.transpose(arr, (1, 2, 0)))  # (K,I,O)->(I,O,K)
                else:
                    arr = np.ascontiguousarray(np.transpose(arr, (2, 1, 0)))  # (K,I,O)->(O,I,K)
            ckpt["vocoder." + k] = arr
        path = tmp_path / "voc.safetensors"
        save_safetensors(path, ckpt)

        loaded = init_vocoder(jax.random.key(1), cfg, dtype=jnp.float32)
        load_vocoder_weights(path, loaded, dtype=jnp.float32)
        for k, v in flatten_params(ref).items():
            np.testing.assert_allclose(
                np.asarray(flatten_params(loaded)[k]), np.asarray(v), atol=1e-6, err_msg=k
            )


class TestConvertCLI:
    def test_convert_and_reload(self, tmp_path, rng):
        from mlx_video_tpu.config import LTXModelType, tiny_test_config
        from mlx_video_tpu.convert import convert_transformer
        from mlx_video_tpu.io.weights import load_native_params
        from mlx_video_tpu.models.ltx.model import init_ltx_params
        from test_weights_io import _to_pt_checkpoint

        cfg = tiny_test_config(LTXModelType.VideoOnly)
        ref = init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32)
        src = tmp_path / "pt.safetensors"
        save_safetensors(src, _to_pt_checkpoint(ref, cfg))

        out = tmp_path / "native.safetensors"
        convert_transformer([src], out, config=cfg, dtype=jnp.float32)
        loaded = load_native_params(out)
        for k, v in flatten_params(ref).items():
            np.testing.assert_allclose(
                np.asarray(flatten_params(loaded)[k]), np.asarray(v), atol=0, err_msg=k
            )

    def test_convert_quantized(self, tmp_path):
        import json

        from mlx_video_tpu.config import LTXModelType, tiny_test_config
        from mlx_video_tpu.convert import convert_transformer
        from mlx_video_tpu.models.ltx.model import init_ltx_params
        from test_weights_io import _to_pt_checkpoint

        cfg = tiny_test_config(LTXModelType.VideoOnly)
        ref = init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32)
        src = tmp_path / "pt.safetensors"
        save_safetensors(src, _to_pt_checkpoint(ref, cfg))
        out = tmp_path / "q" / "native.safetensors"
        out.parent.mkdir()
        params = convert_transformer(
            [src], out, config=cfg, dtype=jnp.float32,
            quantize_bits=8, quantize_group_size=32,
        )
        assert "quant_weight" in params["blocks"]["attn1"]["to_q"]
        meta = json.loads((out.parent / "quantization.json").read_text())
        assert meta["bits"] == 8 and meta["group_size"] == 32


class TestPrecompute:
    def test_bucket_selection(self):
        from mlx_video_tpu.trainer.precompute import parse_buckets, select_bucket

        buckets = parse_buckets("512x512x33;768x512x65")
        assert buckets == [(512, 512, 33), (768, 512, 65)]
        frames = np.zeros((30, 500, 520, 3), dtype=np.float32)
        assert select_bucket(frames, buckets) == (512, 512, 33)
        frames = np.zeros((70, 512, 760, 3), dtype=np.float32)
        assert select_bucket(frames, buckets) == (768, 512, 65)

    def test_frame_trim_and_pad(self):
        from mlx_video_tpu.trainer.precompute import match_frame_count

        frames = np.arange(10)[:, None, None, None] * np.ones((10, 2, 2, 3), np.float32)
        assert match_frame_count(frames, 6).shape[0] == 6
        padded = match_frame_count(frames, 14)
        assert padded.shape[0] == 14
        np.testing.assert_array_equal(padded[10:], np.repeat(frames[-1:], 4, axis=0))

    def test_resize_center_crop(self):
        from mlx_video_tpu.trainer.precompute import resize_and_center_crop

        frames = np.random.default_rng(0).uniform(size=(2, 100, 200, 3)).astype(np.float32)
        out = resize_and_center_crop(frames, 64, 64)
        assert out.shape == (2, 64, 64, 3)

    def test_precompute_dataset_layout(self, tmp_path, rng):
        import cv2

        from mlx_video_tpu.trainer.datasets import PrecomputedDataset
        from mlx_video_tpu.trainer.precompute import precompute_dataset

        # write a tiny video
        vid_dir = tmp_path / "vids"
        vid_dir.mkdir()
        path = vid_dir / "clip.mp4"
        w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 24, (64, 64))
        for _ in range(9):
            w.write((rng.uniform(size=(64, 64, 3)) * 255).astype(np.uint8))
        w.release()

        def fake_encode(t):
            b, c, f, h, w_ = t.shape
            return rng.normal(size=(b, 8, 1 + (f - 1) // 8, h // 32, w_ // 32)).astype(np.float32)

        def fake_text(prompt):
            return {
                "video_prompt_embeds": rng.normal(size=(8, 16)).astype(np.float32),
                "prompt_attention_mask": np.ones((8,), bool),
            }

        out_root = tmp_path / "data"
        n = precompute_dataset(
            [path], out_root, encode_fn=fake_encode, text_encode_fn=fake_text,
            prompts={"clip": "a test"},
        )
        assert n == 1
        ds = PrecomputedDataset(out_root)
        assert len(ds) == 1
        batch = ds[0]
        assert batch.latents["latents"].shape[0] == 8
        assert "video_prompt_embeds" in batch.conditions

    def test_precompute_reference_dir_caption_framecap(self, tmp_path, rng):
        import cv2

        from mlx_video_tpu.trainer.precompute import precompute_dataset

        def write_vid(path, frames=17):
            w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 24, (64, 64))
            for _ in range(frames):
                w.write((rng.uniform(size=(64, 64, 3)) * 255).astype(np.uint8))
            w.release()

        vid_dir = tmp_path / "vids"; vid_dir.mkdir()
        ref_dir = tmp_path / "refs"; ref_dir.mkdir()
        write_vid(vid_dir / "clip.mp4")
        write_vid(ref_dir / "clip.mp4")

        shapes = []

        def fake_encode(t):
            shapes.append(t.shape)
            b, c, f, h, w_ = t.shape
            return rng.normal(size=(b, 8, 1 + (f - 1) // 8, h // 32, w_ // 32)).astype(np.float32)

        captions = []

        def fake_caption(path):
            captions.append(path.name)
            return "auto caption"

        prompts_seen = []

        def fake_text(prompt):
            prompts_seen.append(prompt)
            return {"video_prompt_embeds": rng.normal(size=(8, 16)).astype(np.float32)}

        out_root = tmp_path / "data"
        n = precompute_dataset(
            [vid_dir / "clip.mp4"], out_root, encode_fn=fake_encode,
            text_encode_fn=fake_text, frame_cap=9, caption_fn=fake_caption,
            reference_dir=ref_dir,
        )
        assert n == 1
        assert captions == ["clip.mp4"] and prompts_seen == ["auto caption"]
        # frame_cap=9 -> both main and reference encodes saw 9 frames
        assert all(s[2] == 9 for s in shapes)
        assert (out_root / "reference_latents" / "latent_clip.safetensors").exists()

    def test_reference_dir_conforms_to_target_geometry(self, tmp_path, rng):
        """Reference clips must pass through the SAME bucket fit + frame
        padding as targets: a mismatched/short ref clip previously produced
        reference latents that could not stack against the target batch."""
        import cv2

        from mlx_video_tpu.trainer.precompute import precompute_dataset

        def write_vid(path, frames, size):
            w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 24, size)
            for _ in range(frames):
                w.write((rng.uniform(size=(size[1], size[0], 3)) * 255).astype(np.uint8))
            w.release()

        vid_dir = tmp_path / "vids"; vid_dir.mkdir()
        ref_dir = tmp_path / "refs"; ref_dir.mkdir()
        write_vid(vid_dir / "clip.mp4", frames=20, size=(128, 96))
        # shorter AND differently-sized reference
        write_vid(ref_dir / "clip.mp4", frames=5, size=(64, 64))

        shapes = []

        def fake_encode(t):
            shapes.append(t.shape)
            b, c, f, h, w_ = t.shape
            return rng.normal(size=(b, 8, 1 + (f - 1) // 8, h // 32, w_ // 32)).astype(np.float32)

        n = precompute_dataset(
            [vid_dir / "clip.mp4"], tmp_path / "data", encode_fn=fake_encode,
            buckets=[(64, 64, 17)], reference_dir=ref_dir,
        )
        assert n == 1
        # target bucketed to 64x64x17 and the ref conformed to the same
        assert len(shapes) == 2 and shapes[0] == shapes[1], shapes
        assert shapes[0][2:] == (17, 64, 64), shapes


class TestHub:
    def test_alias_and_local(self, tmp_path):
        from mlx_video_tpu.utils.hub import MODEL_REPO_ALIASES, get_model_path

        assert "ltx2-dev-8bit-mlx" in MODEL_REPO_ALIASES
        p = get_model_path(str(tmp_path))
        assert p == tmp_path

    def test_missing_raises(self):
        from mlx_video_tpu.utils.hub import get_model_path

        with pytest.raises(FileNotFoundError):
            get_model_path("definitely/nonexistent-repo-xyz", allow_download=False)


class TestCLIParsers:
    def test_generate_parser(self):
        from mlx_video_tpu.cli.generate import build_parser

        args = build_parser().parse_args(
            [
                "--prompt", "a cat", "-H", "480", "-W", "832", "-n", "30",
                "--pipeline", "distilled", "--image", "img.png", "0", "0.9",
                "--lora", "a.safetensors", "--audio", "--stream",
                "--tiling", "temporal", "--embeddings", "emb.safetensors",
            ]
        )
        assert args.height == 480 and args.width == 832
        assert args.image == [["img.png", "0", "0.9"]]
        assert args.audio and args.stream
        assert args.low_memory is False
        assert build_parser().parse_args(["--prompt", "x", "--low-memory"]).low_memory

    def test_train_parser(self):
        from mlx_video_tpu.cli.train import build_parser

        args = build_parser().parse_args(["--training-mode", "lora", "--steps", "5", "--mesh", "1,2,4"])
        assert args.training_mode == "lora" and args.steps == 5

    def test_slugify(self):
        from mlx_video_tpu.cli.generate import slugify

        assert slugify("A Cat! Jumping?") == "a-cat-jumping"
        assert slugify("") == "video"

    def test_audio_bitrate_and_reference_flags(self):
        # reference CLI parity: generate.py:4368 (+4672 no-op), 4446
        from mlx_video_tpu.cli.generate import build_parser

        args = build_parser().parse_args(
            ["--prompt", "x", "--audio-bitrate", "192k", "--include-reference-in-output"]
        )
        assert args.audio_bitrate == "192k"
        assert args.include_reference_in_output is True
        assert build_parser().parse_args(["--prompt", "x"]).audio_bitrate is None


class TestVideoWriterFfmpeg:
    """The ffmpeg pipe writer must fail LOUDLY (with ffmpeg's stderr) when
    the encode fails, and never deadlock on a filled stderr pipe."""

    def _stub_ffmpeg(self, tmp_path, script_body: str) -> dict:
        stub_dir = tmp_path / "bin"
        stub_dir.mkdir()
        stub = stub_dir / "ffmpeg"
        stub.write_text("#!/bin/sh\n" + script_body)
        stub.chmod(0o755)
        import os

        return {**os.environ, "PATH": f"{stub_dir}:{os.environ['PATH']}"}

    def test_failed_encode_raises_with_stderr(self, tmp_path, monkeypatch):
        import os

        env = self._stub_ffmpeg(tmp_path, 'echo "stub encoder exploded" >&2\nexit 3\n')
        monkeypatch.setattr(os, "environ", env)
        monkeypatch.setenv("PATH", env["PATH"])
        from mlx_video_tpu.io.media import VideoWriter

        w = VideoWriter(tmp_path / "out.mp4", 64, 64, 24, encoder="ffmpeg")
        assert w._ffmpeg is not None, "stub ffmpeg not picked up"
        with pytest.raises((RuntimeError, BrokenPipeError)) as exc:
            # the stub exits without reading stdin -> broken pipe -> close()
            # raises the diagnostic; a tiny write may also buffer, in which
            # case close() itself raises
            w.write(np.zeros((30, 64, 64, 3), np.uint8))
            w.close()
        assert "stub encoder exploded" in str(exc.value) or isinstance(
            exc.value, BrokenPipeError
        )

    def test_noisy_stderr_does_not_deadlock(self, tmp_path, monkeypatch):
        """A chatty encoder (>64 KB stderr, the old pipe deadlock) must
        still complete: stderr goes to a file, not a pipe."""
        import os

        env = self._stub_ffmpeg(
            tmp_path,
            # spew ~1 MB to stderr, then drain stdin and succeed
            'i=0\nwhile [ $i -lt 16384 ]; do echo '
            '"frame=$i fps=0.0 q=-1.0 size=N/A time=00:00:00.00" >&2; '
            'i=$((i+1)); done\ncat > /dev/null\n'
            'echo ok > "$(eval echo \\${$#})"\nexit 0\n',
        )
        monkeypatch.setenv("PATH", env["PATH"])
        from mlx_video_tpu.io.media import VideoWriter

        w = VideoWriter(tmp_path / "out.mp4", 64, 64, 24, encoder="ffmpeg")
        assert w._ffmpeg is not None
        w.write(np.zeros((8, 64, 64, 3), np.uint8))
        w.close()  # must not hang or raise


class TestMuxAudio:
    def test_mux_command_parity(self, monkeypatch, tmp_path):
        """The mux must pass -b:a/-ar/-ac/-map/+faststart and must NOT use
        -shortest (reference: generate.py:1980-2033 — -shortest drops final
        video frames when audio is a hop shorter)."""
        import subprocess as sp

        from mlx_video_tpu.io import media

        captured = {}

        def fake_run(cmd, **kw):
            captured["cmd"] = cmd

            class R:
                returncode = 0

            return R()

        monkeypatch.setattr(sp, "run", fake_run)
        monkeypatch.setattr(media.shutil, "which", lambda name: "/usr/bin/ffmpeg")
        ok = media.mux_audio(
            tmp_path / "v.mp4", tmp_path / "a.wav", tmp_path / "o.mp4",
            audio_filter="highpass=f=40", audio_bitrate="192k", audio_sample_rate=24000,
        )
        assert ok
        cmd = captured["cmd"]
        assert "-shortest" not in cmd
        pairs = list(zip(cmd, cmd[1:]))
        for pair in (("-b:a", "192k"), ("-ar", "24000"), ("-ac", "2"),
                     ("-map", "0:v:0"), ("-map", "1:a:0"),
                     ("-af", "highpass=f=40"), ("-movflags", "+faststart")):
            assert pair in pairs, (pair, cmd)

    def test_mux_filter_disable_tokens(self, monkeypatch, tmp_path):
        import subprocess as sp

        from mlx_video_tpu.io import media

        captured = {}

        def fake_run(cmd, **kw):
            captured["cmd"] = cmd

            class R:
                returncode = 0

            return R()

        monkeypatch.setattr(sp, "run", fake_run)
        monkeypatch.setattr(media.shutil, "which", lambda name: "/usr/bin/ffmpeg")
        for tok in ("none", "OFF", "false", "0", None, ""):
            media.mux_audio(tmp_path / "v.mp4", tmp_path / "a.wav", tmp_path / "o.mp4",
                            audio_filter=tok)
            assert "-af" not in captured["cmd"], tok


class TestAudioTransformerResolution:
    def test_candidates_priority(self, tmp_path):
        from mlx_video_tpu.loading import resolve_audio_transformer_file

        main = tmp_path / "main"; main.mkdir()
        audio = tmp_path / "audio"; audio.mkdir()
        assert resolve_audio_transformer_file(main) is None
        (main / "ltx-2-19b-distilled-mlx.safetensors").touch()
        assert resolve_audio_transformer_file(main).name == "ltx-2-19b-distilled-mlx.safetensors"
        # dev weights preferred over distilled
        (main / "ltx-2-19b-dev-mlx.safetensors").touch()
        assert resolve_audio_transformer_file(main).name == "ltx-2-19b-dev-mlx.safetensors"
        # explicit audio repo wins over the main snapshot
        (audio / "ltx-2-19b-dev.safetensors").touch()
        got = resolve_audio_transformer_file(main, audio)
        assert got.parent == audio and got.name == "ltx-2-19b-dev.safetensors"


class TestUnifiedBundle:
    def test_build_and_load(self, tmp_path, rng):
        from mlx_video_tpu.config import LTXModelType, tiny_test_config
        from mlx_video_tpu.convert import build_unified_bundle
        from mlx_video_tpu.io.safetensors import SafetensorsReader, read_metadata
        from mlx_video_tpu.io.weights import load_native_params
        from mlx_video_tpu.loading import unified_bundle_file
        from mlx_video_tpu.models.ltx.model import init_ltx_params

        cfg = tiny_test_config(LTXModelType.VideoOnly)
        ref = init_ltx_params(jax.random.key(3), cfg, dtype=jnp.float32)

        # snapshot with a monolithic vae-bearing file
        snap = tmp_path / "snap"; snap.mkdir()
        vae_src = {
            "vae.decoder.conv_in.conv.weight": rng.normal(size=(4, 4, 3, 3, 3)).astype(np.float32),
            "vae.encoder.conv_in.conv.weight": rng.normal(size=(4, 4, 3, 3, 3)).astype(np.float32),
            "vae.per_channel_statistics.std-of-means": rng.uniform(0.5, 2, size=(8,)).astype(np.float32),
            "vae.per_channel_statistics.mean-of-means": rng.normal(size=(8,)).astype(np.float32),
        }
        save_safetensors(snap / "ltx-2-19b-dev.safetensors", vae_src)

        bundle = tmp_path / "model.safetensors"
        n = build_unified_bundle(bundle, ref, model_path=snap)
        assert n > 10
        assert read_metadata(bundle)["format"] == "mlx_video_tpu_unified"
        assert unified_bundle_file(tmp_path) == bundle
        with SafetensorsReader(bundle) as r:
            keys = set(r.keys())
        assert "vae_decoder.conv_in.conv.weight" in keys
        assert "vae_encoder.conv_in.conv.weight" in keys
        assert "vae_decoder.per_channel_statistics.std-of-means" in keys

        loaded = load_native_params(bundle, prefix="transformer.")
        for k, v in flatten_params(ref).items():
            np.testing.assert_array_equal(
                np.asarray(flatten_params(loaded)[k]), np.asarray(v), err_msg=k
            )

    def test_decoder_stats_from_bundle(self, tmp_path, rng):
        """The decoder loader reads per-channel stats from bundle-prefixed keys."""
        from mlx_video_tpu.io.vae_weights import load_video_decoder_weights
        from mlx_video_tpu.models.ltx.video_vae.decoder import DecoderConfig, init_video_decoder

        std = rng.uniform(0.5, 2, size=(8,)).astype(np.float32)
        mean = rng.normal(size=(8,)).astype(np.float32)
        save_safetensors(tmp_path / "model.safetensors", {
            "vae_decoder.per_channel_statistics.std-of-means": std,
            "vae_decoder.per_channel_statistics.mean-of-means": mean,
        })
        cfg = DecoderConfig(in_channels=8, base_channels=32, num_layers_per_block=1,
                            num_upsamples=3, patch_size=4)
        params = init_video_decoder(jax.random.key(0), cfg, dtype=jnp.float32)
        load_video_decoder_weights(tmp_path / "model.safetensors", params, dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(params["latents_std"]), std)
        np.testing.assert_allclose(np.asarray(params["latents_mean"]), mean)


class TestPostprocess:
    def test_reduce_grid_methods(self, rng):
        from mlx_video_tpu.postprocess import reduce_grid_artifacts

        video = (rng.uniform(size=(2, 64, 64, 3)) * 255).astype(np.uint8)
        for method in ("bilateral", "gaussian", "frequency"):
            out = reduce_grid_artifacts(video, method=method, strength=0.5)
            assert out.shape == video.shape and out.dtype == np.uint8
        with pytest.raises(ValueError):
            reduce_grid_artifacts(video, method="nope")

    def test_frequency_notch_removes_grid(self, rng):
        from mlx_video_tpu.postprocess import remove_grid_frequency

        h = w = 64
        yy, xx = np.mgrid[0:h, 0:w]
        grid = (np.sin(2 * np.pi * xx / 8) * 40 + 128).astype(np.uint8)
        frame = np.stack([grid] * 3, axis=-1)
        out = remove_grid_frequency(frame, grid_size=8)
        # the pure 8-px periodic pattern is strongly attenuated
        assert np.std(out[8:-8, 8:-8, 0].astype(np.float32)) < 0.7 * np.std(
            frame[8:-8, 8:-8, 0].astype(np.float32)
        )

    def test_unsharp_sharpens_edge(self, rng):
        from mlx_video_tpu.postprocess import unsharp_mask

        frame = np.zeros((32, 32, 3), np.uint8)
        frame[:, 16:] = 200
        out = unsharp_mask(frame, amount=1.0)
        assert out.shape == frame.shape
        # overshoot at the edge indicates sharpening
        assert out[:, 17:20].max() >= 200

    def test_enhance_cli_parser(self):
        from mlx_video_tpu.cli.enhance import build_parser

        a = build_parser().parse_args(["-p", "a cat", "--mode", "i2v", "--json",
                                       "--max-new-tokens", "64"])
        assert a.mode == "i2v" and a.json and a.max_tokens == 64


class TestAudioPrecompute:
    """Audio latent precompute (reference: precompute.py:131-215, 366-389)."""

    def _write_av_clip(self, path):
        """ffmpeg: 1s test video with a 440 Hz sine audio track."""
        import subprocess

        cmd = [
            "ffmpeg", "-y",
            "-f", "lavfi", "-i", "testsrc=size=64x64:rate=8:duration=1",
            "-f", "lavfi", "-i", "sine=frequency=440:duration=1",
            "-c:v", "mpeg4", "-c:a", "aac", "-shortest", str(path),
        ]
        try:
            proc = subprocess.run(cmd, capture_output=True)
        except FileNotFoundError:
            return False
        return proc.returncode == 0 and path.exists()

    def test_extract_audio_pcm(self, tmp_path):
        import pytest

        from mlx_video_tpu.trainer.precompute import extract_audio_pcm

        clip = tmp_path / "clip.mp4"
        if not self._write_av_clip(clip):
            pytest.skip("ffmpeg cannot synthesize an AV clip here")
        out = extract_audio_pcm(clip, 16000)
        assert out is not None
        waveform, sr = out
        assert sr == 16000
        assert waveform.shape[0] == 2  # stereo
        assert 14000 < waveform.shape[1] <= 18000  # ~1 s
        assert np.max(np.abs(waveform)) > 0.1  # sine present

    def test_audio_payload_written(self, tmp_path, rng):
        """precompute_dataset writes the reference audio payload fields."""
        import cv2

        from mlx_video_tpu.io.safetensors import SafetensorsReader
        from mlx_video_tpu.trainer.precompute import precompute_dataset

        vid_dir = tmp_path / "vids"
        vid_dir.mkdir()
        path = vid_dir / "clip.mp4"
        w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 24, (64, 64))
        for _ in range(9):
            w.write((rng.uniform(size=(64, 64, 3)) * 255).astype(np.uint8))
        w.release()

        def fake_encode(t):
            b, c, f, h, w_ = t.shape
            return rng.normal(size=(b, 8, 1 + (f - 1) // 8, h // 32, w_ // 32)).astype(np.float32)

        def fake_audio(video_path):
            return {
                "latents": rng.normal(size=(8, 25, 16)).astype(np.float32),
                "num_time_steps": np.array([25], np.int32),
                "frequency_bins": np.array([16], np.int32),
                "duration": np.array([1.0], np.float32),
            }

        out_root = tmp_path / "data"
        n = precompute_dataset(
            [path], out_root, encode_fn=fake_encode, audio_encode_fn=fake_audio,
            prompts={"clip": "a test"},
        )
        assert n == 1
        files = list((out_root / "audio_latents").glob("*.safetensors"))
        assert len(files) == 1
        with SafetensorsReader(files[0]) as r:
            keys = set(r.keys())
        assert {"latents", "num_time_steps", "frequency_bins", "duration"} <= keys


class TestCompareLatents:
    """tools/compare_latents.py — the PSNR instrument for the latent-parity
    north star (BASELINE.md)."""

    def test_psnr_known_value(self):
        from mlx_video_tpu.tools.compare_latents import psnr

        a = np.zeros((4, 4), np.float64)
        b = np.full((4, 4), 0.1, np.float64)
        # data_range 1.0, mse 0.01 -> 20 dB
        assert abs(psnr(a, b, data_range=1.0) - 20.0) < 1e-9
        assert psnr(a, a) == float("inf")

    def test_per_frame_psnr_shape(self, rng):
        from mlx_video_tpu.tools.compare_latents import per_frame_psnr

        a = rng.normal(size=(1, 4, 3, 8, 8))
        out = per_frame_psnr(a, a + 0.01)
        assert out.shape == (3,) and np.all(np.isfinite(out))

    def test_cli_end_to_end(self, tmp_path, capsys, rng):
        from mlx_video_tpu.tools.compare_latents import main

        lat = rng.normal(size=(1, 4, 2, 4, 4)).astype(np.float32)
        save_safetensors(tmp_path / "a.safetensors", {"latents": lat})
        save_safetensors(tmp_path / "b.safetensors", {"latents": lat + 1e-3})
        main([str(tmp_path / "a.safetensors"), str(tmp_path / "b.safetensors"), "--per-frame"])
        out = capsys.readouterr().out
        assert "psnr=" in out and "per-frame psnr" in out


class TestQuantizeModels:
    """loading.quantize_models — the shared CLI quantized-execution setup
    (generate + serve). Regression for the serve-only path that called bare
    prepare_w4a8: a no-op on fresh bf16 trees, and 4-bit scales over 8-bit
    storage on pre-quantized repos."""

    def _bundle(self):
        import dataclasses

        import jax
        import jax.numpy as jnp

        from mlx_video_tpu.config import LTXModelType, tiny_test_config
        from mlx_video_tpu.models.ltx.model import init_ltx_params
        from mlx_video_tpu.models.ltx.video_vae.decoder import DecoderConfig
        from mlx_video_tpu.pipelines.generate import ModelBundle

        cfg = tiny_test_config(LTXModelType.VideoOnly)
        params = init_ltx_params(jax.random.key(0), cfg, dtype=jnp.bfloat16)
        return ModelBundle(
            transformer_params=params,
            transformer_config=cfg,
            vae_decoder_params={},
            vae_decoder_config=DecoderConfig(),
        )

    @staticmethod
    def _has(node, leaf):
        return isinstance(node, dict) and (
            leaf in node or any(TestQuantizeModels._has(v, leaf) for v in node.values())
        )

    def test_w4a8_quantizes_fresh_bf16(self, tmp_path):
        from mlx_video_tpu.loading import quantize_models

        models = self._bundle()
        assert not self._has(models.transformer_params, "quant_weight")
        quantize_models(models, tmp_path, w4a8=True)
        assert self._has(models.transformer_params, "quant_weight"), (
            "w4a8 on a fresh bf16 snapshot must quantize, not silently no-op"
        )
        assert self._has(models.transformer_params, "int8_scale")

    def test_w4a8_respects_stored_bits(self, tmp_path):
        import json

        import numpy as np

        from mlx_video_tpu.loading import quantize_models
        from mlx_video_tpu.ops.quant import quantize_dit_params

        # two identical 8-bit pre-quantized trees; one goes through the
        # shared helper with quantization.json declaring 8 bits, the other
        # through the correct direct call. Scales must agree (the buggy
        # serve path assumed 4 -> ~16x smaller scales).
        from mlx_video_tpu.ops.quant import prepare_w4a8

        m = self._bundle()
        m.transformer_params = quantize_dit_params(m.transformer_params, bits=8)
        (tmp_path / "quantization.json").write_text(json.dumps({"bits": 8}))
        quantize_models(m, tmp_path / "model.safetensors", w4a8=True)

        ref = self._bundle()
        ref.transformer_params = prepare_w4a8(
            quantize_dit_params(ref.transformer_params, bits=8), bits=8
        )

        def first_scale(node):
            if isinstance(node, dict):
                if "int8_scale" in node:
                    return np.asarray(node["int8_scale"], np.float32)
                for v in node.values():
                    r = first_scale(v)
                    if r is not None:
                        return r
            return None

        a, b = first_scale(m.transformer_params), first_scale(ref.transformer_params)
        np.testing.assert_allclose(a, b, rtol=1e-6)

    def test_w8a8_w4a8_exclusive(self, tmp_path):
        import pytest as _pytest

        from mlx_video_tpu.loading import quantize_models

        with _pytest.raises(ValueError, match="exclusive"):
            quantize_models(self._bundle(), tmp_path, w8a8=True, w4a8=True)
