"""Weights IO tests: safetensors round trip, PT-key sanitization, strict load."""

from pathlib import Path

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np
import pytest

from mlx_video_tpu.config import LTXModelType, tiny_test_config
from mlx_video_tpu.io.safetensors import (
    SafetensorsReader,
    read_metadata,
    save_safetensors,
    scan_keys,
)
from mlx_video_tpu.io.weights import (
    dit_tree_path,
    flatten_params,
    load_dit_params,
    load_native_params,
    sanitize_pt_key,
    save_dit_params,
)
from mlx_video_tpu.models.ltx.model import init_ltx_params


class TestSafetensors:
    def test_round_trip(self, tmp_path, rng):
        tensors = {
            "a": rng.normal(size=(3, 4)).astype(np.float32),
            "b.c": rng.normal(size=(2,)).astype(np.float32).astype(ml_dtypes.bfloat16),
            "d": np.arange(6, dtype=np.int32).reshape(2, 3),
        }
        p = tmp_path / "test.safetensors"
        save_safetensors(p, tensors, metadata={"config": "{}"})
        with SafetensorsReader(p) as r:
            assert set(r.keys()) == set(tensors)
            for k, v in tensors.items():
                got = r.get(k)
                assert got.dtype == v.dtype
                np.testing.assert_array_equal(got, v)
        assert read_metadata(p) == {"config": "{}"}
        assert scan_keys([p]) == set(tensors)

    def test_header_alignment(self, tmp_path):
        # odd-length key forces header padding
        save_safetensors(tmp_path / "x.safetensors", {"odd_key_name_x": np.zeros(3, np.float32)})
        with SafetensorsReader(tmp_path / "x.safetensors") as r:
            np.testing.assert_array_equal(r.get("odd_key_name_x"), np.zeros(3))


class TestKeySanitize:
    def test_pt_mapping(self):
        cases = {
            "model.diffusion_model.transformer_blocks.0.attn1.to_out.0.weight":
                "transformer_blocks.0.attn1.to_out.weight",
            "model.diffusion_model.transformer_blocks.3.ff.net.0.proj.bias":
                "transformer_blocks.3.ff.proj_in.bias",
            "model.diffusion_model.transformer_blocks.3.ff.net.2.weight":
                "transformer_blocks.3.ff.proj_out.weight",
            "model.diffusion_model.transformer_blocks.1.audio_ff.net.0.proj.weight":
                "transformer_blocks.1.audio_ff.proj_in.weight",
            "model.diffusion_model.adaln_single.emb.timestep_embedder.linear_1.weight":
                "adaln_single.emb.timestep_embedder.linear1.weight",
        }
        for raw, expected in cases.items():
            assert sanitize_pt_key(raw) == expected

    def test_non_dit_keys_dropped(self):
        assert sanitize_pt_key("vae.decoder.conv_in.weight") is None
        assert sanitize_pt_key("model.diffusion_model.audio_embeddings_connector.x") is None

    def test_tree_paths(self):
        assert dit_tree_path("transformer_blocks.5.attn1.to_q.weight") == (
            5, ("blocks", "attn1", "to_q", "weight"),
        )
        assert dit_tree_path("patchify_proj.weight") == (None, ("video", "patchify_proj", "weight"))
        assert dit_tree_path("audio_patchify_proj.bias") == (
            None, ("audio", "patchify_proj", "bias"),
        )
        assert dit_tree_path("av_ca_a2v_gate_adaln_single.linear.weight") == (
            None, ("av", "av_ca_a2v_gate_adaln", "linear", "weight"),
        )
        assert dit_tree_path("scale_shift_table") == (None, ("video", "scale_shift_table"))


def _to_pt_checkpoint(params, config):
    """Inverse mapping: our pytree -> PyTorch-layout checkpoint dict."""
    inv_av = {
        "av_ca_video_scale_shift_adaln": "av_ca_video_scale_shift_adaln_single",
        "av_ca_audio_scale_shift_adaln": "av_ca_audio_scale_shift_adaln_single",
        "av_ca_a2v_gate_adaln": "av_ca_a2v_gate_adaln_single",
        "av_ca_v2a_gate_adaln": "av_ca_v2a_gate_adaln_single",
    }
    out = {}
    for flat_key, leaf in flatten_params(params).items():
        parts = flat_key.split(".")
        arr = np.asarray(leaf)
        if parts[0] == "blocks":
            rest = parts[1:]
            for layer in range(arr.shape[0]):
                out[_pt_key(["transformer_blocks", str(layer)] + rest)] = _maybe_t(arr[layer], rest)
        elif parts[0] == "video":
            out[_pt_key(parts[1:])] = _maybe_t(arr, parts[1:])
        elif parts[0] == "audio":
            out[_pt_key(["audio_" + parts[1]] + parts[2:])] = _maybe_t(arr, parts[1:])
        elif parts[0] == "av":
            out[_pt_key([inv_av[parts[1]]] + parts[2:])] = _maybe_t(arr, parts[1:])
    return out


def _maybe_t(arr, path_parts):
    if arr.ndim == 2 and path_parts[-1] == "weight" and path_parts[-2] not in ("q_norm", "k_norm"):
        return arr.T.copy()
    return arr


def _pt_key(parts):
    k = "model.diffusion_model." + ".".join(parts)
    k = k.replace(".to_out.", ".to_out.0.")
    k = k.replace(".ff.proj_in.", ".ff.net.0.proj.")
    k = k.replace(".ff.proj_out.", ".ff.net.2.")
    k = k.replace(".linear1.", ".linear_1.")
    k = k.replace(".linear2.", ".linear_2.")
    return k


class TestDitLoad:
    @pytest.mark.parametrize("model_type", [LTXModelType.VideoOnly, LTXModelType.AudioVideo])
    def test_pt_checkpoint_round_trip(self, tmp_path, model_type):
        cfg = tiny_test_config(model_type)
        ref = init_ltx_params(jax.random.key(7), cfg, dtype=jnp.float32)
        ckpt = _to_pt_checkpoint(ref, cfg)
        path = tmp_path / "model.safetensors"
        save_safetensors(path, ckpt)

        loaded = load_dit_params(path, cfg, dtype=jnp.float32)
        flat_ref = flatten_params(ref)
        flat_loaded = flatten_params(loaded)
        assert set(flat_ref) == set(flat_loaded)
        for k in flat_ref:
            np.testing.assert_allclose(
                np.asarray(flat_loaded[k]), np.asarray(flat_ref[k]), atol=0, err_msg=k
            )

    def test_bf16_cast(self, tmp_path):
        cfg = tiny_test_config(LTXModelType.VideoOnly)
        ref = init_ltx_params(jax.random.key(7), cfg, dtype=jnp.float32)
        path = tmp_path / "model.safetensors"
        save_safetensors(path, _to_pt_checkpoint(ref, cfg))
        loaded = load_dit_params(path, cfg, dtype=jnp.bfloat16)
        assert all(v.dtype == jnp.bfloat16 for v in jax.tree.leaves(loaded))

    def test_strict_missing_raises(self, tmp_path):
        cfg = tiny_test_config(LTXModelType.VideoOnly)
        ref = init_ltx_params(jax.random.key(7), cfg, dtype=jnp.float32)
        ckpt = _to_pt_checkpoint(ref, cfg)
        ckpt.pop("model.diffusion_model.patchify_proj.weight")
        path = tmp_path / "model.safetensors"
        save_safetensors(path, ckpt)
        with pytest.raises(ValueError, match="Missing 1 parameters"):
            load_dit_params(path, cfg, dtype=jnp.float32)
        # non-strict succeeds
        load_dit_params(path, cfg, dtype=jnp.float32, strict=False)

    def test_missing_layer_raises(self, tmp_path):
        cfg = tiny_test_config(LTXModelType.VideoOnly)
        ref = init_ltx_params(jax.random.key(7), cfg, dtype=jnp.float32)
        ckpt = _to_pt_checkpoint(ref, cfg)
        ckpt = {k: v for k, v in ckpt.items() if ".transformer_blocks.1.attn1.to_q." not in k}
        path = tmp_path / "model.safetensors"
        save_safetensors(path, ckpt)
        with pytest.raises(ValueError, match="layers"):
            load_dit_params(path, cfg, dtype=jnp.float32)

    def test_shape_mismatch_raises(self, tmp_path):
        cfg = tiny_test_config(LTXModelType.VideoOnly)
        ref = init_ltx_params(jax.random.key(7), cfg, dtype=jnp.float32)
        ckpt = _to_pt_checkpoint(ref, cfg)
        ckpt["model.diffusion_model.scale_shift_table"] = np.zeros((3, 4), np.float32)
        path = tmp_path / "model.safetensors"
        save_safetensors(path, ckpt)
        with pytest.raises(ValueError, match="Shape mismatch"):
            load_dit_params(path, cfg, dtype=jnp.float32)

    @pytest.mark.parametrize("bits", [4, 6])
    def test_mlx_quantized_checkpoint_loads(self, tmp_path, bits):
        """A pre-quantized MLX-layout checkpoint (nn.quantize output:
        uint32 bit-packed .weight + sibling .scales/.biases, MLX (out, in)
        orientation) loads directly — including the sub-32-bit byte-stream
        widths (reference: mlx_video/models/ltx/ltx.py:715-721)."""
        from mlx_video_tpu.ops.quant import quantize_dit_params

        cfg = tiny_test_config(LTXModelType.VideoOnly)
        ref = init_ltx_params(jax.random.key(7), cfg, dtype=jnp.float32)
        qref = quantize_dit_params(ref, group_size=32, bits=bits, scope="core")
        assert "quant_weight" in qref["blocks"]["attn1"]["to_q"]

        # Export in the MLX checkpoint layout: sanitized keys, blocks
        # unstacked per layer, quant_weight stored as plain `weight`.
        ckpt = {}
        for flat_key, leaf in flatten_params(qref).items():
            parts = flat_key.split(".")
            arr = np.asarray(leaf)
            quant_leaf = parts[-1] in ("quant_weight", "scales", "biases")
            if parts[-1] == "quant_weight":
                parts = parts[:-1] + ["weight"]
            if parts[0] == "blocks":
                rest = parts[1:]
                for layer in range(arr.shape[0]):
                    a = arr[layer]
                    key = "transformer_blocks." + str(layer) + "." + ".".join(rest)
                    ckpt[key] = a if quant_leaf else _maybe_t(a, rest)
            elif parts[0] == "video":
                ckpt[".".join(parts[1:])] = _maybe_t(arr, parts[1:])
        path = tmp_path / "model.safetensors"
        save_safetensors(path, ckpt)

        loaded = load_dit_params(path, cfg, dtype=jnp.float32)
        flat_ref, flat_loaded = flatten_params(qref), flatten_params(loaded)
        assert set(flat_ref) == set(flat_loaded)
        for k in flat_ref:
            np.testing.assert_array_equal(
                np.asarray(flat_loaded[k]), np.asarray(flat_ref[k]), err_msg=k
            )

    def test_native_save_load_round_trip(self, tmp_path):
        cfg = tiny_test_config(LTXModelType.VideoOnly)
        ref = init_ltx_params(jax.random.key(7), cfg, dtype=jnp.float32)
        path = tmp_path / "native.safetensors"
        save_dit_params(path, ref)
        loaded = load_native_params(path)
        flat_ref, flat_loaded = flatten_params(ref), flatten_params(loaded)
        assert set(flat_ref) == set(flat_loaded)
        for k in flat_ref:
            np.testing.assert_array_equal(np.asarray(flat_loaded[k]), np.asarray(flat_ref[k]))


class TestGemmaWeights:
    """load_gemma_weights: dense and quantized (MLX-format) repos."""

    def _tiny(self):
        from mlx_video_tpu.models.gemma3 import Gemma3TextConfig

        return Gemma3TextConfig(
            vocab_size=64, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=2, num_key_value_heads=1, head_dim=16,
            intermediate_size=64, sliding_window=4, sliding_window_pattern=2,
            query_pre_attn_scalar=16.0,
        )

    def _export_hf(self, params, quantize=False, group_size=32, bits=8):
        """Our pytree -> HF/MLX key layout ((out, in) linears)."""
        import jax

        from mlx_video_tpu.ops.quant import quantize_affine

        lin = {"q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj"}
        out = {}

        def emit(key, arr, is_linear):
            arr = np.asarray(arr, np.float32)
            if is_linear:
                arr = arr.T  # ours (in, out) -> theirs (out, in)
            if quantize and (is_linear or key.endswith("embed_tokens.weight")):
                pw, sc, bi = quantize_affine(jnp.asarray(arr), group_size, bits)
                out[key] = np.asarray(pw)
                out[key[: -len("weight")] + "scales"] = np.asarray(sc)
                out[key[: -len("weight")] + "biases"] = np.asarray(bi)
            else:
                out[key] = arr

        emit("model.embed_tokens.weight", params["embed_tokens"]["weight"], False)
        out["model.norm.weight"] = np.asarray(params["norm"]["weight"], np.float32)
        flat = jax.tree_util.tree_flatten_with_path(params["layers"])[0]
        for path, leaf in flat:
            parts = [p.key for p in path]
            L = leaf.shape[0]
            for i in range(L):
                key = f"model.layers.{i}." + ".".join(parts)
                emit(key, leaf[i], parts[-1] == "weight" and parts[-2] in lin)
        return out

    def test_dense_round_trip(self, tmp_path):
        from mlx_video_tpu.io.text_encoder_weights import load_gemma_weights
        from mlx_video_tpu.models.gemma3 import gemma3_hidden_states, init_gemma3_params

        cfg = self._tiny()
        ref = init_gemma3_params(jax.random.key(0), cfg, dtype=jnp.float32)
        save_safetensors(tmp_path / "model.safetensors", self._export_hf(ref))
        loaded = load_gemma_weights(tmp_path, cfg, dtype=jnp.float32)
        tokens = jnp.array([[3, 9, 27, 41]])
        mask = jnp.ones((1, 4), dtype=bool)
        ref_h = gemma3_hidden_states(ref, cfg, tokens, mask)[-1]
        got_h = gemma3_hidden_states(loaded, cfg, tokens, mask)[-1]
        np.testing.assert_allclose(np.asarray(got_h), np.asarray(ref_h), atol=1e-5, rtol=1e-5)

    def test_quantized_round_trip(self, tmp_path):
        from mlx_video_tpu.io.text_encoder_weights import load_gemma_weights
        from mlx_video_tpu.models.gemma3 import gemma3_hidden_states, init_gemma3_params

        cfg = self._tiny()
        ref = init_gemma3_params(jax.random.key(0), cfg, dtype=jnp.float32)
        save_safetensors(
            tmp_path / "model.safetensors", self._export_hf(ref, quantize=True)
        )
        loaded = load_gemma_weights(tmp_path, cfg, dtype=jnp.float32)
        q = loaded["layers"]["self_attn"]["q_proj"]
        assert "quant_weight" in q and "scales" in q and "biases" in q
        assert q["quant_weight"].dtype == jnp.uint32
        tokens = jnp.array([[3, 9, 27, 41]])
        mask = jnp.ones((1, 4), dtype=bool)
        ref_h = gemma3_hidden_states(ref, cfg, tokens, mask)[-1]
        got_h = gemma3_hidden_states(loaded, cfg, tokens, mask)[-1]
        # 8-bit group-32 quantization error only
        err = np.max(np.abs(np.asarray(got_h) - np.asarray(ref_h)))
        scale = np.max(np.abs(np.asarray(ref_h)))
        assert err < 0.05 * scale, (err, scale)


class TestModelLoader:
    """mlx_video_tpu.trainer.model_loader per-component API."""

    def test_load_transformer_tiny(self, tmp_path):
        from mlx_video_tpu.io.weights import save_dit_params  # native format
        from mlx_video_tpu.trainer.model_loader import load_transformer

        cfg = tiny_test_config(LTXModelType.VideoOnly)
        ref = init_ltx_params(jax.random.key(7), cfg, dtype=jnp.float32)
        ckpt = _to_pt_checkpoint(ref, cfg)
        path = tmp_path / "model.safetensors"
        save_safetensors(path, ckpt)
        params, out_cfg = load_transformer(path, cfg, dtype=jnp.float32)
        assert out_cfg is cfg
        flat_a, flat_b = flatten_params(ref), flatten_params(params)
        assert set(flat_a) == set(flat_b)
        for k in flat_a:
            np.testing.assert_allclose(
                np.asarray(flat_b[k], np.float32), np.asarray(flat_a[k], np.float32), atol=1e-6
            )

    def test_default_19b_config(self):
        from mlx_video_tpu.trainer.model_loader import default_19b_config

        cfg = default_19b_config()
        assert cfg.num_layers == 48 and cfg.inner_dim == 4096
        assert cfg.double_precision_rope

    def test_components_aggregate_alias(self):
        from mlx_video_tpu.trainer.model_loader import MLXModelComponents, ModelComponents

        assert MLXModelComponents is ModelComponents
        c = ModelComponents()
        assert c.transformer_params is None and c.vocoder is None
