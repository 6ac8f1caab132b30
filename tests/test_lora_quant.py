"""LoRA and quantization tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_video_tpu.config import LTXModelType, tiny_test_config
from mlx_video_tpu.io.safetensors import save_safetensors
from mlx_video_tpu.lora import (
    LoRAConfig,
    LoraSpec,
    attach_runtime_lora,
    inject_lora,
    lora_mask,
    merge_lora_into_params,
    save_lora,
)
from mlx_video_tpu.models.ltx.model import Modality, init_ltx_params, ltx_apply
from mlx_video_tpu.ops.linear import linear
from mlx_video_tpu.ops.quant import (
    dequantize_affine,
    dequantize_linear_params,
    quantize_affine,
    quantize_dit_params,
    quantize_linear_params,
)
from mlx_video_tpu.pipelines.positions import create_position_grid


class TestQuantization:
    def test_round_trip_error_bounded(self, rng):
        w = jnp.asarray(rng.normal(size=(32, 128)).astype(np.float32))
        for bits in (8, 6, 5, 4, 3, 2):
            packed, scales, biases = quantize_affine(w, group_size=32, bits=bits)
            assert packed.shape == (32, 128 * bits // 32)
            deq = dequantize_affine(packed, scales, biases, bits=bits, dtype=jnp.float32)
            # max error per element is bounded by half a quantization step
            step = np.asarray(scales).max()
            err = np.max(np.abs(np.asarray(deq) - np.asarray(w)))
            assert err <= step * 0.51, f"bits={bits}: err {err} > step {step}"

    def test_round_trip_derives_bits_from_in_dim(self, rng):
        """Execution path derives bits from shapes alone (linear() has no
        side-channel): exact for every supported width."""
        w = jnp.asarray(rng.normal(size=(8, 64)).astype(np.float32))
        for bits in (2, 3, 4, 5, 6, 8):
            packed, scales, biases = quantize_affine(w, group_size=32, bits=bits)
            a = dequantize_affine(packed, scales, biases, bits=bits, dtype=jnp.float32)
            b = dequantize_affine(packed, scales, biases, in_dim=64, dtype=jnp.float32)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_packing_layout_lsb_first(self):
        """Value at in-index i lives at bits [bits*(i%els), ...) of word i//els."""
        w = jnp.asarray(np.arange(8, dtype=np.float32)[None])  # (1, 8), exact 4-bit range
        packed, scales, biases = quantize_affine(w, group_size=8, bits=4)
        assert packed.shape == (1, 1)
        word = int(np.asarray(packed)[0, 0])
        scale, bias = float(np.asarray(scales)[0, 0]), float(np.asarray(biases)[0, 0])
        for i in range(8):
            q = (word >> (4 * i)) & 0xF
            np.testing.assert_allclose(q * scale + bias, float(i), atol=0.5)

    def test_sub32_bitstream_layout_hand_fixture(self):
        """3-bit values pack as a contiguous LSB-first little-endian
        bitstream (the MLX kernel layout: 8 values -> 3 bytes, e.g.
        value2 = ((byte0 & 0xc0) >> 6) | ((byte1 & 0x1) << 2)).

        Hand-built fixture: w = repeating 0..7 makes scale exactly 1,
        bias 0, so q == w and every packed word is computable by hand."""
        q_expected = np.tile(np.arange(8, dtype=np.uint64), 4)  # (32,) values 0..7
        w = jnp.asarray(q_expected.astype(np.float32)[None])  # (1, 32)
        packed, scales, biases = quantize_affine(w, group_size=32, bits=3)
        assert packed.shape == (1, 3)  # 32 * 3 bits = 96 = 3 words
        np.testing.assert_allclose(np.asarray(scales), 1.0, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(biases), 0.0, atol=1e-7)
        # independent bitstream: value i occupies bits [3i, 3i+3)
        stream = 0
        for i, q in enumerate(q_expected):
            stream |= int(q) << (3 * i)
        expected_words = [(stream >> (32 * k)) & 0xFFFFFFFF for k in range(3)]
        np.testing.assert_array_equal(np.asarray(packed)[0], expected_words)
        # byte-level spot check against the reference kernel's unpack rules
        b = [(stream >> (8 * k)) & 0xFF for k in range(12)]
        assert q_expected[0] == (b[0] & 0x7)
        assert q_expected[1] == (b[0] & 0x38) >> 3
        assert q_expected[2] == ((b[0] & 0xC0) >> 6) | ((b[1] & 0x1) << 2)
        assert q_expected[5] == ((b[1] & 0x80) >> 7) | ((b[2] & 0x3) << 1)

    @pytest.mark.parametrize("bits", [3, 5, 6])
    def test_sub32_pack_unpack_exact(self, rng, bits):
        """Round trip of the raw packed integers is exact (no affine)."""
        from mlx_video_tpu.ops.quant import _pack_bitstream, _unpack_bitstream

        in_dim = 96 if bits == 3 else 64 if bits == 5 else 48  # bits*in % 32 == 0
        q = jnp.asarray(
            rng.integers(0, 1 << bits, size=(4, in_dim)).astype(np.uint32)
        )
        packed = _pack_bitstream(q, bits)
        assert packed.shape == (4, in_dim * bits // 32)
        back = _unpack_bitstream(packed, bits, in_dim)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(q))

    @pytest.mark.parametrize("bits", [3, 5, 6])
    def test_sub32_quantized_linear_close_to_dense(self, rng, bits):
        params = {
            "weight": jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32) * 0.05),
        }
        x = jnp.asarray(rng.normal(size=(4, 64)).astype(np.float32))
        dense = linear(params, x)
        qparams = quantize_linear_params(params, group_size=32, bits=bits)
        quant = linear(qparams, x)
        tol = {3: 0.25, 5: 0.08, 6: 0.04}[bits]
        np.testing.assert_allclose(np.asarray(quant), np.asarray(dense), atol=tol)
        back = dequantize_linear_params(qparams, bits=bits, dtype=jnp.float32)
        wtol = {3: 6e-2, 5: 2e-2, 6: 8e-3}[bits]
        np.testing.assert_allclose(
            np.asarray(back["weight"]), np.asarray(params["weight"]), atol=wtol
        )

    def test_unsupported_bits_rejected(self, rng):
        w = jnp.asarray(rng.normal(size=(8, 64)).astype(np.float32))
        with pytest.raises(ValueError, match="bits"):
            quantize_affine(w, group_size=32, bits=7)

    def test_quantized_linear_close_to_dense(self, rng):
        params = {
            "weight": jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32) * 0.05),
            "bias": jnp.asarray(rng.normal(size=(32,)).astype(np.float32)),
        }
        x = jnp.asarray(rng.normal(size=(4, 64)).astype(np.float32))
        dense = linear(params, x)
        qparams = quantize_linear_params(params, group_size=32, bits=8)
        assert "weight" not in qparams
        quant = linear(qparams, x)
        np.testing.assert_allclose(np.asarray(quant), np.asarray(dense), atol=0.02)
        # round-trip back to dense layout
        back = dequantize_linear_params(qparams, bits=8, dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(back["weight"]), np.asarray(params["weight"]), atol=2e-3)

    def test_stacked_quantization(self, rng):
        params = {"weight": jnp.asarray(rng.normal(size=(3, 64, 32)).astype(np.float32) * 0.05)}
        q = quantize_linear_params(params, group_size=32, bits=8)
        assert q["quant_weight"].shape[0] == 3
        back = dequantize_linear_params(q, bits=8, dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(back["weight"]), np.asarray(params["weight"]), atol=2e-3)

    def test_quantize_dit_forward_close(self, rng):
        cfg = tiny_test_config(LTXModelType.VideoOnly)
        params = init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32)
        qparams = quantize_dit_params(params, group_size=32, bits=8, scope="core")
        # block attn/ff linears quantized; norms untouched
        assert "quant_weight" in qparams["blocks"]["attn1"]["to_q"]
        assert "weight" in qparams["blocks"]["attn1"]["q_norm"]
        assert "weight" in qparams["video"]["patchify_proj"]

        video = _video_inputs(cfg)
        ref, _ = ltx_apply(params, cfg, video=video)
        out, _ = ltx_apply(qparams, cfg, video=video)
        # 8-bit quantization of a random-init model: outputs close
        assert np.max(np.abs(np.asarray(out) - np.asarray(ref))) < 0.1


def _video_inputs(cfg, seed=0):
    rng = np.random.default_rng(seed)
    s = 2 * 3 * 4
    return Modality(
        latent=jnp.asarray(rng.normal(size=(1, s, cfg.in_channels)).astype(np.float32)),
        timesteps=jnp.full((1, s), 0.5),
        context=jnp.asarray(rng.normal(size=(1, 8, cfg.caption_channels)).astype(np.float32)),
        positions=jnp.asarray(create_position_grid(1, 2, 3, 4)),
    )


class TestLoRA:
    def test_inject_zero_B_is_identity(self):
        cfg = tiny_test_config(LTXModelType.VideoOnly)
        params = init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32)
        lparams = inject_lora(params, cfg, LoRAConfig(rank=4), jax.random.key(1))
        assert "lora_A" in lparams["blocks"]["attn1"]["to_q"]
        video = _video_inputs(cfg)
        ref, _ = ltx_apply(params, cfg, video=video)
        out, _ = ltx_apply(lparams, cfg, video=video)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    def test_inject_shares_leaves_and_does_not_mutate_input(self):
        """inject_lora must rebuild containers but SHARE the base leaves:
        a deepcopy here device-copied the whole base (transient 2x, 7+ GiB
        at 19B q4 — OOM'd the single-chip LoRA finetune drive), and the
        caller's tree must not grow lora keys in place."""
        cfg = tiny_test_config(LTXModelType.VideoOnly)
        params = init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32)
        lparams = inject_lora(params, cfg, LoRAConfig(rank=4), jax.random.key(1))
        # base leaves are the same buffers, not copies
        assert lparams["blocks"]["attn1"]["to_q"]["weight"] is params["blocks"]["attn1"]["to_q"]["weight"]
        assert lparams["video"]["patchify_proj"]["weight"] is params["video"]["patchify_proj"]["weight"]
        # the input tree is untouched (no in-place key inserts)
        assert "lora_A" not in params["blocks"]["attn1"]["to_q"]
        assert "lora_A" in lparams["blocks"]["attn1"]["to_q"]

    def test_nonzero_B_changes_output(self):
        cfg = tiny_test_config(LTXModelType.VideoOnly)
        params = init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32)
        lparams = inject_lora(params, cfg, LoRAConfig(rank=4), jax.random.key(1))
        lparams["blocks"]["attn1"]["to_q"]["lora_B"] = (
            jnp.ones_like(lparams["blocks"]["attn1"]["to_q"]["lora_B"]) * 0.1
        )
        video = _video_inputs(cfg)
        ref, _ = ltx_apply(params, cfg, video=video)
        out, _ = ltx_apply(lparams, cfg, video=video)
        assert np.max(np.abs(np.asarray(out) - np.asarray(ref))) > 1e-4

    def test_lora_mask_marks_only_lora(self):
        cfg = tiny_test_config(LTXModelType.VideoOnly)
        params = init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32)
        lparams = inject_lora(params, cfg, LoRAConfig(rank=4), jax.random.key(1))
        mask = lora_mask(lparams)
        assert mask["blocks"]["attn1"]["to_q"]["lora_A"] is True
        assert mask["blocks"]["attn1"]["to_q"]["weight"] is False
        assert mask["video"]["patchify_proj"]["weight"] is False

    def test_targets_respected(self):
        cfg = tiny_test_config(LTXModelType.VideoOnly)
        params = init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32)
        lparams = inject_lora(
            params, cfg, LoRAConfig(rank=4, target_modules=("to_q",)), jax.random.key(1)
        )
        assert "lora_A" in lparams["blocks"]["attn1"]["to_q"]
        assert "lora_A" not in lparams["blocks"]["attn1"]["to_k"]
        assert "lora_A" not in lparams["blocks"]["ff"]["proj_in"]

    def test_export_merge_matches_runtime(self, tmp_path):
        """inject (random B) -> export -> offline merge == runtime adapters."""
        cfg = tiny_test_config(LTXModelType.VideoOnly)
        params = init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32)
        lcfg = LoRAConfig(rank=4, alpha=8.0)
        lparams = inject_lora(params, cfg, lcfg, jax.random.key(1))
        # randomize B so LoRA is active
        rng = np.random.default_rng(3)

        def rand_b(node):
            for k, v in node.items():
                if isinstance(v, dict):
                    rand_b(v)
                elif k == "lora_B":
                    node[k] = jnp.asarray(rng.normal(size=v.shape).astype(np.float32) * 0.05)

        rand_b(lparams)

        video = _video_inputs(cfg)
        runtime_out, _ = ltx_apply(lparams, cfg, video=video)

        lora_path = tmp_path / "adapter.safetensors"
        save_lora(lora_path, lparams, cfg)

        scale = lcfg.alpha / lcfg.rank
        merged = merge_lora_into_params(params, [LoraSpec(lora_path, strength=scale)])
        merged_out, _ = ltx_apply(merged, cfg, video=video)
        np.testing.assert_allclose(
            np.asarray(merged_out), np.asarray(runtime_out), atol=5e-4
        )

    def test_runtime_attach_matches_merge(self, tmp_path):
        cfg = tiny_test_config(LTXModelType.VideoOnly)
        params = init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32)
        rng = np.random.default_rng(5)
        # hand-build a reference-format LoRA file for attn1.to_q on layer 0
        in_dim = cfg.inner_dim
        state = {
            "diffusion_model.transformer_blocks.0.attn1.to_q.lora_A.weight":
                rng.normal(size=(4, in_dim)).astype(np.float32) * 0.1,
            "diffusion_model.transformer_blocks.0.attn1.to_q.lora_B.weight":
                rng.normal(size=(in_dim, 4)).astype(np.float32) * 0.1,
        }
        path = tmp_path / "lora.safetensors"
        save_safetensors(path, state)

        video = _video_inputs(cfg)
        merged = merge_lora_into_params(params, [LoraSpec(path, strength=0.7)])
        attached = attach_runtime_lora(params, [LoraSpec(path, strength=0.7)], cfg)
        m_out, _ = ltx_apply(merged, cfg, video=video)
        a_out, _ = ltx_apply(attached, cfg, video=video)
        np.testing.assert_allclose(np.asarray(a_out), np.asarray(m_out), atol=5e-4)
        # and it differs from base
        base_out, _ = ltx_apply(params, cfg, video=video)
        assert np.max(np.abs(np.asarray(m_out) - np.asarray(base_out))) > 1e-5

    def test_runtime_attach_two_adapters_same_target(self, tmp_path):
        """Regression: two adapters covering the same linear must BOTH take
        effect (rank-concat composition), not last-writer-wins."""
        cfg = tiny_test_config(LTXModelType.VideoOnly)
        params = init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32)
        rng = np.random.default_rng(7)
        in_dim = cfg.inner_dim
        paths = []
        for i in range(2):
            state = {
                "diffusion_model.transformer_blocks.0.attn1.to_q.lora_A.weight":
                    rng.normal(size=(4, in_dim)).astype(np.float32) * 0.1,
                "diffusion_model.transformer_blocks.0.attn1.to_q.lora_B.weight":
                    rng.normal(size=(in_dim, 4)).astype(np.float32) * 0.1,
            }
            p = tmp_path / f"lora{i}.safetensors"
            save_safetensors(p, state)
            paths.append(p)

        video = _video_inputs(cfg)
        specs = [LoraSpec(paths[0], strength=0.7), LoraSpec(paths[1], strength=0.3)]
        merged = merge_lora_into_params(params, specs)
        attached = attach_runtime_lora(params, specs, cfg)
        m_out, _ = ltx_apply(merged, cfg, video=video)
        a_out, _ = ltx_apply(attached, cfg, video=video)
        np.testing.assert_allclose(np.asarray(a_out), np.asarray(m_out), atol=5e-4)
        # and the composed output differs from either adapter alone
        solo, _ = ltx_apply(
            attach_runtime_lora(params, specs[1:], cfg), cfg, video=video
        )
        assert np.max(np.abs(np.asarray(a_out) - np.asarray(solo))) > 1e-5

    def test_lora_on_quantized_base(self, rng):
        """Runtime adapters compose with quantized weights."""
        params = {
            "weight": jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32) * 0.05),
        }
        q = quantize_linear_params(params, group_size=32, bits=8)
        q["lora_A"] = jnp.asarray(rng.normal(size=(2, 64)).astype(np.float32) * 0.1)
        q["lora_B"] = jnp.asarray(rng.normal(size=(32, 2)).astype(np.float32) * 0.1)
        x = jnp.asarray(rng.normal(size=(4, 64)).astype(np.float32))
        out = linear(q, x)
        base = linear(quantize_linear_params(params, group_size=32, bits=8), x)
        expected_delta = np.asarray(x) @ np.asarray(q["lora_A"]).T @ np.asarray(q["lora_B"]).T
        np.testing.assert_allclose(np.asarray(out - base), expected_delta, atol=1e-4)


class TestQuantMatmulKernel:
    """Pallas dequant-matmul (opt-in; ops/quant_matmul.py)."""

    @pytest.mark.parametrize("bits,group_size,k,n,m", [
        (4, 64, 256, 384, 100),
        (8, 32, 128, 128, 8),
        (4, 128, 512, 256, 300),
        (8, 64, 3840, 200, 17),
    ])
    def test_matches_dequant_path(self, rng, bits, group_size, k, n, m):
        from mlx_video_tpu.ops.quant import dequantize_affine, quantize_affine
        from mlx_video_tpu.ops.quant_matmul import quant_matmul

        w = jnp.asarray(rng.normal(size=(n, k)).astype(np.float32))
        packed, scales, biases = quantize_affine(w, group_size, bits)
        x = jnp.asarray(rng.normal(size=(2, m, k)).astype(np.float32))
        ref = x @ dequantize_affine(packed, scales, biases, dtype=jnp.float32, bits=bits).T
        out = quant_matmul(x, packed, scales, biases, bits, group_size, interpret=True)
        rel = float(jnp.max(jnp.abs(out - ref))) / float(jnp.max(jnp.abs(ref)))
        assert rel < 2e-2  # bf16 word-column scales vs fp32 dequant path

    def test_linear_routes_when_enabled(self, rng):
        import mlx_video_tpu.ops.quant_matmul as qm
        from mlx_video_tpu.ops.linear import linear, use_quant_kernel
        from mlx_video_tpu.ops.quant import quantize_linear_params

        params = {"weight": jnp.asarray(rng.normal(size=(256, 128)).astype(np.float32))}
        qparams = quantize_linear_params(params, group_size=64, bits=4)
        x = jnp.asarray(rng.normal(size=(1, 16, 256)).astype(np.float32))
        base = linear(qparams, x)  # XLA dequant path (default off)
        orig = qm.quant_matmul
        calls = []
        try:
            def spy(*a, **kw):
                calls.append(1)
                return orig(*a, **kw, interpret=True)

            qm.quant_matmul = spy
            use_quant_kernel(True)
            out = linear(qparams, x)
        finally:
            use_quant_kernel(False)
            qm.quant_matmul = orig
        assert calls, "quant kernel was not routed"
        rel = float(jnp.max(jnp.abs(out - base))) / float(jnp.max(jnp.abs(base)))
        assert rel < 2e-2


class TestW8A8:
    """W8A8 dynamic int8 matmul path (ops/int8.py) — the TPU-native
    execution-quantization complement to the MLX storage format."""

    def test_int8_linear_close_to_dense(self, rng):
        from mlx_video_tpu.ops.int8 import int8_linear, quantize_weight_int8

        x = jnp.asarray(rng.normal(size=(2, 64, 128)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(128, 256)).astype(np.float32)) * 0.05
        wq, ws = quantize_weight_int8(w)
        assert wq.dtype == jnp.int8 and ws.shape == (256,)
        y = int8_linear(x, wq, ws)
        ref = x @ w
        rel = float(jnp.linalg.norm(y - ref) / jnp.linalg.norm(ref))
        assert rel < 0.02

    def test_int8_linear_grad_is_dequant_matmul(self, rng):
        """STE backward: dL/dx through the int8 matmul must equal the exact
        dequantized-weight matmul (without it, round()/int casts zero the
        activation gradient and LoRA behind frozen int8 bases mistrains)."""
        from mlx_video_tpu.ops.int8 import int8_linear, quantize_weight_int8

        x = jnp.asarray(rng.normal(size=(4, 128)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(128, 64)).astype(np.float32)) * 0.05
        wq, ws = quantize_weight_int8(w)
        g = jax.grad(lambda xx: jnp.sum(jnp.sin(int8_linear(xx, wq, ws))))(x)
        wd = np.asarray(wq, np.float32) * np.asarray(ws, np.float32)[None, :]
        y = int8_linear(x, wq, ws)
        g_ref = np.asarray(jnp.cos(y)) @ wd.T
        np.testing.assert_allclose(np.asarray(g), g_ref, rtol=1e-4, atol=1e-5)

    def test_w4a8_linear_grad_flows(self, rng):
        """Same through the in-graph W4A8 requantization branch of linear()."""
        from mlx_video_tpu.ops.quant import prepare_w4a8, quantize_linear_params

        w = jnp.asarray(rng.normal(size=(128, 64)).astype(np.float32)) * 0.05
        qp = prepare_w4a8(quantize_linear_params({"weight": w}, group_size=32, bits=4))
        x = jnp.asarray(rng.normal(size=(4, 128)).astype(np.float32))
        from mlx_video_tpu.ops.linear import linear

        g = jax.grad(lambda xx: jnp.sum(linear(qp, xx)))(x)
        assert float(np.abs(np.asarray(g)).sum()) > 0, "zero gradient"
        # backward must be exactly the int8-requantized weight matmul
        from mlx_video_tpu.ops.quant import dequantize_affine

        wf = np.asarray(dequantize_affine(qp["quant_weight"], qp["scales"], qp["biases"],
                                          dtype=jnp.float32, in_dim=128))
        ws = np.asarray(qp["int8_scale"], np.float32)
        wq8 = np.clip(np.round(wf / ws[:, None]), -127, 127)
        g_ref = np.ones((4, 64), np.float32) @ (wq8 * ws[:, None])
        np.testing.assert_allclose(np.asarray(g), g_ref, rtol=1e-4, atol=1e-5)

    def test_stacked_layer_quantization(self, rng):
        """Scan-stacked (L, in, out) weights quantize per layer."""
        from mlx_video_tpu.ops.int8 import quantize_weight_int8

        w = jnp.asarray(rng.normal(size=(3, 32, 16)).astype(np.float32))
        w = w * jnp.asarray([1.0, 10.0, 0.1])[:, None, None]  # distinct ranges
        wq, ws = quantize_weight_int8(w)
        assert ws.shape == (3, 16)
        for layer in range(3):
            wq1, ws1 = quantize_weight_int8(w[layer])
            np.testing.assert_array_equal(np.asarray(wq[layer]), np.asarray(wq1))

    def test_linear_routes_int8(self, rng):
        from mlx_video_tpu.ops.int8 import quantize_weight_int8
        from mlx_video_tpu.ops.linear import linear

        w = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32)) * 0.1
        b = jnp.asarray(rng.normal(size=(32,)).astype(np.float32))
        wq, ws = quantize_weight_int8(w)
        x = jnp.asarray(rng.normal(size=(1, 8, 64)).astype(np.float32))
        out = linear({"int8_weight": wq, "int8_scale": ws, "bias": b}, x)
        ref = linear({"weight": w, "bias": b}, x)
        rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
        assert rel < 0.03

    def test_model_velocity_close(self, rng):
        """Full tiny-DiT forward: W8A8 velocity tracks dense to ~1%."""
        import jax

        from mlx_video_tpu.config import LTXModelType, LTXRopeType, tiny_test_config
        from mlx_video_tpu.models.ltx.model import Modality, init_ltx_params, ltx_apply
        from mlx_video_tpu.ops.int8 import quantize_params_w8a8
        from mlx_video_tpu.pipelines.positions import create_position_grid

        cfg = tiny_test_config(
            LTXModelType.VideoOnly, rope_type=LTXRopeType.SPLIT, num_layers=4
        )
        params = init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32)
        qparams = quantize_params_w8a8(params)

        leaves = {
            ".".join(str(k.key) for k in p)
            for p, _ in jax.tree_util.tree_flatten_with_path(qparams)[0]
        }
        assert any("int8_weight" in k for k in leaves)
        # patchify/adaLN/output projections stay dense
        assert not any(
            k.startswith("video.") and "int8" in k for k in leaves
        ), sorted(k for k in leaves if k.startswith("video.") and "int8" in k)

        b, f, h, w = 1, 2, 4, 4
        lat = jnp.asarray(rng.normal(size=(b, cfg.in_channels, f * h * w)).astype(np.float32))
        tokens = jnp.transpose(lat, (0, 2, 1))
        pos = jnp.asarray(create_position_grid(b, f, h, w))
        ctx = jnp.asarray(rng.normal(size=(b, 8, cfg.caption_channels)).astype(np.float32))
        ts = jnp.full(tokens.shape[:2], 0.7, dtype=jnp.float32)
        mod = Modality(latent=tokens, timesteps=ts, context=ctx, positions=pos)
        v_ref, _ = ltx_apply(params, cfg, video=mod)
        v_q, _ = ltx_apply(qparams, cfg, video=mod)
        rel = float(jnp.linalg.norm(v_q - v_ref) / jnp.linalg.norm(v_ref))
        assert rel < 0.02, rel

    def test_text_encoder_w8a8(self, rng):
        """Gemma layer stack + feature aggregation quantize; embeddings,
        norms, connectors stay dense; encode still runs."""
        import jax

        from mlx_video_tpu.models.gemma3 import Gemma3TextConfig
        from mlx_video_tpu.models.ltx.text_encoder import (
            encode_tokens,
            init_text_encoder_params,
        )
        from mlx_video_tpu.ops.int8 import quantize_text_encoder_w8a8

        cfg = Gemma3TextConfig(
            vocab_size=64, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=8, sliding_window=4, sliding_window_pattern=2,
        )
        params = init_text_encoder_params(
            jax.random.key(0), cfg, hidden_dim=32, dtype=jnp.float32
        )
        qparams = quantize_text_encoder_w8a8(params)
        lm = qparams["language_model"]["layers"]
        assert "int8_weight" in lm["self_attn"]["q_proj"]
        assert "int8_weight" in lm["mlp"]["down_proj"]
        assert "weight" in qparams["language_model"]["embed_tokens"]
        assert "int8_weight" in qparams["feature_extractor"]["aggregate_embed"]
        connector_block = qparams["video_embeddings_connector"]["transformer_1d_blocks"]["0"]
        assert "weight" in connector_block["attn1"]["to_q"]  # connectors stay dense

        ids = jnp.asarray(rng.integers(0, 64, size=(1, 6)), jnp.int32)
        mask = jnp.ones((1, 6), bool)
        v_ref, a_ref = encode_tokens(params, cfg, ids, mask, True)
        v_q, a_q = encode_tokens(qparams, cfg, ids, mask, True)
        assert v_q.shape == v_ref.shape and np.isfinite(np.asarray(v_q)).all()

    def test_convert_w8a8_roundtrip(self, tmp_path, rng):
        """convert --w8a8 exports a native int8 checkpoint that
        load_dit_params reads back (format metadata dispatch)."""
        import jax

        from mlx_video_tpu.config import LTXModelType, tiny_test_config
        from mlx_video_tpu.convert import convert_transformer
        from mlx_video_tpu.io.weights import load_dit_params, save_dit_params
        from mlx_video_tpu.models.ltx.model import init_ltx_params

        cfg = tiny_test_config(LTXModelType.VideoOnly)
        params = init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32)
        src = tmp_path / "in.safetensors"
        save_dit_params(src, params)

        out = tmp_path / "out.safetensors"
        convert_transformer([src], out, config=cfg, dtype=jnp.float32, w8a8=True)
        assert (tmp_path / "quantization.json").exists()

        loaded = load_dit_params([out], cfg, strict=False)
        assert loaded["blocks"]["attn1"]["to_q"]["int8_weight"].dtype == jnp.int8
        np.testing.assert_allclose(
            np.asarray(loaded["blocks"]["attn1"]["to_q"]["int8_scale"]),
            np.asarray(
                jnp.max(jnp.abs(params["blocks"]["attn1"]["to_q"]["weight"]), axis=-2) / 127.0
            ),
            rtol=1e-6,
        )


class TestW4A8:
    """W4A8: q4 storage -> in-graph int8 requantization -> int8 MXU matmul
    (ops/quant.py prepare_w4a8 + ops/linear.py dispatch). The full int8
    model never materializes — only one layer's int8 block per matmul."""

    def test_prepare_adds_scales_everywhere(self, rng):
        from mlx_video_tpu.config import LTXModelType, tiny_test_config
        from mlx_video_tpu.models.ltx.model import init_ltx_params
        from mlx_video_tpu.ops.quant import prepare_w4a8, quantize_dit_params

        cfg = tiny_test_config(LTXModelType.VideoOnly, num_layers=2)
        params = init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32)
        q4 = quantize_dit_params(params, group_size=64, bits=4)
        w4a8 = prepare_w4a8(q4, bits=4)

        def count(node, key):
            n = int(key in node)
            return n + sum(count(v, key) for v in node.values() if isinstance(v, dict))

        assert count(w4a8, "int8_scale") == count(q4, "quant_weight") > 0

    def test_scale_covers_affine_range_exactly(self, rng):
        """The per-channel absmax from group endpoints must equal the absmax
        of the actually dequantized weights (no unpacking shortcut error)."""
        from mlx_video_tpu.ops.quant import dequantize_affine, prepare_w4a8, quantize_affine

        w = jnp.asarray(rng.normal(size=(32, 128)).astype(np.float32)) * 0.1
        packed, scales, biases = quantize_affine(w, group_size=64, bits=4)
        node = prepare_w4a8(
            {"quant_weight": packed, "scales": scales, "biases": biases}, bits=4
        )
        wq = dequantize_affine(packed, scales, biases, bits=4, dtype=jnp.float32)
        absmax = np.max(np.abs(np.asarray(wq)), axis=1)
        np.testing.assert_allclose(
            np.asarray(node["int8_scale"]), np.maximum(absmax / 127.0, 1e-12), rtol=1e-5
        )

    def test_linear_w4a8_close_to_q4(self, rng):
        from mlx_video_tpu.ops.linear import linear
        from mlx_video_tpu.ops.quant import prepare_w4a8, quantize_affine

        w = jnp.asarray(rng.normal(size=(128, 256)).astype(np.float32)) * 0.05
        packed, scales, biases = quantize_affine(jnp.asarray(w).T, group_size=64, bits=4)
        q4 = {"quant_weight": packed, "scales": scales, "biases": biases}
        w4a8 = prepare_w4a8(dict(q4), bits=4)
        x = jnp.asarray(rng.normal(size=(2, 16, 128)).astype(np.float32))
        y_q4 = linear(q4, x)
        y_w4a8 = linear(w4a8, x)
        rel = float(jnp.linalg.norm(y_w4a8 - y_q4) / jnp.linalg.norm(y_q4))
        assert rel < 0.02, rel

    def test_full_model_w4a8_close_to_q4(self, rng):
        from mlx_video_tpu.config import LTXModelType, LTXRopeType, tiny_test_config
        from mlx_video_tpu.models.ltx.model import Modality, init_ltx_params, ltx_apply
        from mlx_video_tpu.ops.quant import prepare_w4a8, quantize_dit_params
        from mlx_video_tpu.pipelines.positions import create_position_grid

        cfg = tiny_test_config(LTXModelType.VideoOnly, rope_type=LTXRopeType.SPLIT, num_layers=4)
        params = init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32)
        q4 = quantize_dit_params(params, group_size=64, bits=4)
        w4a8 = prepare_w4a8(q4, bits=4)

        tokens = jnp.asarray(rng.normal(size=(1, 32, cfg.in_channels)).astype(np.float32))
        ts = jnp.full((1, 32), 0.7, dtype=jnp.float32)
        pos = jnp.asarray(create_position_grid(1, 2, 4, 4))
        ctx = jnp.asarray(rng.normal(size=(1, 8, cfg.caption_channels)).astype(np.float32))

        def run(p):
            v, _ = ltx_apply(
                p, cfg, video=Modality(latent=tokens, timesteps=ts, context=ctx, positions=pos)
            )
            return np.asarray(v, np.float64)

        a, b = run(w4a8), run(q4)
        cos = float((a.ravel() @ b.ravel()) / (np.linalg.norm(a) * np.linalg.norm(b)))
        rel = float(np.linalg.norm(a - b) / np.linalg.norm(b))
        assert cos > 0.9999 and rel < 0.01, (cos, rel)


class TestDerivedTreeOwnership:
    """Round-4 regression (VERDICT r4 weak #1): donated steps on a tree
    derived from a held base (quantize -> w4a8 -> inject_lora) deleted the
    base's aliased leaves, crashing the next read of the base with
    "Array has been deleted". The quant constructors now OWN every leaf."""

    def _base_and_batch(self):
        from mlx_video_tpu.pipelines.positions import create_position_grid
        from mlx_video_tpu.trainer.train_step import TrainBatch

        cfg = tiny_test_config(LTXModelType.VideoOnly, num_layers=2)
        params = init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32)
        b, f, h, w = 2, 2, 4, 4
        batch = TrainBatch(
            latents=jax.random.normal(jax.random.key(1), (b, cfg.in_channels, f, h, w)),
            positions=jnp.asarray(create_position_grid(b, f, h, w)),
            context=jax.random.normal(jax.random.key(2), (b, 8, cfg.caption_channels)),
        )
        return cfg, params, batch

    def test_quant_trees_share_nothing_with_base(self):
        from mlx_video_tpu.ops.int8 import quantize_params_w8a8
        from mlx_video_tpu.utils.trees import shared_leaf_count

        cfg, params, _ = self._base_and_batch()
        assert shared_leaf_count(quantize_dit_params(params, group_size=16, bits=4), params) == 0
        assert shared_leaf_count(quantize_params_w8a8(params), params) == 0

    def test_donated_step_on_derived_tree_leaves_base_alive(self):
        from mlx_video_tpu.lora import LoRAConfig, inject_lora, lora_mask
        from mlx_video_tpu.ops.quant import prepare_w4a8
        from mlx_video_tpu.trainer.train_step import make_optimizer, train_step

        cfg, params, batch = self._base_and_batch()
        lq = inject_lora(
            prepare_w4a8(quantize_dit_params(params, group_size=16, bits=4)),
            cfg, LoRAConfig(rank=2), jax.random.key(8),
        )
        opt = make_optimizer(learning_rate=1e-4, trainable_mask=lora_mask(lq))
        state = opt.init(lq)
        lq2, state, loss = train_step(lq, state, cfg, opt, batch, jax.random.key(9))
        jax.block_until_ready(lq2)
        assert np.isfinite(float(loss))
        # every leaf of the held base must still be readable
        for leaf in jax.tree.leaves(params):
            np.asarray(leaf)

    def test_own_derived_leaves_breaks_aliasing(self):
        from mlx_video_tpu.lora import LoRAConfig, inject_lora
        from mlx_video_tpu.utils.trees import own_derived_leaves, shared_leaf_count

        cfg, params, _ = self._base_and_batch()
        injected = inject_lora(params, cfg, LoRAConfig(rank=2), jax.random.key(0))
        assert shared_leaf_count(injected, params) > 0  # documented sharing
        owned = own_derived_leaves(injected, params)
        assert shared_leaf_count(owned, params) == 0
        for a, b in zip(jax.tree.leaves(owned), jax.tree.leaves(injected)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_shard_params_force_copy(self):
        from mlx_video_tpu.parallel.mesh import create_mesh, factor_devices
        from mlx_video_tpu.parallel.sharding import shard_params
        from mlx_video_tpu.utils.trees import shared_leaf_count

        cfg, params, _ = self._base_and_batch()
        mesh = create_mesh(factor_devices(len(jax.devices())))
        with mesh:
            sharded = shard_params(params, mesh)
            # second placement is a no-op -> aliases
            assert shared_leaf_count(shard_params(sharded, mesh), sharded) > 0
            copied = shard_params(sharded, mesh, force_copy=True)
            assert shared_leaf_count(copied, sharded) == 0


class TestLoraSlots:
    """slot_rank serving mode: zero-effect slots on the base; file factors
    replace slots zero-padded, keeping the adapted tree's avals equal to the
    slotted base's (one compiled scan program for base + every adapter)."""

    def _base(self):
        cfg = tiny_test_config(LTXModelType.VideoOnly, num_layers=2)
        params = init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32)
        return cfg, quantize_dit_params(params, group_size=16, bits=4)

    def _adapter_file(self, tmp_path, cfg, rank=2):
        rng = np.random.default_rng(0)
        d = cfg.inner_dim
        path = str(tmp_path / "a.safetensors")
        save_safetensors(path, {
            "diffusion_model.transformer_blocks.0.attn1.to_q.lora_A.weight":
                rng.normal(size=(rank, d)).astype(np.float32) * 0.1,
            "diffusion_model.transformer_blocks.0.attn1.to_q.lora_B.weight":
                rng.normal(size=(d, rank)).astype(np.float32) * 0.1,
        })
        return path

    def _run(self, params, cfg, seed=5):
        from mlx_video_tpu.pipelines.positions import create_position_grid

        tokens = jax.random.normal(jax.random.key(seed), (1, 32, cfg.in_channels))
        ts = jnp.full((1, 32), 0.7)
        pos = jnp.asarray(create_position_grid(1, 2, 4, 4))
        ctx = jax.random.normal(jax.random.key(seed + 1), (1, 8, cfg.caption_channels))
        v, _ = ltx_apply(
            params, cfg, video=Modality(latent=tokens, timesteps=ts, context=ctx, positions=pos)
        )
        return np.asarray(v, np.float64)

    def test_slots_are_zero_effect(self):
        from mlx_video_tpu.lora import LoRAConfig, inject_lora

        cfg, base = self._base()
        slotted = inject_lora(base, cfg, LoRAConfig(rank=4), jax.random.key(1))
        np.testing.assert_allclose(self._run(base, cfg), self._run(slotted, cfg), atol=1e-6)

    def test_slot_attach_matches_recompile_attach_and_keeps_avals(self, tmp_path):
        from mlx_video_tpu.lora import LoRAConfig, LoraSpec, attach_runtime_lora, inject_lora

        cfg, base = self._base()
        slotted = inject_lora(base, cfg, LoRAConfig(rank=4), jax.random.key(1))
        spec = LoraSpec(self._adapter_file(tmp_path, cfg, rank=2), 1.0)
        via_slots = attach_runtime_lora(slotted, [spec], cfg, slot_rank=4)
        legacy = attach_runtime_lora(base, [spec], cfg)
        np.testing.assert_allclose(
            self._run(via_slots, cfg), self._run(legacy, cfg), rtol=1e-5, atol=1e-5
        )
        # aval equality with the slotted base -> one compiled program
        a = {jax.tree_util.keystr(p): (l.shape, str(l.dtype))
             for p, l in jax.tree_util.tree_flatten_with_path(slotted)[0]}
        b = {jax.tree_util.keystr(p): (l.shape, str(l.dtype))
             for p, l in jax.tree_util.tree_flatten_with_path(via_slots)[0]}
        assert a == b

    def test_rank_overflow_raises(self, tmp_path):
        from mlx_video_tpu.lora import LoRAConfig, LoraSpec, attach_runtime_lora, inject_lora

        cfg, base = self._base()
        slotted = inject_lora(base, cfg, LoRAConfig(rank=2), jax.random.key(1))
        spec = LoraSpec(self._adapter_file(tmp_path, cfg, rank=4), 1.0)
        with pytest.raises(ValueError, match="exceeds the slot rank"):
            attach_runtime_lora(slotted, [spec], cfg, slot_rank=2)
