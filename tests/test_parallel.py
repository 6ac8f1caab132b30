"""Mesh/sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from mlx_video_tpu.config import LTXModelConfig, LTXModelType, LTXRopeType
from mlx_video_tpu.models.ltx.model import Modality, init_ltx_params, ltx_apply
from mlx_video_tpu.parallel.mesh import create_mesh, factor_devices
from mlx_video_tpu.parallel.sharding import param_specs, shard_batch, shard_params
from mlx_video_tpu.pipelines.positions import create_position_grid


def tp_config():
    return LTXModelConfig(
        model_type=LTXModelType.VideoOnly,
        num_attention_heads=8,
        attention_head_dim=16,
        in_channels=16,
        out_channels=16,
        num_layers=2,
        cross_attention_dim=128,
        caption_channels=32,
        rope_type=LTXRopeType.SPLIT,
    )


class TestMesh:
    def test_factor_devices(self):
        assert factor_devices(1) == (1, 1, 1)
        assert factor_devices(8) == (1, 1, 8)
        assert factor_devices(16) == (1, 2, 8)
        assert factor_devices(32) == (1, 4, 8)
        d, f, t = factor_devices(12)
        assert d * f * t == 12

    def test_create_mesh(self):
        mesh = create_mesh((2, 2, 2))
        assert mesh.axis_names == ("data", "fsdp", "tensor")
        assert mesh.devices.shape == (2, 2, 2)

    def test_bad_shape_raises(self):
        with pytest.raises(ValueError):
            create_mesh((3, 3, 3))


class TestShardingRules:
    def test_specs_structure(self):
        cfg = tp_config()
        params = init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32)
        specs = param_specs(params)
        # column parallel qkv, stacked layer axis unsharded
        assert specs["blocks"]["attn1"]["to_q"]["weight"] == P(None, "fsdp", "tensor")
        assert specs["blocks"]["attn1"]["to_out"]["weight"] == P(None, "tensor", "fsdp")
        assert specs["blocks"]["ff"]["proj_in"]["weight"] == P(None, "fsdp", "tensor")
        assert specs["blocks"]["ff"]["proj_out"]["weight"] == P(None, "tensor", "fsdp")
        assert specs["blocks"]["scale_shift_table"] == P(None, None, "fsdp")
        assert specs["video"]["patchify_proj"]["weight"] == P(None, "tensor")
        assert specs["video"]["proj_out"]["weight"] == P("tensor", None)

    def test_sharded_forward_matches_single_device(self):
        """TP/FSDP-sharded forward must be numerically equal (up to fp
        reassociation) to the unsharded forward."""
        cfg = tp_config()
        params = init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32)
        rng = np.random.default_rng(0)
        b, f, h, w = 2, 2, 2, 2
        latents = jnp.asarray(
            rng.normal(size=(b, f * h * w, cfg.in_channels)).astype(np.float32)
        )
        positions = jnp.asarray(create_position_grid(b, f, h, w))
        context = jnp.asarray(rng.normal(size=(b, 4, cfg.caption_channels)).astype(np.float32))
        ts = jnp.full((b, f * h * w), 0.7)

        ref, _ = ltx_apply(
            params, cfg, video=Modality(latent=latents, timesteps=ts, context=context, positions=positions)
        )

        mesh = create_mesh((2, 2, 2))
        with mesh:
            sp = shard_params(params, mesh)
            lat_s, pos_s, ctx_s, ts_s = shard_batch((latents, positions, context, ts), mesh)
            fn = jax.jit(
                lambda p, l, po, c, t: ltx_apply(
                    p, cfg, video=Modality(latent=l, timesteps=t, context=c, positions=po)
                )[0]
            )
            out = fn(sp, lat_s, pos_s, ctx_s, ts_s)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)

    def test_sequence_parallel_forward_matches_plain(self):
        """ltx_apply(sp=...) — ring self-attention with the token axis
        sequence-sharded — must equal the plain forward."""
        cfg = tp_config()
        params = init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32)
        rng = np.random.default_rng(0)
        b, f, h, w = 1, 2, 4, 4  # 32 tokens, divisible by the fsdp axis (2)
        latents = jnp.asarray(
            rng.normal(size=(b, f * h * w, cfg.in_channels)).astype(np.float32)
        )
        positions = jnp.asarray(create_position_grid(b, f, h, w))
        context = jnp.asarray(rng.normal(size=(b, 4, cfg.caption_channels)).astype(np.float32))
        ts = jnp.full((b, 1), 0.7)
        mod = Modality(latent=latents, timesteps=ts, context=context, positions=positions)

        ref, _ = ltx_apply(params, cfg, video=mod)
        mesh = create_mesh((1, 2, 4))
        out, _ = jax.jit(
            lambda p: ltx_apply(p, cfg, video=mod, sp=(mesh, "fsdp"))
        )(params)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)

    def test_sequence_parallel_denoise_matches_plain(self):
        """Full denoise loop with sequence_parallel equals the plain loop."""
        from mlx_video_tpu.pipelines import denoise as dn

        cfg = tp_config()
        params = init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32)
        rng = np.random.default_rng(1)
        b, f, h, w = 1, 2, 4, 4
        latents = jnp.asarray(
            rng.normal(size=(b, cfg.in_channels, f, h, w)).astype(np.float32)
        )
        positions = jnp.asarray(create_position_grid(b, f, h, w))
        context = jnp.asarray(rng.normal(size=(b, 4, cfg.caption_channels)).astype(np.float32))
        sigmas = [1.0, 0.5, 0.0]
        ref, _ = dn.denoise(params, cfg, latents, positions, context, sigmas)
        mesh = create_mesh((1, 2, 4))
        out, _ = dn.denoise(
            params, cfg, latents, positions, context, sigmas,
            sequence_parallel=(mesh, "fsdp"),
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-4)

    def test_sequence_parallel_indivisible_falls_back(self):
        """Token counts that don't divide the axis fall back to local
        attention (same numerics, no ring)."""
        cfg = tp_config()
        params = init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32)
        rng = np.random.default_rng(2)
        b, s = 1, 9  # not divisible by 2
        latents = jnp.asarray(rng.normal(size=(b, s, cfg.in_channels)).astype(np.float32))
        positions = jnp.asarray(
            np.stack([np.zeros((b, 3, s)), np.ones((b, 3, s))], axis=-1).astype(np.float32)
        )
        context = jnp.asarray(rng.normal(size=(b, 4, cfg.caption_channels)).astype(np.float32))
        ts = jnp.full((b, 1), 0.7)
        mod = Modality(latent=latents, timesteps=ts, context=context, positions=positions)
        ref, _ = ltx_apply(params, cfg, video=mod)
        mesh = create_mesh((1, 2, 4))
        out, _ = ltx_apply(params, cfg, video=mod, sp=(mesh, "fsdp"))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)

    def test_shard_batch_places_on_data_axis(self):
        mesh = create_mesh((2, 2, 2))
        x = jnp.zeros((4, 6, 8))
        (xs,) = shard_batch((x,), mesh)
        spec = xs.sharding.spec
        assert spec[0] == ("data",) or spec[0] == "data"


class TestRingAttention:
    def test_matches_single_device(self, rng):
        from mlx_video_tpu.parallel.ring_attention import ring_attention

        mesh = create_mesh((1, 4, 2))
        b, s, h, d = 2, 32, 4, 16
        q = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
        ref = jax.nn.dot_product_attention(q, k, v)
        with mesh:
            out = ring_attention(q, k, v, mesh, axis="fsdp")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)

    def test_eight_way_ring(self, rng):
        from mlx_video_tpu.parallel.ring_attention import ring_attention

        mesh = create_mesh((1, 8, 1))
        b, s, h, d = 1, 64, 2, 32
        q = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
        ref = jax.nn.dot_product_attention(q, k, v)
        with mesh:
            out = ring_attention(q, k, v, mesh, axis="fsdp")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)

    def test_indivisible_raises(self, rng):
        from mlx_video_tpu.parallel.ring_attention import ring_attention

        mesh = create_mesh((1, 8, 1))
        q = jnp.zeros((1, 30, 2, 16))
        with pytest.raises(ValueError, match="not divisible"):
            with mesh:
                ring_attention(q, q, q, mesh, axis="fsdp")

    def test_pallas_kernel_inside_ring_matches(self, rng):
        """Each ring step's local block through the flash kernel (out + lse
        -> online-softmax partials) must equal both the einsum ring and
        single-device attention — forward AND grad (SP training path)."""
        from mlx_video_tpu.parallel import ring_attention as ra

        mesh = create_mesh((1, 2, 4))
        b, s, h, d = 1, 512, 2, 128  # local Sq = 256 -> kernel-eligible
        q = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
        ref = jax.nn.dot_product_attention(q, k, v)

        def loss(q, k, v):
            return jnp.sum(ra.ring_attention(q, k, v, mesh, axis="fsdp") ** 2)

        with mesh:
            plain = ra.ring_attention(q, k, v, mesh, axis="fsdp")
            g_plain = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
            ra.use_ring_kernel(True, interpret=True)
            try:
                kern = ra.ring_attention(q, k, v, mesh, axis="fsdp")
                g_kern = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
            finally:
                ra.use_ring_kernel(None)
        np.testing.assert_allclose(np.asarray(plain), np.asarray(ref), atol=2e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(kern), np.asarray(ref), atol=5e-5, rtol=1e-4)
        for a, b_ in zip(g_kern, g_plain):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4, rtol=1e-4)

    def test_ring_kernel_eligibility_gate(self):
        from mlx_video_tpu.parallel import ring_attention as ra

        ra.use_ring_kernel(True)
        try:
            assert ra._ring_kernel_enabled(256, 128)
            assert not ra._ring_kernel_enabled(128, 128)  # too few local tokens
            assert not ra._ring_kernel_enabled(512, 64)  # lane-misaligned head
        finally:
            ra.use_ring_kernel(None)
        assert not ra._ring_kernel_enabled(512, 128)  # auto: CPU backend


class TestFull19BSharding:
    def test_19b_av_step_aot_compiles_sharded(self):
        """AOT-lower the FULL 19B AV forward sharded over the 8-device mesh.

        No weights materialize (abstract shapes only); this validates the
        real-geometry TP sharding end-to-end and reports per-device HBM.
        """
        from jax.sharding import NamedSharding

        from mlx_video_tpu.models.ltx.model import Modality, init_ltx_params, ltx_apply
        from mlx_video_tpu.parallel.sharding import data_spec
        from mlx_video_tpu.parallel import sharding as sh

        config = LTXModelConfig(model_type=LTXModelType.AudioVideo, rope_type=LTXRopeType.SPLIT)
        mesh = create_mesh((1, 1, 8))
        params_shapes = jax.eval_shape(
            lambda: init_ltx_params(jax.random.key(0), config, dtype=jnp.bfloat16)
        )
        n_params = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params_shapes))
        assert 18e9 < n_params < 20e9  # the real 19B geometry

        specs = sh.param_specs(params_shapes)
        param_shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), specs)
        b, s, at = 1, 5 * 16 * 16, 34
        video = Modality(
            latent=jax.ShapeDtypeStruct((b, s, 128), jnp.bfloat16),
            timesteps=jax.ShapeDtypeStruct((b, s), jnp.bfloat16),
            context=jax.ShapeDtypeStruct((b, 1024, 3840), jnp.bfloat16),
            positions=jax.ShapeDtypeStruct((b, 3, s, 2), jnp.float32),
        )
        audio = Modality(
            latent=jax.ShapeDtypeStruct((b, at, 128), jnp.bfloat16),
            timesteps=jax.ShapeDtypeStruct((b, at), jnp.bfloat16),
            context=jax.ShapeDtypeStruct((b, 1024, 3840), jnp.bfloat16),
            positions=jax.ShapeDtypeStruct((b, 1, at, 2), jnp.float32),
        )
        in_shardings = (
            param_shardings,
            jax.tree.map(lambda l: NamedSharding(mesh, data_spec(len(l.shape))), video),
            jax.tree.map(lambda l: NamedSharding(mesh, data_spec(len(l.shape))), audio),
        )
        with mesh:
            compiled = (
                jax.jit(
                    lambda p, v, a: ltx_apply(p, config, video=v, audio=a),
                    in_shardings=in_shardings,
                )
                .lower(params_shapes, video, audio)
                .compile()
            )
        mem = compiled.memory_analysis()
        if mem is not None:
            per_device = (mem.argument_size_in_bytes + mem.temp_size_in_bytes) / 2**30
            assert per_device < 32, f"per-device HBM {per_device:.1f} GiB too high"


class TestFull19BTrainSharding:
    def test_opt_state_specs_mirror_param_specs(self):
        """Adam moments get exactly the parameter's TP/FSDP spec; step
        counters replicate."""
        from mlx_video_tpu.parallel import sharding as sh
        from mlx_video_tpu.trainer.train_step import make_optimizer

        cfg = tp_config()
        params = jax.eval_shape(
            lambda: init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32)
        )
        opt = make_optimizer(1e-4)
        o_specs = sh.opt_state_specs(jax.eval_shape(opt.init, params))
        p_specs = sh.param_specs(params)
        flat = jax.tree_util.tree_flatten_with_path(o_specs)[0]
        mirrored = [s for path, s in flat if any(getattr(k, "key", None) == "to_q" for k in path)]
        assert p_specs["blocks"]["attn1"]["to_q"]["weight"] in mirrored
        scalars = [s for path, s in flat if str(path[-1]) == ".count" or "count" in str(path[-1])]
        assert all(s == P() for s in scalars)

    def test_19b_train_step_aot_fsdp8(self):
        """AOT-lower the FULL flagship-video-tower AdamW train step
        (13.0B params: the 19B AV geometry minus the audio branch, since the
        fused T2V train_step is video-only; fwd + bwd + optimizer, block
        remat) FSDP-sharded over the 8-device mesh — the multi-chip
        training memory plan, validated end-to-end without weights.

        Optimizer-moment shardings come from ``opt_state_specs`` (path-tail
        match onto the param TP/FSDP rules); the args assertion would catch
        replicated moments (~51 GiB/device when replicated vs ~9 sharded,
        measured).
        """
        import dataclasses

        from jax.sharding import NamedSharding

        from mlx_video_tpu.parallel import sharding as sh
        from mlx_video_tpu.trainer.train_step import TrainBatch, make_optimizer, train_step

        config = dataclasses.replace(
            LTXModelConfig(model_type=LTXModelType.VideoOnly, rope_type=LTXRopeType.SPLIT),
            gradient_checkpointing=True,
        )
        mesh = create_mesh((1, 8, 1))
        params_shapes = jax.eval_shape(
            lambda: init_ltx_params(jax.random.key(0), config, dtype=jnp.bfloat16)
        )
        specs = sh.param_specs(params_shapes)
        p_structs = jax.tree.map(
            lambda l, spec: jax.ShapeDtypeStruct(l.shape, l.dtype, sharding=NamedSharding(mesh, spec)),
            params_shapes, specs,
        )
        opt = make_optimizer(1e-5)
        opt_shapes = jax.eval_shape(opt.init, params_shapes)
        o_specs = sh.opt_state_specs(opt_shapes)
        o_structs = jax.tree.map(
            lambda l, spec: jax.ShapeDtypeStruct(l.shape, l.dtype, sharding=NamedSharding(mesh, spec)),
            opt_shapes, o_specs,
        )

        b, f, h, w = 1, 5, 16, 16
        dspec = lambda nd: NamedSharding(mesh, sh.data_spec(nd))
        batch = TrainBatch(
            latents=jax.ShapeDtypeStruct((b, 128, f, h, w), jnp.bfloat16, sharding=dspec(5)),
            context=jax.ShapeDtypeStruct((b, 1024, 3840), jnp.bfloat16, sharding=dspec(3)),
            positions=jax.ShapeDtypeStruct((b, 3, f * h * w, 2), jnp.float32, sharding=dspec(4)),
        )
        key_shape = jax.eval_shape(lambda: jax.random.key(0))
        key = jax.ShapeDtypeStruct(
            key_shape.shape, key_shape.dtype, sharding=NamedSharding(mesh, P())
        )
        with mesh:
            compiled = (
                train_step.lower(p_structs, o_structs, config, opt, batch, key).compile()
            )
        mem = compiled.memory_analysis()
        if mem is not None:
            args_g = mem.argument_size_in_bytes / 2**30
            temps_g = mem.temp_size_in_bytes / 2**30
            # params bf16 38G/8 + Adam mu+nu bf16 2x38G/8 + batch ~= 14.3 GiB
            assert args_g < 13, f"opt state looks replicated: args {args_g:.1f} GiB/device"
            assert args_g + temps_g < 32, f"per-device HBM {args_g + temps_g:.1f} GiB too high"


class TestW8A8Sharding:
    """W8A8 int8 leaves must shard like their dense counterparts
    (int8_weight ~ weight, int8_scale ~ bias) and compute identically
    under the mesh."""

    def test_int8_specs(self):
        from mlx_video_tpu.ops.int8 import quantize_params_w8a8

        cfg = tp_config()
        params = quantize_params_w8a8(
            init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32)
        )
        specs = param_specs(params)
        assert specs["blocks"]["attn1"]["to_q"]["int8_weight"] == P(None, "fsdp", "tensor")
        assert specs["blocks"]["attn1"]["to_q"]["int8_scale"] == P(None, "tensor")
        assert specs["blocks"]["ff"]["proj_out"]["int8_weight"] == P(None, "tensor", "fsdp")

    def test_sharded_w8a8_forward_matches_single_device(self):
        from mlx_video_tpu.ops.int8 import quantize_params_w8a8

        cfg = tp_config()
        params = quantize_params_w8a8(
            init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32)
        )
        rng = np.random.default_rng(0)
        b, f, h, w = 2, 2, 2, 2
        latents = jnp.asarray(
            rng.normal(size=(b, f * h * w, cfg.in_channels)).astype(np.float32)
        )
        positions = jnp.asarray(create_position_grid(b, f, h, w))
        context = jnp.asarray(rng.normal(size=(b, 4, cfg.caption_channels)).astype(np.float32))
        ts = jnp.full((b, f * h * w), 0.7)

        ref, _ = ltx_apply(
            params, cfg, video=Modality(latent=latents, timesteps=ts, context=context, positions=positions)
        )

        mesh = create_mesh((2, 2, 2))
        with mesh:
            sp = shard_params(params, mesh)
            lat_s, pos_s, ctx_s, ts_s = shard_batch((latents, positions, context, ts), mesh)
            fn = jax.jit(
                lambda p, l, po, c, t: ltx_apply(
                    p, cfg, video=Modality(latent=l, timesteps=t, context=c, positions=po)
                )[0]
            )
            out = fn(sp, lat_s, pos_s, ctx_s, ts_s)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


class TestQuantSharding:
    """Affine-quantized (MLX layout) leaves shard as the dense spec with the
    matrix axes swapped: quant_weight is (out, in*bits/32) and scales/biases
    are (out, in/group) vs dense (in, out) — so `--w4a8 --mesh` gets real
    TP/FSDP instead of silent replication."""

    def test_quant_specs_are_transposed_dense(self):
        from mlx_video_tpu.ops.quant import quantize_dit_params

        cfg = tp_config()
        params = quantize_dit_params(
            init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32), group_size=32
        )
        specs = param_specs(params)
        # dense to_q weight is (fsdp, tensor) over (in, out) -> quant (out, in')
        assert specs["blocks"]["attn1"]["to_q"]["quant_weight"] == P(None, "tensor", "fsdp")
        assert specs["blocks"]["attn1"]["to_q"]["scales"] == P(None, "tensor", "fsdp")
        assert specs["blocks"]["attn1"]["to_q"]["biases"] == P(None, "tensor", "fsdp")
        # dense proj_out weight is (tensor, fsdp) -> quant (fsdp, tensor)
        assert specs["blocks"]["ff"]["proj_out"]["quant_weight"] == P(None, "fsdp", "tensor")

    @pytest.mark.parametrize("w4a8", [False, True])
    def test_sharded_quant_forward_matches_single_device(self, w4a8):
        from mlx_video_tpu.ops.quant import prepare_w4a8, quantize_dit_params

        cfg = tp_config()
        params = quantize_dit_params(
            init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32), group_size=32
        )
        if w4a8:
            params = prepare_w4a8(params, bits=4)
        rng = np.random.default_rng(0)
        b, f, h, w = 2, 2, 2, 2
        latents = jnp.asarray(
            rng.normal(size=(b, f * h * w, cfg.in_channels)).astype(np.float32)
        )
        positions = jnp.asarray(create_position_grid(b, f, h, w))
        context = jnp.asarray(rng.normal(size=(b, 4, cfg.caption_channels)).astype(np.float32))
        ts = jnp.full((b, f * h * w), 0.7)

        ref, _ = ltx_apply(
            params, cfg,
            video=Modality(latent=latents, timesteps=ts, context=context, positions=positions),
        )

        mesh = create_mesh((2, 2, 2))
        with mesh:
            sp = shard_params(params, mesh)
            lat_s, pos_s, ctx_s, ts_s = shard_batch((latents, positions, context, ts), mesh)
            fn = jax.jit(
                lambda p, l, po, c, t: ltx_apply(
                    p, cfg, video=Modality(latent=l, timesteps=t, context=c, positions=po)
                )[0]
            )
            out = fn(sp, lat_s, pos_s, ctx_s, ts_s)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


class TestGemmaSharding:
    """Gemma-3 text-encoder params shard with megatron TP/FSDP rules so the
    12B LM can live on the mesh next to the sharded 19B DiT (SURVEY §7
    memory choreography), in bf16 and W8A8."""

    @staticmethod
    def _tiny_gemma():
        from mlx_video_tpu.models.gemma3 import Gemma3TextConfig, init_gemma3_params

        cfg = Gemma3TextConfig(
            vocab_size=256, hidden_size=64, num_hidden_layers=4,
            num_attention_heads=4, num_key_value_heads=2, head_dim=16,
            intermediate_size=128, sliding_window=8, sliding_window_pattern=2,
            query_pre_attn_scalar=16.0,
        )
        params = init_gemma3_params(jax.random.key(0), cfg, dtype=jnp.float32)
        # zero-init norms make the forward degenerate; give them real values
        params = jax.tree_util.tree_map_with_path(
            lambda path, x: x + 0.5 if "layernorm" in _pstr(path) or _pstr(path).endswith("norm/weight") else x,
            params,
        )
        return cfg, params

    def test_gemma_specs(self):
        cfg, params = self._tiny_gemma()
        specs = param_specs(params)
        assert specs["layers"]["self_attn"]["q_proj"]["weight"] == P(None, "fsdp", "tensor")
        assert specs["layers"]["self_attn"]["o_proj"]["weight"] == P(None, "tensor", "fsdp")
        assert specs["layers"]["mlp"]["gate_proj"]["weight"] == P(None, "fsdp", "tensor")
        assert specs["layers"]["mlp"]["down_proj"]["weight"] == P(None, "tensor", "fsdp")
        assert specs["embed_tokens"]["weight"] == P("fsdp", None)

    @pytest.mark.parametrize("w8a8", [False, True])
    def test_sharded_hidden_states_match_single_device(self, w8a8):
        from mlx_video_tpu.models.gemma3 import gemma3_hidden_states

        cfg, params = self._tiny_gemma()
        if w8a8:
            from mlx_video_tpu.ops.int8 import quantize_params_w8a8

            params = quantize_params_w8a8({"language_model": params})["language_model"]
        rng = np.random.default_rng(0)
        ids = jnp.asarray(rng.integers(1, 256, (2, 16)), jnp.int32)
        mask = jnp.ones((2, 16), jnp.int32)

        ref = gemma3_hidden_states(params, cfg, ids, mask)
        ref_last = np.asarray(ref[-1])

        mesh = create_mesh((2, 2, 2))
        with mesh:
            sp = shard_params(params, mesh)
            ids_s, mask_s = shard_batch((ids, mask), mesh)
            out = jax.jit(
                lambda p, i, m: gemma3_hidden_states(p, cfg, i, m)[-1]
            )(sp, ids_s, mask_s)
        np.testing.assert_allclose(np.asarray(out), ref_last, atol=2e-3)


def _pstr(path):
    return "/".join(str(getattr(k, "key", k)) for k in path)


class TestFullTextEncoderSharding:
    def test_sharded_encode_tokens_matches_single_device(self):
        """The whole text-encoder tree (Gemma + aggregation + connectors)
        shard_params cleanly and encode_tokens reproduces single-device
        embeddings under the mesh (the CLI's --mesh text-encode path)."""
        from mlx_video_tpu.models.gemma3 import Gemma3TextConfig
        from mlx_video_tpu.models.ltx.text_encoder import (
            encode_tokens,
            init_text_encoder_params,
        )

        cfg = Gemma3TextConfig(
            vocab_size=256, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, head_dim=16,
            intermediate_size=128, sliding_window=8, sliding_window_pattern=2,
            query_pre_attn_scalar=16.0,
        )
        params = init_text_encoder_params(
            jax.random.key(0), cfg, hidden_dim=64, dtype=jnp.float32
        )
        rng = np.random.default_rng(0)
        ids = jnp.asarray(rng.integers(1, 256, (1, 16)), jnp.int32)
        mask = jnp.ones((1, 16), jnp.int32)
        # connectors keep their real 30x128 head geometry (init_connector
        # defaults) regardless of the tiny gemma hidden size
        ref_v, ref_a = encode_tokens(params, cfg, ids, mask)

        mesh = create_mesh((2, 2, 2))
        with mesh:
            sp = shard_params(params, mesh)
            out_v, out_a = jax.jit(
                lambda p, i, m: encode_tokens(p, cfg, i, m)
            )(sp, ids, mask)
        np.testing.assert_allclose(np.asarray(out_v), np.asarray(ref_v), atol=2e-3)
        np.testing.assert_allclose(np.asarray(out_a), np.asarray(ref_a), atol=2e-3)


class TestMeshResidentAux:
    """Mesh-resident upsampler/VAE-decoder: replicated conv params x
    H-sharded activations must match the single-device stages exactly
    (GSPMD inserts the conv halo exchanges)."""

    @staticmethod
    def _tiny_decoder():
        from mlx_video_tpu.models.ltx.video_vae.decoder import (
            DecoderConfig,
            init_video_decoder,
        )

        cfg = DecoderConfig(
            in_channels=16, base_channels=32, num_layers_per_block=1,
            num_upsamples=2, patch_size=4,
        )
        params = init_video_decoder(jax.random.key(0), cfg, dtype=jnp.float32)
        return cfg, params

    def test_decode_latents_sharded_matches_single_device(self):
        from mlx_video_tpu.config import LTXModelType, tiny_test_config
        from mlx_video_tpu.parallel.sharding import replicate_params
        from mlx_video_tpu.pipelines.generate import ModelBundle, decode_latents

        dec_cfg, dec_params = self._tiny_decoder()
        models = ModelBundle(
            transformer_params={},
            transformer_config=tiny_test_config(LTXModelType.VideoOnly),
            vae_decoder_params=dec_params,
            vae_decoder_config=dec_cfg,
        )
        rng = np.random.default_rng(0)
        lat = jnp.asarray(rng.normal(size=(1, 16, 2, 8, 8)).astype(np.float32))
        ref = decode_latents(models, lat, None, decode_timestep=0.05,
                             noise_key=jax.random.key(1))

        mesh = create_mesh((2, 2, 2))
        with mesh:
            models.vae_decoder_params = replicate_params(dec_params, mesh)
            rep_leaf = jax.tree.leaves(models.vae_decoder_params)[0]
            assert len(rep_leaf.sharding.device_set) == 8
            out = decode_latents(models, lat, None, decode_timestep=0.05,
                                 noise_key=jax.random.key(1), mesh=mesh)
        np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)

    def test_upsample_sharded_matches_single_device(self):
        from mlx_video_tpu.models.ltx.upsampler import (
            init_latent_upsampler,
            upsample_latents,
        )
        from mlx_video_tpu.parallel.sharding import replicate_params, shard_spatial

        params = init_latent_upsampler(
            jax.random.key(0), in_channels=16, mid_channels=32, num_blocks=1,
            dtype=jnp.float32,
        )
        rng = np.random.default_rng(1)
        lat = jnp.asarray(rng.normal(size=(1, 16, 2, 8, 8)).astype(np.float32))
        mean = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))
        std = jnp.asarray(rng.uniform(0.5, 2.0, size=(16,)).astype(np.float32))
        ref = upsample_latents(params, lat, mean, std)

        mesh = create_mesh((2, 2, 2))
        with mesh:
            p_rep = replicate_params(params, mesh)
            lat_s = shard_spatial(lat, mesh, h_axis=3)
            assert not lat_s.sharding.is_fully_replicated
            assert len(lat_s.sharding.device_set) == 8
            out = upsample_latents(p_rep, lat_s, *replicate_params((mean, std), mesh))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)

    def test_low_memory_mesh_rejected(self):
        from mlx_video_tpu.config import LTXModelType, tiny_test_config
        from mlx_video_tpu.pipelines.generate import (
            ModelBundle,
            TextConditioning,
            generate_video,
        )

        cfg = tiny_test_config(LTXModelType.VideoOnly)
        dec_cfg, dec_params = self._tiny_decoder()
        models = ModelBundle(
            transformer_params={}, transformer_config=cfg,
            vae_decoder_params=dec_params, vae_decoder_config=dec_cfg,
        )
        text = TextConditioning(
            video_embeddings=jnp.zeros((1, 4, cfg.caption_channels), jnp.float32)
        )
        mesh = create_mesh((2, 2, 2))
        with pytest.raises(ValueError, match="low_memory and mesh"):
            generate_video(models, text, height=32, width=32, num_frames=9,
                           low_memory=True, mesh=mesh)
