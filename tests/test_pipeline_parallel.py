"""Pipeline parallelism (GPipe over the block stack) — equality with the
single-device forward/grad on the virtual 8-CPU mesh.

New capability vs the single-device reference (SURVEY §2.12); see
mlx_video_tpu/parallel/pipeline.py for the schedule design.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_video_tpu.config import LTXModelType, LTXRopeType, tiny_test_config
from mlx_video_tpu.models.ltx.model import Modality, init_ltx_params, ltx_apply
from mlx_video_tpu.parallel.pipeline import (
    pipeline_ltx_apply,
    pipeline_mesh,
    shard_params_pipeline,
)
from mlx_video_tpu.pipelines.positions import (
    create_audio_position_grid,
    create_position_grid,
)


def _video_case(b=4, num_layers=4):
    config = tiny_test_config(LTXModelType.VideoOnly, rope_type=LTXRopeType.SPLIT,
                              num_layers=num_layers)
    params = init_ltx_params(jax.random.key(0), config, dtype=jnp.float32)
    f, h, w = 2, 4, 4
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.normal(size=(b, f * h * w, config.in_channels)).astype(np.float32))
    ts = jnp.full(tokens.shape[:2], 0.7, dtype=jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(b, 8, config.caption_channels)).astype(np.float32))
    pos = jnp.asarray(create_position_grid(b, f, h, w))
    return config, params, Modality(latent=tokens, timesteps=ts, context=ctx, positions=pos)


class TestPipelineForward:
    @pytest.mark.parametrize("p_size,m", [(2, 2), (4, 2), (4, 4), (8, 4)])
    def test_video_forward_equals_single_device(self, p_size, m):
        config, params, mod = _video_case(num_layers=8)
        ref, _ = jax.jit(lambda p, v: ltx_apply(p, config, video=v))(params, mod)
        mesh = pipeline_mesh(p_size)
        sp = shard_params_pipeline(params, mesh)
        out, _ = jax.jit(
            lambda p, v: pipeline_ltx_apply(p, config, video=v, mesh=mesh, num_microbatches=m)
        )(sp, mod)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5)

    def test_dp_x_pp(self):
        config, params, mod = _video_case()
        ref, _ = jax.jit(lambda p, v: ltx_apply(p, config, video=v))(params, mod)
        mesh = pipeline_mesh(4, data=2)
        sp = shard_params_pipeline(params, mesh)
        out, _ = jax.jit(
            lambda p, v: pipeline_ltx_apply(
                p, config, video=v, mesh=mesh, num_microbatches=2, data_axis="data"
            )
        )(sp, mod)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5)

    def test_batch_one_degenerates_to_sequential(self):
        config, params, mod = _video_case(b=1)
        ref, _ = jax.jit(lambda p, v: ltx_apply(p, config, video=v))(params, mod)
        mesh = pipeline_mesh(4)
        sp = shard_params_pipeline(params, mesh)
        out, _ = jax.jit(
            lambda p, v: pipeline_ltx_apply(p, config, video=v, mesh=mesh, num_microbatches=1)
        )(sp, mod)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5)

    def test_av_forward_equals_single_device(self):
        cfg = tiny_test_config(LTXModelType.AudioVideo, rope_type=LTXRopeType.SPLIT, num_layers=4)
        params = init_ltx_params(jax.random.key(9), cfg, dtype=jnp.float32)
        rng = np.random.default_rng(9)
        b, f, h, w, at = 2, 2, 4, 4, 5
        video = Modality(
            latent=jnp.asarray(rng.normal(size=(b, f * h * w, cfg.in_channels)).astype(np.float32)),
            timesteps=jnp.full((b, f * h * w), 0.5, dtype=jnp.float32),
            context=jnp.asarray(rng.normal(size=(b, 8, cfg.caption_channels)).astype(np.float32)),
            positions=jnp.asarray(create_position_grid(b, f, h, w)),
        )
        audio = Modality(
            latent=jnp.asarray(rng.normal(size=(b, at, cfg.audio_in_channels)).astype(np.float32)),
            timesteps=jnp.full((b, at), 0.5, dtype=jnp.float32),
            context=jnp.asarray(rng.normal(size=(b, 8, cfg.audio_caption_channels)).astype(np.float32)),
            positions=jnp.asarray(create_audio_position_grid(b, at)),
        )
        rv, ra = jax.jit(lambda p, v, a: ltx_apply(p, cfg, video=v, audio=a))(params, video, audio)
        mesh = pipeline_mesh(4)
        sp = shard_params_pipeline(params, mesh)
        ov, oa = jax.jit(
            lambda p, v, a: pipeline_ltx_apply(
                p, cfg, video=v, audio=a, mesh=mesh, num_microbatches=2
            )
        )(sp, video, audio)
        np.testing.assert_allclose(np.asarray(ov), np.asarray(rv), atol=2e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(oa), np.asarray(ra), atol=2e-5, rtol=1e-5)

    def test_validation_errors(self):
        config, params, mod = _video_case()
        mesh = pipeline_mesh(4)
        sp = shard_params_pipeline(params, mesh)
        cfg6 = tiny_test_config(LTXModelType.VideoOnly, rope_type=LTXRopeType.SPLIT, num_layers=6)
        params6 = init_ltx_params(jax.random.key(0), cfg6, dtype=jnp.float32)
        with pytest.raises(ValueError, match="not divisible by pipe"):
            pipeline_ltx_apply(params6, cfg6, video=mod, mesh=mesh)
        with pytest.raises(ValueError, match="not divisible by num_microbatches"):
            pipeline_ltx_apply(sp, config, video=mod, mesh=mesh, num_microbatches=3)


class TestPipelineTensorCompose:
    """TP/FSDP inside each pipeline stage: shard_map stays manual over
    data/pipe only, fsdp/tensor remain GSPMD auto axes (partial-manual)."""

    @pytest.mark.parametrize(
        "mesh_kw,m,daxis",
        [
            (dict(num_stages=2, tensor=4), 2, None),
            (dict(num_stages=2, data=2, tensor=2), 2, "data"),
            (dict(num_stages=2, fsdp=2, tensor=2), 2, None),
        ],
    )
    def test_tp_x_pp_forward(self, mesh_kw, m, daxis):
        config, params, mod = _video_case()
        ref, _ = jax.jit(lambda p, v: ltx_apply(p, config, video=v))(params, mod)
        mesh = pipeline_mesh(**mesh_kw)
        sp = shard_params_pipeline(params, mesh)
        out, _ = jax.jit(
            lambda p, v: pipeline_ltx_apply(
                p, config, video=v, mesh=mesh, num_microbatches=m, data_axis=daxis
            )
        )(sp, mod)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5)

    def test_tp_x_pp_grads(self):
        config, params, mod = _video_case()
        tgt = jnp.asarray(
            np.random.default_rng(3).normal(size=mod.latent.shape).astype(np.float32)
        )

        def loss_ref(p):
            v, _ = ltx_apply(p, config, video=mod)
            return jnp.mean(jnp.square(v - tgt))

        gr = jax.jit(jax.grad(loss_ref))(params)
        mesh = pipeline_mesh(2, data=2, tensor=2)
        sp = shard_params_pipeline(params, mesh)

        def loss_pp(p):
            v, _ = pipeline_ltx_apply(
                p, config, video=mod, mesh=mesh, num_microbatches=2, data_axis="data"
            )
            return jnp.mean(jnp.square(v - tgt))

        gp = jax.jit(jax.grad(loss_pp))(sp)
        for a, b_ in zip(jax.tree.leaves(gp), jax.tree.leaves(gr)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5, rtol=1e-4)

    def test_19b_aot_lowers_pp2_x_tp4(self):
        """The real 19B geometry AOT-lowers pipeline-sharded over
        (pipe=2, tensor=4): per-device params ~1/8 of the model — the
        cross-slice deployment shape (PP across DCN, TP inside each slice)."""
        from mlx_video_tpu.config import LTXModelConfig

        config = LTXModelConfig(rope_type=LTXRopeType.SPLIT)  # 19B AV flagship
        params_shapes = jax.eval_shape(
            lambda: init_ltx_params(jax.random.key(0), config, dtype=jnp.bfloat16)
        )
        n_params = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params_shapes))
        assert 18e9 < n_params < 20e9

        mesh = pipeline_mesh(2, tensor=4)
        from jax.sharding import NamedSharding, PartitionSpec as P
        from mlx_video_tpu.parallel.sharding import param_specs

        specs = param_specs(params_shapes)
        specs["blocks"] = jax.tree.map(
            lambda s: P(*(("pipe",) + tuple(s)[1:])), specs["blocks"]
        )
        shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), specs)

        b, s = 2, 5 * 16 * 16
        from mlx_video_tpu.pipelines.positions import create_position_grid

        video = Modality(
            latent=jax.ShapeDtypeStruct((b, s, 128), jnp.bfloat16),
            timesteps=jax.ShapeDtypeStruct((b, s), jnp.bfloat16),
            context=jax.ShapeDtypeStruct((b, 128, 3840), jnp.bfloat16),
            positions=jax.ShapeDtypeStruct((b, 3, s, 2), jnp.float32),
        )
        with mesh:
            compiled = (
                jax.jit(
                    lambda p, v: pipeline_ltx_apply(
                        p, config, video=v, mesh=mesh, num_microbatches=2
                    ),
                    in_shardings=(shardings, None),
                )
                .lower(params_shapes, video)
                .compile()
            )
        per_dev = compiled.memory_analysis()
        # bf16 19B = ~38 GB total; pipe2 x tp4 => ~1/8 per device (+temps)
        assert per_dev.argument_size_in_bytes < 0.20 * 2 * n_params


class TestPipelineDenoise:
    def test_denoise_pp_matches_plain(self):
        """The scanned denoise loop with pipeline_parallel set reproduces
        the plain loop (distilled and dev-CFG paths, B=2)."""
        from mlx_video_tpu.pipelines import denoise as dn

        config, params, mod = _video_case(b=2)
        lat = jnp.transpose(mod.latent, (0, 2, 1)).reshape(2, config.in_channels, 2, 4, 4)
        sigmas = [1.0, 0.6, 0.2, 0.0]
        mesh = pipeline_mesh(4)
        sp = shard_params_pipeline(params, mesh)
        pp = (mesh, "pipe", 2)

        ref_v, _ = dn.denoise(params, config, lat, mod.positions, mod.context, sigmas)
        out_v, _ = dn.denoise(
            sp, config, lat, mod.positions, mod.context, sigmas, pipeline_parallel=pp
        )
        np.testing.assert_allclose(np.asarray(out_v), np.asarray(ref_v), atol=5e-4)

        neg = mod.context * 0.5
        ref_c, _ = dn.denoise(
            params, config, lat, mod.positions, mod.context, sigmas,
            neg_context=neg, cfg_scale=3.0,
        )
        out_c, _ = dn.denoise(
            sp, config, lat, mod.positions, mod.context, sigmas,
            neg_context=neg, cfg_scale=3.0, pipeline_parallel=pp,
        )
        np.testing.assert_allclose(np.asarray(out_c), np.asarray(ref_c), atol=5e-4)

    def test_denoise_pp_validation(self):
        from mlx_video_tpu.pipelines import denoise as dn

        config, params, mod = _video_case(b=1)
        lat = jnp.transpose(mod.latent, (0, 2, 1)).reshape(1, config.in_channels, 2, 4, 4)
        mesh = pipeline_mesh(4)
        with pytest.raises(ValueError, match="not divisible by pipeline"):
            dn.denoise(params, config, lat, mod.positions, mod.context, [1.0, 0.0],
                       pipeline_parallel=(mesh, "pipe", 2))
        with pytest.raises(ValueError, match="mutually exclusive"):
            dn.denoise(params, config, lat, mod.positions, mod.context, [1.0, 0.0],
                       pipeline_parallel=(mesh, "pipe", 1),
                       sequence_parallel=(mesh, "data"))


class TestPipelineGrad:
    def test_grads_equal_single_device(self):
        """Params AND input grads match — the ppermute/broadcast transposes
        (GPipe backward) are exact, including the DP gradient psum."""
        config, params, mod = _video_case()
        tgt = jnp.asarray(np.random.default_rng(3).normal(size=mod.latent.shape).astype(np.float32))

        def loss_ref(p, tok, ctx):
            m = mod._replace(latent=tok, context=ctx)
            v, _ = ltx_apply(p, config, video=m)
            return jnp.mean(jnp.square(v - tgt))

        lr, gr = jax.jit(jax.value_and_grad(loss_ref, argnums=(0, 1, 2)))(
            params, mod.latent, mod.context
        )

        for data, m_, daxis in [(1, 4, None), (2, 2, "data")]:
            mesh = pipeline_mesh(4, data=data)
            sp = shard_params_pipeline(params, mesh)

            def loss_pp(p, tok, ctx):
                mm = mod._replace(latent=tok, context=ctx)
                v, _ = pipeline_ltx_apply(
                    p, config, video=mm, mesh=mesh, num_microbatches=m_, data_axis=daxis
                )
                return jnp.mean(jnp.square(v - tgt))

            lp, gp = jax.jit(jax.value_and_grad(loss_pp, argnums=(0, 1, 2)))(
                sp, mod.latent, mod.context
            )
            assert abs(float(lp - lr)) < 1e-5
            for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gr)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)

    def test_training_step_through_pipeline(self):
        """grad_step(pp=...) trains: one step through the pipelined loss
        matches the non-pipelined grad_step numerically."""
        from mlx_video_tpu.trainer.strategies import StrategyBatch, _first_frame_token_mask
        from mlx_video_tpu.trainer.train_step import grad_step

        config, params, mod = _video_case()
        b, s = mod.latent.shape[:2]
        f, h, w = 2, 4, 4
        sb = StrategyBatch(
            video_latents=mod.latent,
            positions=mod.positions,
            context=mod.context,
            context_mask=None,
            first_frame_token_mask=jnp.asarray(_first_frame_token_mask(b, f, h, w)),
            always_conditioned_mask=jnp.zeros((b, s), dtype=bool),
        )
        loss_ref, grads_ref = grad_step(params, sb, jax.random.key(4), config)
        mesh = pipeline_mesh(4, data=2)
        sp = shard_params_pipeline(params, mesh)
        loss_pp, grads_pp = grad_step(
            sp, sb, jax.random.key(4), config, pp=(mesh, "pipe", 2, "data")
        )
        assert abs(float(loss_pp - loss_ref)) < 1e-5
        for a, b_ in zip(jax.tree.leaves(grads_pp), jax.tree.leaves(grads_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5, rtol=1e-4)
