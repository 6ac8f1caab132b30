"""Trainer tests: strategies, steps, checkpoints, resume (dummy dataset)."""

from pathlib import Path

import re
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_video_tpu.config import LTXModelType, tiny_test_config
from mlx_video_tpu.models.ltx.model import init_ltx_params
from mlx_video_tpu.trainer import checkpoints as ckpt
from mlx_video_tpu.trainer.config import TrainingConfig, load_training_config
from mlx_video_tpu.trainer.datasets import Batch, DummyDataset, collate_batches, iter_batches
from mlx_video_tpu.trainer.strategies import (
    compute_loss,
    make_inputs,
    prepare_text_to_video,
    prepare_video_to_video,
    sample_sigmas,
)
from mlx_video_tpu.trainer.trainer import Trainer


def tiny_cfg(**kw):
    defaults = dict(
        model_repo="", steps=3, batch_size=1, lr=1e-3, seed=0,
        dummy_width=64, dummy_height=64, dummy_num_frames=9, dummy_prompt_len=8,
        save_every=0, log_every=100, progress=False,
    )
    defaults.update(kw)
    return TrainingConfig(**defaults)


def tiny_model():
    cfg = tiny_test_config(LTXModelType.VideoOnly)
    params = init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32)
    return cfg, params


def tiny_dataset(**kw):
    return DummyDataset(
        width=64, height=64, num_frames=9, dataset_length=8,
        latent_dim=16, prompt_embed_dim=48, prompt_sequence_length=8, **kw
    )


class TestDatasets:
    def test_dummy_shapes(self):
        ds = tiny_dataset()
        b = ds[0]
        assert b.latents["latents"].shape == (16, 2, 2, 2)
        assert b.conditions["video_prompt_embeds"].shape == (8, 48)

    def test_collate(self):
        ds = tiny_dataset()
        batch = collate_batches([ds[0], ds[1]])
        assert batch.latents["latents"].shape == (2, 16, 2, 2, 2)

    def test_iter_batches_covers_dataset(self):
        ds = tiny_dataset()
        seen = 0
        for b in iter_batches(ds, batch_size=4, shuffle=True, seed=0):
            seen += b.latents["latents"].shape[0]
        assert seen == len(ds)

    def test_precomputed_dataset(self, tmp_path, rng):
        from mlx_video_tpu.io.safetensors import save_safetensors
        from mlx_video_tpu.trainer.datasets import PrecomputedDataset

        (tmp_path / "latents").mkdir()
        (tmp_path / "conditions").mkdir()
        for i in range(3):
            save_safetensors(
                tmp_path / "latents" / f"latent_{i:03d}.safetensors",
                {
                    "latents": rng.normal(size=(16, 2, 2, 2)).astype(np.float32),
                    "num_frames": np.array([2], np.int32),
                    "height": np.array([2], np.int32),
                    "width": np.array([2], np.int32),
                },
            )
            save_safetensors(
                tmp_path / "conditions" / f"condition_{i:03d}.safetensors",
                {"prompt_embeds": rng.normal(size=(8, 48)).astype(np.float32)},
            )
        ds = PrecomputedDataset(tmp_path)
        assert len(ds) == 3
        b = ds[0]
        assert b.latents["latents"].shape == (16, 2, 2, 2)
        assert "prompt_embeds" in b.conditions

    def test_bucketed_batching_groups_same_shape(self, tmp_path, rng):
        """batch_size > 1 over a resolution-bucketed dataset: every batch is
        one bucket (mixed shapes cannot stack), every sample appears at
        least once, and partial per-bucket tails are PADDED to batch_size
        by wrapping the bucket (a smaller tail would break mesh data
        sharding and recompile per tail size)."""
        from mlx_video_tpu.io.safetensors import save_safetensors
        from mlx_video_tpu.trainer.datasets import PrecomputedDataset

        (tmp_path / "latents").mkdir()
        (tmp_path / "conditions").mkdir()
        shapes = [(16, 2, 2, 2)] * 3 + [(16, 2, 4, 2)] * 2  # bucket sizes 3+2
        for i, shp in enumerate(shapes):
            save_safetensors(
                tmp_path / "latents" / f"latent_{i:03d}.safetensors",
                {
                    "latents": rng.normal(size=shp).astype(np.float32),
                    "num_frames": np.array([shp[1]], np.int32),
                    "height": np.array([shp[2]], np.int32),
                    "width": np.array([shp[3]], np.int32),
                },
            )
            save_safetensors(
                tmp_path / "conditions" / f"condition_{i:03d}.safetensors",
                {"prompt_embeds": rng.normal(size=(8, 48)).astype(np.float32)},
            )
        ds = PrecomputedDataset(tmp_path)
        assert ds.latent_shape(0) == (16, 2, 2, 2)
        seen = 0
        batch_shapes = []
        for b in iter_batches(ds, batch_size=2, shuffle=True, seed=3):
            lat = b.latents["latents"]
            seen += lat.shape[0]
            batch_shapes.append(lat.shape)
        # bucket of 3 -> 2 batches (tail wrap-padded); bucket of 2 -> 1
        assert seen == 6
        assert sorted(s[0] for s in batch_shapes) == [2, 2, 2]
        for s in batch_shapes:  # never mixed within a batch
            assert s[1:] in ((16, 2, 2, 2), (16, 2, 4, 2))

    def test_bucketing_keys_on_normalized_shape(self, tmp_path, rng):
        """Legacy patchified (S, C) latents from equal-token buckets
        (2x2x4 vs 2x4x2 -> S=16 both) must NOT share a bucket: bucketing
        keys on the normalized (C, F, H, W), which differs."""
        from mlx_video_tpu.io.safetensors import save_safetensors
        from mlx_video_tpu.trainer.datasets import PrecomputedDataset

        (tmp_path / "latents").mkdir()
        (tmp_path / "conditions").mkdir()
        dims = [(2, 2, 4)] * 2 + [(2, 4, 2)] * 2  # same S = 16
        for i, (f, h, w) in enumerate(dims):
            save_safetensors(
                tmp_path / "latents" / f"latent_{i:03d}.safetensors",
                {
                    "latents": rng.normal(size=(f * h * w, 16)).astype(np.float32),
                    "num_frames": np.array([f], np.int32),
                    "height": np.array([h], np.int32),
                    "width": np.array([w], np.int32),
                },
            )
            save_safetensors(
                tmp_path / "conditions" / f"condition_{i:03d}.safetensors",
                {"prompt_embeds": rng.normal(size=(8, 48)).astype(np.float32)},
            )
        ds = PrecomputedDataset(tmp_path)
        assert ds.latent_shape(0) == (16, 2, 2, 4)
        assert ds.latent_shape(2) == (16, 2, 4, 2)
        shapes = set()
        for b in iter_batches(ds, batch_size=2, shuffle=True, seed=0):
            lat = b.latents["latents"]
            assert lat.shape[0] == 2
            shapes.add(lat.shape[1:])
        assert shapes == {(16, 2, 2, 4), (16, 2, 4, 2)}

    def test_legacy_patchified_normalization(self, rng):
        from mlx_video_tpu.trainer.datasets import normalize_video_latents

        flat = rng.normal(size=(2 * 2 * 2, 16)).astype(np.float32)
        data = normalize_video_latents(
            {"latents": flat, "num_frames": [2], "height": [2], "width": [2]}
        )
        assert data["latents"].shape == (16, 2, 2, 2)


class TestStrategies:
    def test_t2v_prepare_shapes(self):
        ds = tiny_dataset()
        sb = prepare_text_to_video(collate_batches([ds[0]]))
        assert sb.video_latents.shape == (1, 8, 16)
        assert sb.positions.shape == (1, 3, 8, 2)
        assert bool(sb.first_frame_token_mask[0, 0]) and not bool(sb.first_frame_token_mask[0, 4])

    def test_v2v_prepare_prepends_reference(self):
        ds = tiny_dataset(with_reference=True)
        sb = prepare_video_to_video(collate_batches([ds[0]]))
        assert sb.video_latents.shape == (1, 16, 16)  # ref 8 + target 8 tokens
        assert bool(sb.always_conditioned_mask[0, 0])
        assert not bool(sb.always_conditioned_mask[0, 8])
        assert sb.positions.shape == (1, 3, 16, 2)

    def test_conditioned_tokens_clean_and_masked(self):
        ds = tiny_dataset()
        sb = prepare_text_to_video(collate_batches([ds[0]]))
        inputs = make_inputs(sb, jax.random.key(0), first_frame_conditioning_p=1.0)
        # frame-0 tokens: clean latent, zero timestep, excluded from loss
        np.testing.assert_allclose(
            np.asarray(inputs.video.latent[0, :4]), np.asarray(sb.video_latents[0, :4])
        )
        np.testing.assert_array_equal(np.asarray(inputs.video.timesteps[0, :4]), 0.0)
        assert not np.any(np.asarray(inputs.video_loss_mask[0, :4]))
        assert np.all(np.asarray(inputs.video_loss_mask[0, 4:]))

    def test_no_conditioning_when_p_zero(self):
        ds = tiny_dataset()
        sb = prepare_text_to_video(collate_batches([ds[0]]))
        inputs = make_inputs(sb, jax.random.key(0), first_frame_conditioning_p=0.0)
        assert np.all(np.asarray(inputs.video_loss_mask))

    def test_flow_matching_identity(self):
        """x_t = (1-s)x + s*eps and target = eps - x."""
        ds = tiny_dataset()
        sb = prepare_text_to_video(collate_batches([ds[0]]))
        inputs = make_inputs(sb, jax.random.key(7), first_frame_conditioning_p=0.0)
        x = np.asarray(sb.video_latents, np.float64)
        xt = np.asarray(inputs.video.latent, np.float64)
        v = np.asarray(inputs.video_targets, np.float64)
        sigma = np.asarray(inputs.video.timesteps)[0, 0]
        eps = v + x
        np.testing.assert_allclose(xt, (1 - sigma) * x + sigma * eps, atol=1e-4)

    def test_loss_perfect_prediction_zero(self):
        ds = tiny_dataset()
        sb = prepare_text_to_video(collate_batches([ds[0]]))
        inputs = make_inputs(sb, jax.random.key(0))
        loss = compute_loss(inputs.video_targets, None, inputs)
        assert float(loss) < 1e-10

    def test_sigma_samplers(self):
        u = sample_sigmas(jax.random.key(0), 1000, 1024, "uniform")
        assert 0 <= float(jnp.min(u)) and float(jnp.max(u)) <= 1
        s = sample_sigmas(jax.random.key(0), 1000, 4096, "shifted_logit_normal")
        # shifted toward high sigma for long sequences
        assert float(jnp.mean(s)) > 0.7


class TestTrainer:
    def test_lora_training_runs_and_saves(self, tmp_path):
        mcfg, params = tiny_model()
        cfg = tiny_cfg(training_mode="lora", output_dir=str(tmp_path), steps=3, save_every=2)
        tr = Trainer(cfg, model_config=mcfg, params=params, dataset=tiny_dataset())
        loss = tr.train()
        assert np.isfinite(loss)
        assert (tmp_path / "lora_step_3.safetensors").exists()
        assert (tmp_path / "state_step_3.safetensors").exists()

    def test_mesh_sharded_training_matches_single_device(self, tmp_path):
        """TP/FSDP-sharded training (mesh_shape config) must match the
        single-device loss trajectory; sequence_parallel stacks on top."""
        mcfg, params = tiny_model()
        kw = dict(training_mode="full", steps=2, seed=5)

        def fresh():  # apply_updates donates param buffers; copy per trainer
            return jax.tree.map(jnp.copy, params)

        ref = Trainer(
            tiny_cfg(output_dir=str(tmp_path / "a"), **kw),
            model_config=mcfg, params=fresh(), dataset=tiny_dataset(),
        )
        ref_loss = ref.train()

        sharded = Trainer(
            tiny_cfg(output_dir=str(tmp_path / "b"), mesh_shape=(1, 2, 4), **kw),
            model_config=mcfg, params=fresh(), dataset=tiny_dataset(),
        )
        assert sharded.mesh is not None
        np.testing.assert_allclose(sharded.train(), ref_loss, rtol=1e-4)

        sp = Trainer(
            tiny_cfg(
                output_dir=str(tmp_path / "c"), mesh_shape=(1, 2, 4),
                sequence_parallel=True, **kw,
            ),
            model_config=mcfg, params=fresh(), dataset=tiny_dataset(),
        )
        assert sp.sp is not None
        np.testing.assert_allclose(sp.train(), ref_loss, rtol=1e-4)

    def test_pipeline_parallel_training_matches_single_device(self, tmp_path):
        """GPipe pipeline-parallel training (pipeline_stages config) must
        match the single-device loss trajectory (parallel/pipeline.py)."""
        mcfg, params = tiny_model()
        kw = dict(training_mode="full", steps=2, seed=5)

        def fresh():
            return jax.tree.map(jnp.copy, params)

        ref = Trainer(
            tiny_cfg(output_dir=str(tmp_path / "a"), **kw),
            model_config=mcfg, params=fresh(), dataset=tiny_dataset(),
        )
        ref_loss = ref.train()

        pp = Trainer(
            tiny_cfg(
                output_dir=str(tmp_path / "b"), pipeline_stages=2,
                pipeline_microbatches=1, **kw,
            ),
            model_config=mcfg, params=fresh(), dataset=tiny_dataset(),
        )
        assert pp.pp is not None and pp.mesh is None
        np.testing.assert_allclose(pp.train(), ref_loss, rtol=1e-4)

        with pytest.raises(ValueError, match="mutually exclusive"):
            Trainer(
                tiny_cfg(output_dir=str(tmp_path / "c"), pipeline_stages=2,
                         mesh_shape=(1, 2, 4), **kw),
                model_config=mcfg, params=fresh(), dataset=tiny_dataset(),
            )

    def test_mesh_sharded_lora_over_quant_matches_single_device(self, tmp_path):
        """The single-chip 19B recipe (LoRA over a frozen quantized base)
        must also train under TP/FSDP sharding with identical losses —
        float0 grads for the int base + the STE backward, under GSPMD."""
        from mlx_video_tpu.ops.quant import prepare_w4a8, quantize_dit_params

        mcfg, params = tiny_model()
        qparams = prepare_w4a8(quantize_dit_params(params, group_size=16, bits=4))
        kw = dict(training_mode="lora", lora_rank=2, steps=2, seed=5)

        def fresh():
            return jax.tree.map(jnp.copy, qparams)

        ref = Trainer(
            tiny_cfg(output_dir=str(tmp_path / "a"), **kw),
            model_config=mcfg, params=fresh(), dataset=tiny_dataset(),
        )
        ref_loss = ref.train()
        sharded = Trainer(
            tiny_cfg(output_dir=str(tmp_path / "b"), mesh_shape=(1, 2, 4), **kw),
            model_config=mcfg, params=fresh(), dataset=tiny_dataset(),
        )
        assert sharded.mesh is not None
        np.testing.assert_allclose(sharded.train(), ref_loss, rtol=1e-4)

    def test_lora_only_updates_lora_leaves(self, tmp_path):
        mcfg, params = tiny_model()
        cfg = tiny_cfg(training_mode="lora", output_dir=str(tmp_path), steps=2)
        tr = Trainer(cfg, model_config=mcfg, params=params, dataset=tiny_dataset())
        before = np.asarray(tr.params["blocks"]["attn1"]["to_q"]["weight"]).copy()
        before_lora = np.asarray(tr.params["blocks"]["attn1"]["to_q"]["lora_A"]).copy()
        tr.train()
        after = np.asarray(tr.params["blocks"]["attn1"]["to_q"]["weight"])
        after_lora = np.asarray(tr.params["blocks"]["attn1"]["to_q"]["lora_A"])
        np.testing.assert_array_equal(before, after)  # base frozen
        assert np.max(np.abs(after_lora - before_lora)) > 0  # lora trained

    def test_full_training_updates_weights(self, tmp_path):
        mcfg, params = tiny_model()
        cfg = tiny_cfg(training_mode="full", output_dir=str(tmp_path), steps=2)
        tr = Trainer(cfg, model_config=mcfg, params=params, dataset=tiny_dataset())
        before = np.asarray(tr.params["blocks"]["attn1"]["to_q"]["weight"]).copy()
        tr.train()
        after = np.asarray(tr.params["blocks"]["attn1"]["to_q"]["weight"])
        assert np.max(np.abs(after - before)) > 0

    def test_grad_accumulation(self, tmp_path):
        mcfg, params = tiny_model()
        cfg = tiny_cfg(
            training_mode="full", output_dir=str(tmp_path), steps=2, grad_accum_steps=2
        )
        tr = Trainer(cfg, model_config=mcfg, params=params, dataset=tiny_dataset())
        loss = tr.train()
        assert np.isfinite(loss)

    def test_av_training_updates_audio_branch(self, tmp_path):
        """with_audio=True end to end through the Trainer: AudioVideo tiny
        model, dummy dataset emitting audio latents + audio prompt embeds,
        joint loss — and the audio-branch parameters actually receive
        gradient updates (reference: AV LoRA training, ltx2_av_lora.yaml)."""
        from mlx_video_tpu.config import LTXModelType, tiny_test_config

        mcfg = tiny_test_config(LTXModelType.AudioVideo)
        params = init_ltx_params(jax.random.key(0), mcfg, dtype=jnp.float32)
        before = jax.tree.map(np.asarray, params)
        cfg = tiny_cfg(
            training_mode="full", steps=2, with_audio=True,
            output_dir=str(tmp_path),
        )
        tr = Trainer(
            cfg, model_config=mcfg, params=params,
            dataset=tiny_dataset(with_audio=True, audio_channels=2, audio_bins=4, audio_frames=12),
        )
        loss = tr.train()
        assert np.isfinite(loss)
        a_before = before["blocks"]["audio_ff"]
        a_after = jax.tree.map(np.asarray, tr.params["blocks"]["audio_ff"])
        diffs = jax.tree.leaves(
            jax.tree.map(lambda x, y: float(np.abs(x - y).max()), a_before, a_after)
        )
        assert max(diffs) > 0, "audio branch never updated"

    def test_bf16_model_trains(self, tmp_path):
        """A bf16 model must train on fp32 dataset batches: activations are
        cast to the model dtype at the strategy boundary. Without the cast,
        the fp32 noise-island output reaches bf16 attention as an fp32 query
        against a bf16 context key and the forward raises — a path no other
        test hits because tiny models train in fp32."""
        mcfg, _ = tiny_model()
        params = init_ltx_params(jax.random.key(0), mcfg, dtype=jnp.bfloat16)
        cfg = tiny_cfg(training_mode="full", steps=2, output_dir=str(tmp_path))
        tr = Trainer(cfg, model_config=mcfg, params=params, dataset=tiny_dataset())
        loss = tr.train()
        assert np.isfinite(loss)

    def test_v2v_training(self, tmp_path):
        mcfg, params = tiny_model()
        cfg = tiny_cfg(
            training_mode="lora", strategy="video_to_video", output_dir=str(tmp_path), steps=2
        )
        tr = Trainer(
            cfg, model_config=mcfg, params=params, dataset=tiny_dataset(with_reference=True)
        )
        assert np.isfinite(tr.train())

    def test_resume_restores_step_and_state(self, tmp_path):
        mcfg, params = tiny_model()
        cfg = tiny_cfg(training_mode="full", output_dir=str(tmp_path), steps=2)
        tr = Trainer(cfg, model_config=mcfg, params=params, dataset=tiny_dataset())
        tr.train()

        cfg2 = tiny_cfg(training_mode="full", output_dir=str(tmp_path), steps=4, resume=True)
        tr2 = Trainer(cfg2, model_config=mcfg, params=params, dataset=tiny_dataset())
        assert tr2.start_step == 2
        np.testing.assert_array_equal(
            np.asarray(tr2.params["blocks"]["attn1"]["to_q"]["weight"]),
            np.asarray(tr.params["blocks"]["attn1"]["to_q"]["weight"]),
        )
        assert np.isfinite(tr2.train())

    def test_quantized_base_requires_lora(self, tmp_path):
        from mlx_video_tpu.ops.quant import quantize_dit_params

        mcfg, params = tiny_model()
        qparams = quantize_dit_params(params, group_size=32, bits=8)
        cfg = tiny_cfg(training_mode="full", output_dir=str(tmp_path))
        with pytest.raises(ValueError, match="LoRA"):
            Trainer(cfg, model_config=mcfg, params=qparams, dataset=tiny_dataset())

    @pytest.mark.parametrize("fmt", ["q4", "w8a8"])
    def test_lora_trains_over_quantized_base(self, tmp_path, fmt):
        """LoRA over a frozen quantized base is the only way to finetune the
        19B on one chip: integer base leaves must yield float0 grads
        (allow_int) that survive accumulation and the masked optimizer."""
        mcfg, params = tiny_model()
        if fmt == "q4":
            from mlx_video_tpu.ops.quant import quantize_dit_params

            qparams = quantize_dit_params(params, group_size=16, bits=4)
        else:
            from mlx_video_tpu.ops.int8 import quantize_params_w8a8

            qparams = quantize_params_w8a8(params)
        cfg = tiny_cfg(
            training_mode="lora", lora_rank=2, output_dir=str(tmp_path),
            steps=3, grad_accum_steps=2,
        )
        tr = Trainer(cfg, model_config=mcfg, params=qparams, dataset=tiny_dataset())
        # shapes must come from the config skeleton, not the (ambiguous)
        # packed layout: rank x model-dim regardless of storage format
        lora_a = tr.params["blocks"]["attn1"]["to_q"]["lora_A"]
        dim = mcfg.num_attention_heads * mcfg.attention_head_dim
        assert lora_a.shape == (mcfg.num_layers, 2, dim)
        before = np.asarray(lora_a).copy()
        assert np.isfinite(tr.train())
        after = np.asarray(tr.params["blocks"]["attn1"]["to_q"]["lora_A"])
        assert np.max(np.abs(after - before)) > 0, "LoRA leaves did not update"

    def test_load_checkpoint_restores_lora_adapter(self, tmp_path):
        """model.load_checkpoint / --load-checkpoint must actually load the
        adapter (it was silently ignored): continue-training from a saved
        lora_step_N.safetensors restores the exact factors."""
        mcfg, params = tiny_model()
        cfg = tiny_cfg(training_mode="lora", lora_rank=2,
                       output_dir=str(tmp_path), steps=2)
        tr = Trainer(cfg, model_config=mcfg,
                     params=jax.tree.map(jnp.copy, params), dataset=tiny_dataset())
        tr.train()
        saved = tmp_path / "lora_step_2.safetensors"
        assert saved.exists()
        trained_a = np.asarray(tr.params["blocks"]["attn1"]["to_q"]["lora_A"])

        cfg2 = tiny_cfg(training_mode="lora", lora_rank=2,
                        output_dir=str(tmp_path / "cont"), steps=2,
                        load_checkpoint=str(saved))
        tr2 = Trainer(cfg2, model_config=mcfg,
                      params=jax.tree.map(jnp.copy, params), dataset=tiny_dataset())
        np.testing.assert_allclose(
            np.asarray(tr2.params["blocks"]["attn1"]["to_q"]["lora_A"]),
            trained_a, atol=1e-6,
        )
        # wrong rank fails loudly, not silently
        cfg3 = tiny_cfg(training_mode="lora", lora_rank=4,
                        output_dir=str(tmp_path / "bad"), steps=1,
                        load_checkpoint=str(saved))
        with pytest.raises(ValueError, match="lora_rank"):
            Trainer(cfg3, model_config=mcfg,
                    params=jax.tree.map(jnp.copy, params), dataset=tiny_dataset())
        # missing file fails loudly
        cfg4 = tiny_cfg(training_mode="lora", lora_rank=2,
                        output_dir=str(tmp_path / "mi"), steps=1,
                        load_checkpoint=str(tmp_path / "nope.safetensors"))
        with pytest.raises(FileNotFoundError):
            Trainer(cfg4, model_config=mcfg,
                    params=jax.tree.map(jnp.copy, params), dataset=tiny_dataset())

    def test_partial_final_accum_window_divides_by_actual_count(self, tmp_path):
        """steps=3 with accum=2 ends on a 1-microbatch window; the flush must
        divide by 1, not 2. Oracle: a steps=3 run where the last window IS
        complete... instead compare against a hand-stepped optimizer."""
        from mlx_video_tpu.trainer.train_step import (
            accumulate_grads, apply_updates, grad_step, make_optimizer,
        )
        mcfg, params = tiny_model()
        cfg = tiny_cfg(training_mode="full", output_dir=str(tmp_path),
                       steps=3, grad_accum_steps=2, seed=3)
        ds = tiny_dataset()
        tr = Trainer(cfg, model_config=mcfg,
                     params=jax.tree.map(jnp.copy, params), dataset=ds)
        tr.train()

        # oracle: replay the same batches/noise manually (trainer loop's
        # exact iteration: shuffle with seed+epoch, step-derived noise key)
        key = jax.random.key(cfg.seed)
        opt = make_optimizer(learning_rate=cfg.lr, weight_decay=cfg.weight_decay,
                             max_grad_norm=cfg.max_grad_norm)
        p = jax.tree.map(jnp.copy, params)
        st = opt.init(p)
        accum, count, step = None, 0, 0
        for batch in iter_batches(ds, cfg.batch_size, shuffle=True, seed=cfg.seed):
            if step >= 3:
                break
            sb = prepare_text_to_video(batch)
            _, g = grad_step(p, sb, jax.random.fold_in(key, step), mcfg,
                             first_frame_conditioning_p=cfg.first_frame_conditioning_p)
            accum = g if accum is None else accumulate_grads(accum, g)
            count += 1
            if (step + 1) % 2 == 0:
                p, st = apply_updates(p, st, accum, opt, 2)
                accum, count = None, 0
            step += 1
        if accum is not None:
            p, st = apply_updates(p, st, accum, opt, count)  # divide by 1
        np.testing.assert_allclose(
            np.asarray(tr.params["blocks"]["attn1"]["to_q"]["weight"]),
            np.asarray(p["blocks"]["attn1"]["to_q"]["weight"]), atol=1e-6,
        )

    def test_validation_callback(self, tmp_path):
        mcfg, params = tiny_model()
        calls = []
        cfg = tiny_cfg(
            training_mode="full", output_dir=str(tmp_path), steps=2,
            validation_interval=1, validation_prompts=["x"],
        )
        tr = Trainer(
            cfg, model_config=mcfg, params=params, dataset=tiny_dataset(),
            validation_fn=lambda p, step: calls.append(step),
        )
        tr.train()
        assert 0 in calls and 1 in calls


class TestCheckpointPruning:
    def test_prune_counts_steps_not_files(self, tmp_path):
        """Each save writes lora_step_N + state_step_N: pruning must keep
        the newest N STEPS (both files), never split a step's pair, and
        never touch unrelated safetensors in output_dir."""
        from mlx_video_tpu.trainer.checkpoints import prune_checkpoints

        for step in (100, 200, 300):
            (tmp_path / f"lora_step_{step}.safetensors").write_bytes(b"x")
            (tmp_path / f"state_step_{step}.safetensors").write_bytes(b"x")
        (tmp_path / "my_export.safetensors").write_bytes(b"x")

        prune_checkpoints(tmp_path, keep_last_n=1)
        left = sorted(p.name for p in tmp_path.glob("*.safetensors"))
        assert left == [
            "lora_step_300.safetensors",
            "my_export.safetensors",
            "state_step_300.safetensors",
        ], left

    def test_prune_negative_keeps_all(self, tmp_path):
        from mlx_video_tpu.trainer.checkpoints import prune_checkpoints

        (tmp_path / "lora_step_1.safetensors").write_bytes(b"x")
        prune_checkpoints(tmp_path, keep_last_n=-1)
        assert (tmp_path / "lora_step_1.safetensors").exists()


class TestYamlConfig:
    def test_yaml_string_numerics_coerce(self, tmp_path):
        """YAML 1.1 parses '1e-2' as a string: EVERY numeric field must
        coerce, not just lr/steps (a string max_grad_norm blew up in the
        optimizer; a string first_frame_conditioning_p inside jit)."""
        from mlx_video_tpu.trainer.config import load_training_config

        y = tmp_path / "c.yaml"
        y.write_text(
            "optimization:\n"
            "  learning_rate: 2e-4\n"
            "  max_grad_norm: 1e-2\n"
            "lora:\n"
            "  alpha: 16e0\n"
            "training_strategy:\n"
            "  first_frame_conditioning_p: 1e-1\n"
            "flow_matching:\n"
            "  timestep_sampling_params:\n"
            "    std: 5e-1\n"
        )
        cfg = load_training_config(y)
        assert cfg.max_grad_norm == 0.01 and isinstance(cfg.max_grad_norm, float)
        assert cfg.lora_alpha == 16.0 and isinstance(cfg.lora_alpha, float)
        assert cfg.first_frame_conditioning_p == 0.1
        assert cfg.timestep_sampling_std == 0.5

    def test_bad_numeric_raises_with_field_name(self):
        with pytest.raises(ValueError, match="max_grad_norm"):
            TrainingConfig(max_grad_norm="not-a-number")

    def test_load_yaml(self, tmp_path):
        yaml_text = """
model:
  model_path: /models/ltx
  training_mode: lora
lora:
  rank: 16
  alpha: 32
  target_modules: ["to_q", "to_out.0", "ff.net.0.proj"]
training_strategy:
  name: ic_lora
  first_frame_conditioning_p: 0.2
optimization:
  learning_rate: 2e-4
  steps: 500
  batch_size: 2
  gradient_accumulation_steps: 4
  scheduler_type: cosine
flow_matching:
  timestep_sampling_mode: shifted_logit_normal
  timestep_sampling_params: {std: 0.8}
checkpoints:
  interval: 50
  keep_last_n: 3
output_dir: /tmp/out
seed: 7
"""
        p = tmp_path / "cfg.yaml"
        p.write_text(yaml_text)
        cfg = load_training_config(p)
        assert cfg.model_repo == "/models/ltx"
        assert cfg.training_mode == "lora"
        assert cfg.lora_rank == 16
        assert cfg.target_modules == ["to_q", "to_out", "ff.proj_in"]
        assert cfg.strategy == "video_to_video"  # ic_lora maps to v2v
        assert cfg.first_frame_conditioning_p == 0.2
        assert cfg.lr == 2e-4
        assert cfg.grad_accum_steps == 4
        assert cfg.scheduler_type == "cosine"
        assert cfg.timestep_sampling_mode == "shifted_logit_normal"
        assert cfg.timestep_sampling_std == 0.8
        assert cfg.save_every == 50
        assert cfg.checkpoint_keep_last_n == 3
        assert cfg.seed == 7


class TestGradientCheckpointing:
    def test_remat_matches_plain(self):
        """Remat'd training step produces identical loss/grads."""
        import dataclasses

        from mlx_video_tpu.trainer.datasets import collate_batches
        from mlx_video_tpu.trainer.train_step import grad_step

        mcfg, params = tiny_model()
        ds = tiny_dataset()
        sb = prepare_text_to_video(collate_batches([ds[0]]))
        loss_a, grads_a = grad_step(params, sb, jax.random.key(2), mcfg,
                                    first_frame_conditioning_p=0.0)
        mcfg_remat = dataclasses.replace(mcfg, gradient_checkpointing=True)
        loss_b, grads_b = grad_step(params, sb, jax.random.key(2), mcfg_remat,
                                    first_frame_conditioning_p=0.0)
        np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(grads_a), jax.tree_util.tree_leaves(grads_b)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)

    def test_trainer_flag_applies(self, tmp_path):
        import dataclasses

        mcfg, params = tiny_model()
        cfg = tiny_cfg(steps=1, training_mode="lora", lora_rank=2,
                       output_dir=str(tmp_path), enable_gradient_checkpointing=True)
        tr = Trainer(cfg, model_config=mcfg, params=params, dataset=tiny_dataset())
        assert tr.model_config.gradient_checkpointing
        tr.train()

    def test_w8a8_base_requires_lora_mode(self, tmp_path):
        """int8 execution weights are frozen (zero grad through round());
        full finetune on them must be rejected like affine-quantized bases."""
        from mlx_video_tpu.ops.int8 import quantize_params_w8a8

        mcfg, params = tiny_model()
        qparams = quantize_params_w8a8(params)
        with pytest.raises(ValueError, match="LoRA"):
            Trainer(
                tiny_cfg(training_mode="full", output_dir=str(tmp_path), steps=1),
                model_config=mcfg, params=qparams, dataset=tiny_dataset(),
            )


class TestStreamExactResume:
    def test_resume_consumes_identical_batches_and_noise(self, tmp_path):
        """A preempt-at-k + resume run must replay the SAME per-step losses
        as an uninterrupted run: batch order derives from step//spe (epoch)
        and step%spe (skip), the noise key from fold_in(key, step) — no
        iterator/RNG state lives in the checkpoint."""
        mcfg, params = tiny_model()

        def fresh():
            return jax.tree.map(jnp.copy, params)

        ref = Trainer(
            tiny_cfg(training_mode="full", steps=6, output_dir=str(tmp_path / "a")),
            model_config=mcfg, params=fresh(), dataset=tiny_dataset(),
        )
        ref.train()
        ref_losses = list(ref.loss_history)
        assert len(ref_losses) == 6

        first = Trainer(
            tiny_cfg(training_mode="full", steps=3, output_dir=str(tmp_path / "b")),
            model_config=mcfg, params=fresh(), dataset=tiny_dataset(),
        )
        first.train()
        np.testing.assert_allclose(first.loss_history, ref_losses[:3], rtol=1e-6)

        resumed = Trainer(
            tiny_cfg(training_mode="full", steps=6, output_dir=str(tmp_path / "b"),
                     resume=True),
            model_config=mcfg, params=fresh(), dataset=tiny_dataset(),
        )
        assert resumed.start_step == 3
        resumed.train()
        # dataset_length=8, batch=1 -> spe=8; steps 3..5 sit mid-epoch-0, so
        # this exercises the skip path
        np.testing.assert_allclose(resumed.loss_history, ref_losses[3:], rtol=1e-6)

    def test_resume_from_periodic_checkpoint_does_not_replay(self, tmp_path):
        """A save_every checkpoint's step label means 'steps completed':
        resuming from it continues with the NEXT batch (no double-applied
        gradient — the pre-increment save replayed one step)."""
        mcfg, params = tiny_model()

        def fresh():
            return jax.tree.map(jnp.copy, params)

        ref = Trainer(
            tiny_cfg(training_mode="full", steps=6, output_dir=str(tmp_path / "a")),
            model_config=mcfg, params=fresh(), dataset=tiny_dataset(),
        )
        ref.train()
        ref_losses = list(ref.loss_history)

        # periodic checkpoints at steps 2 and 4; final at 5
        first = Trainer(
            tiny_cfg(training_mode="full", steps=5, save_every=2,
                     output_dir=str(tmp_path / "b")),
            model_config=mcfg, params=fresh(), dataset=tiny_dataset(),
        )
        first.train()
        # drop the final checkpoint so resume picks the save_every one
        for f in Path(tmp_path / "b").glob("*step_5*"):
            f.unlink()
        resumed = Trainer(
            tiny_cfg(training_mode="full", steps=6, output_dir=str(tmp_path / "b"),
                     resume=True),
            model_config=mcfg, params=fresh(), dataset=tiny_dataset(),
        )
        assert resumed.start_step == 4
        resumed.train()
        np.testing.assert_allclose(resumed.loss_history, ref_losses[4:], rtol=1e-6)

    def test_periodic_save_defers_to_accumulation_boundary(self, tmp_path):
        """A save_every step that lands mid-gradient-accumulation window must
        slip to the next window boundary: a mid-window checkpoint cannot
        carry the partial gradient sum, so resuming from it would silently
        drop the window's first gradients and diverge from the uninterrupted
        run."""
        mcfg, params = tiny_model()

        def fresh():
            return jax.tree.map(jnp.copy, params)

        # accum=2 -> optimizer updates (and boundaries) at even completed-step
        # counts; save_every=3 requests a save at step 3, mid-window.
        ref = Trainer(
            tiny_cfg(training_mode="full", steps=8, grad_accum_steps=2,
                     output_dir=str(tmp_path / "a")),
            model_config=mcfg, params=fresh(), dataset=tiny_dataset(),
        )
        ref.train()
        ref_losses = list(ref.loss_history)

        first = Trainer(
            tiny_cfg(training_mode="full", steps=7, grad_accum_steps=2,
                     save_every=3, output_dir=str(tmp_path / "b")),
            model_config=mcfg, params=fresh(), dataset=tiny_dataset(),
        )
        first.train()
        out = Path(tmp_path / "b")
        saved = sorted(
            int(m.group(1))
            for p in out.glob("state_step_*.safetensors")
            for m in [re.search(r"step_(\d+)", p.name)]
        )
        # requested at 3 -> deferred to boundary 4; requested at 6 -> boundary
        # already (saved at 6); final at 7. NO step-3 checkpoint may exist.
        assert 3 not in saved, f"mid-window checkpoint written: {saved}"
        assert 4 in saved and 6 in saved, f"deferred saves missing: {saved}"

        # resume from the deferred step-4 checkpoint and verify stream-exact
        # continuation (drop later checkpoints so resume picks step 4)
        for s in saved:
            if s > 4:
                for f in out.glob(f"*step_{s}*"):
                    f.unlink()
        resumed = Trainer(
            tiny_cfg(training_mode="full", steps=8, grad_accum_steps=2,
                     output_dir=str(out), resume=True),
            model_config=mcfg, params=fresh(), dataset=tiny_dataset(),
        )
        assert resumed.start_step == 4
        resumed.train()
        np.testing.assert_allclose(resumed.loss_history, ref_losses[4:], rtol=1e-6)


class TestPartitionedTraining:
    """Partitioned (trainable/frozen) LoRA training: AD must never build
    cotangents for the frozen base — full-tree grad_step materializes
    4.52 GB of dense zero-use gradients for the frozen float leaves at 19B
    (r3 chip probe). grads must match the full-tree path exactly."""

    def _setup(self):
        from mlx_video_tpu.lora import LoRAConfig, inject_lora, lora_mask
        from mlx_video_tpu.ops.quant import quantize_dit_params
        from mlx_video_tpu.pipelines.positions import create_position_grid
        from mlx_video_tpu.trainer.strategies import StrategyBatch

        cfg = tiny_test_config(LTXModelType.VideoOnly)
        base = quantize_dit_params(
            init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32), group_size=16
        )
        params = inject_lora(base, cfg, LoRAConfig(rank=4, alpha=8.0), jax.random.key(1))
        mask = lora_mask(params)
        rng = np.random.default_rng(0)
        b, f, h, w = 1, 2, 2, 2
        s = f * h * w
        sb = StrategyBatch(
            video_latents=jnp.asarray(rng.normal(size=(b, s, cfg.in_channels)).astype(np.float32)),
            positions=jnp.asarray(create_position_grid(b, f, h, w)),
            context=jnp.asarray(rng.normal(size=(b, 8, cfg.caption_channels)).astype(np.float32)),
            context_mask=None,
            first_frame_token_mask=jnp.zeros((b, s), bool).at[:, : h * w].set(True),
            always_conditioned_mask=jnp.zeros((b, s), bool),
        )
        return cfg, params, mask, sb

    def test_partition_merge_round_trip(self):
        from mlx_video_tpu.trainer.train_step import merge_trainable, partition_trainable

        cfg, params, mask, _ = self._setup()
        train, frozen = partition_trainable(params, mask)
        assert train and frozen
        assert all("lora_" in k.rsplit("/", 1)[-1] for k in train)
        merged = merge_trainable(train, frozen)
        assert jax.tree.structure(merged) == jax.tree.structure(params)
        for a, b in zip(jax.tree.leaves(merged), jax.tree.leaves(params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_grads_match_full_tree(self):
        from mlx_video_tpu.trainer.train_step import (
            grad_step,
            grad_step_trainable,
            partition_trainable,
        )

        cfg, params, mask, sb = self._setup()
        key = jax.random.key(2)
        l_full, g_full = grad_step(params, sb, key, cfg)
        train, frozen = partition_trainable(params, mask)
        l_part, g_part = grad_step_trainable(train, frozen, sb, key, cfg)
        assert float(l_full) == pytest.approx(float(l_part), rel=1e-6)
        g_full_train, _ = partition_trainable(g_full, mask)
        assert set(g_part) == set(g_full_train)
        for k in g_part:
            np.testing.assert_allclose(
                np.asarray(g_part[k]), np.asarray(g_full_train[k]), atol=1e-6, err_msg=k
            )

    def test_update_loop_trains(self):
        from mlx_video_tpu.trainer.train_step import (
            apply_updates_trainable,
            grad_step_trainable,
            make_optimizer,
            partition_trainable,
        )

        cfg, params, mask, sb = self._setup()
        train, frozen = partition_trainable(params, mask)
        opt = make_optimizer(1e-3)
        ost = opt.init(train)
        key = jax.random.key(3)
        before = {k: np.asarray(v).copy() for k, v in train.items()}
        for i in range(2):
            loss, g = grad_step_trainable(train, frozen, sb, jax.random.fold_in(key, i), cfg)
            assert np.isfinite(float(loss))
            train, ost = apply_updates_trainable(train, ost, g, optimizer=opt, accum_steps=1)
        moved = [k for k in train if np.abs(np.asarray(train[k]) - before[k]).max() > 0]
        assert moved  # LoRA factors actually update

    def test_layout_discovery_and_relayout_exact(self):
        from mlx_video_tpu.pipelines.denoise import relayout_params
        from mlx_video_tpu.trainer.train_step import (
            grad_step_trainable,
            partition_trainable,
            preferred_trainable_formats,
        )

        cfg, params, mask, sb = self._setup()
        key = jax.random.key(4)
        train, frozen = partition_trainable(params, mask)
        l0, g0 = grad_step_trainable(train, frozen, sb, key, cfg)
        tf, ff = preferred_trainable_formats(train, frozen, sb, key, cfg)
        frozen2 = relayout_params(frozen, ff)
        l1, g1 = grad_step_trainable(train, frozen2, sb, key, cfg)
        assert float(l0) == float(l1)
        for k in g0:
            np.testing.assert_array_equal(np.asarray(g0[k]), np.asarray(g1[k]), err_msg=k)

    def test_relayout_fenced_donate_matches(self):
        """fence_bytes=1 forces the per-chunk fence branch on every moved
        leaf (no-op fetch on CPU); values and donation semantics must match
        the unfenced path (r4 chip OOM fix: bound the in-flight transient)."""
        from mlx_video_tpu.pipelines.denoise import relayout_params
        from mlx_video_tpu.trainer.train_step import (
            grad_step_trainable,
            partition_trainable,
            preferred_trainable_formats,
        )

        cfg, params, mask, sb = self._setup()
        key = jax.random.key(5)
        train, frozen = partition_trainable(params, mask)
        l0, _ = grad_step_trainable(train, frozen, sb, key, cfg)
        _, ff = preferred_trainable_formats(train, frozen, sb, key, cfg)
        expect = {k: np.asarray(v).copy() for k, v in frozen.items()}
        frozen2 = relayout_params(frozen, ff, donate=True, fence_bytes=1)
        for k, v in frozen2.items():
            np.testing.assert_array_equal(np.asarray(v), expect[k], err_msg=k)
        l1, _ = grad_step_trainable(train, frozen2, sb, key, cfg)
        assert float(l0) == float(l1)

    def test_layout_stable_cycle_matches_plain_path(self):
        """build_layout_stable_trainable: the fully format-pinned grad/apply
        cycle (train+frozen+grads+moments placed once, jit in/out formats
        closed under the update — the r4 fix for 5.1 GiB of per-step HLO
        relayout copies at 19B) must produce the same losses and the same
        trained factors as the plain partitioned path, across two batch
        geometries."""
        from mlx_video_tpu.pipelines.denoise import relayout_params
        from mlx_video_tpu.pipelines.positions import create_position_grid
        from mlx_video_tpu.trainer.strategies import StrategyBatch
        from mlx_video_tpu.trainer.train_step import (
            apply_updates_trainable,
            build_layout_stable_trainable,
            grad_step_trainable,
            make_optimizer,
            partition_trainable,
        )

        cfg, params, mask, sb_big = self._setup()
        rng = np.random.default_rng(7)
        b, f, h, w = 1, 2, 2, 1  # second, smaller geometry
        s = f * h * w
        sb_small = StrategyBatch(
            video_latents=jnp.asarray(rng.normal(size=(b, s, cfg.in_channels)).astype(np.float32)),
            positions=jnp.asarray(create_position_grid(b, f, h, w)),
            context=jnp.asarray(rng.normal(size=(b, 8, cfg.caption_channels)).astype(np.float32)),
            context_mask=None,
            first_frame_token_mask=jnp.zeros((b, s), bool).at[:, : h * w].set(True),
            always_conditioned_mask=jnp.zeros((b, s), bool),
        )
        opt = make_optimizer(1e-3)
        key = jax.random.key(11)

        # plain path
        train0, frozen0 = partition_trainable(params, mask)
        ost0 = opt.init(train0)
        losses_plain = []
        tr_p, ost_p = train0, ost0
        for i, sb in enumerate((sb_big, sb_small, sb_big)):
            l, g = grad_step_trainable(tr_p, frozen0, sb, jax.random.fold_in(key, i), cfg)
            losses_plain.append(float(l))
            tr_p, ost_p = apply_updates_trainable(tr_p, ost_p, g, optimizer=opt, accum_steps=1)

        # layout-stable path — fresh leaves (the plain path's apply DONATED
        # its train/ost buffers; _setup is seed-deterministic so the values
        # are identical)
        cfg2, params2, mask2, _ = self._setup()
        train1, frozen1 = partition_trainable(params2, mask2)
        step = build_layout_stable_trainable(opt, cfg, train1, frozen1, [sb_big, sb_small])
        train1 = relayout_params(train1, step.train_formats)
        frozen1 = relayout_params(frozen1, step.frozen_formats)
        ost1 = relayout_params(opt.init(train1), step.ost_formats)
        losses_stable = []
        for i, sb in enumerate((sb_big, sb_small, sb_big)):
            l, g = step.grad(train1, frozen1, sb, jax.random.fold_in(key, i))
            losses_stable.append(float(l))
            train1, ost1 = step.apply(train1, ost1, g)

        np.testing.assert_allclose(losses_stable, losses_plain, rtol=1e-6)
        for k in tr_p:
            np.testing.assert_allclose(
                np.asarray(train1[k]), np.asarray(tr_p[k]), atol=1e-6, err_msg=k
            )
        # unknown geometry fails loudly, not with a silent recompile
        sb_other = jax.tree.map(lambda x: x, sb_small)._replace(
            video_latents=jnp.zeros((1, 2, cfg.in_channels), jnp.float32),
            positions=jnp.zeros((1, 3, 2, 2), jnp.float32),
            first_frame_token_mask=jnp.zeros((1, 2), bool),
            always_conditioned_mask=jnp.zeros((1, 2), bool),
        )
        with pytest.raises(KeyError):
            step.grad(train1, frozen1, sb_other, key)

    def test_fused_layout_stable_matches_plain_path(self):
        """build_fused_layout_stable: grad+update as ONE pinned program per
        geometry (grads never cross a program boundary — the 19B/r64 chip
        fit depends on it) must track the plain partitioned path exactly."""
        from mlx_video_tpu.pipelines.denoise import relayout_params
        from mlx_video_tpu.pipelines.positions import create_position_grid
        from mlx_video_tpu.trainer.strategies import StrategyBatch
        from mlx_video_tpu.trainer.train_step import (
            apply_updates_trainable,
            build_fused_layout_stable,
            grad_step_trainable,
            make_optimizer,
            partition_trainable,
        )

        cfg, params, mask, sb_big = self._setup()
        rng = np.random.default_rng(9)
        b, f, h, w = 1, 2, 2, 1
        s = f * h * w
        sb_small = StrategyBatch(
            video_latents=jnp.asarray(rng.normal(size=(b, s, cfg.in_channels)).astype(np.float32)),
            positions=jnp.asarray(create_position_grid(b, f, h, w)),
            context=jnp.asarray(rng.normal(size=(b, 8, cfg.caption_channels)).astype(np.float32)),
            context_mask=None,
            first_frame_token_mask=jnp.zeros((b, s), bool).at[:, : h * w].set(True),
            always_conditioned_mask=jnp.zeros((b, s), bool),
        )
        opt = make_optimizer(1e-3)
        key = jax.random.key(13)

        train0, frozen0 = partition_trainable(params, mask)
        ost0 = opt.init(train0)
        losses_plain = []
        tr_p, ost_p = train0, ost0
        for i, sb in enumerate((sb_big, sb_small, sb_big)):
            l, g = grad_step_trainable(tr_p, frozen0, sb, jax.random.fold_in(key, i), cfg)
            losses_plain.append(float(l))
            tr_p, ost_p = apply_updates_trainable(tr_p, ost_p, g, optimizer=opt, accum_steps=1)

        cfg2, params2, mask2, _ = self._setup()
        train1, frozen1 = partition_trainable(params2, mask2)
        step = build_fused_layout_stable(opt, cfg, train1, frozen1, [sb_big, sb_small])
        train1 = relayout_params(train1, step.train_formats)
        frozen1 = relayout_params(frozen1, step.frozen_formats)
        ost1 = relayout_params(opt.init(train1), step.ost_formats)
        losses_fused = []
        for i, sb in enumerate((sb_big, sb_small, sb_big)):
            l, train1, ost1 = step.step(train1, frozen1, ost1, sb, jax.random.fold_in(key, i))
            losses_fused.append(float(l))

        np.testing.assert_allclose(losses_fused, losses_plain, rtol=1e-6)
        for k in tr_p:
            np.testing.assert_allclose(
                np.asarray(train1[k]), np.asarray(tr_p[k]), atol=1e-6, err_msg=k
            )
