"""Multi-host orchestration: distributed init, preemption guard, trainer
checkpoint-and-exit + exact restart (parallel/distributed.py).

Everything here runs single-process; the multi-process branches
(process_allgather agreement, gather-on-save) are exercised structurally —
they reduce to the local path when process_count == 1, which is exactly the
contract the code documents.
"""

import os
import signal
import threading
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import pytest

from mlx_video_tpu.config import LTXModelType, tiny_test_config
from mlx_video_tpu.models.ltx.model import init_ltx_params
from mlx_video_tpu.parallel.distributed import (
    PreemptionGuard,
    all_hosts_agree,
    initialize_multihost,
    is_primary_host,
)
from mlx_video_tpu.trainer import checkpoints as ckpt
from mlx_video_tpu.trainer.config import TrainingConfig
from mlx_video_tpu.trainer.datasets import DummyDataset
from mlx_video_tpu.trainer.trainer import Trainer


class TestInitializeMultihost:
    def test_single_process_noop(self):
        assert initialize_multihost() is False

    def test_partial_spec_raises(self):
        with pytest.raises(ValueError, match="coordinator_address"):
            initialize_multihost(num_processes=2)

    def test_any_partial_spec_raises(self):
        """EVERY partial combination must error — silently falling back to
        single-process would split a multi-host job into independent
        single-host jobs with wrong global batch and divergent checkpoints."""
        with pytest.raises(ValueError, match="num_processes"):
            initialize_multihost(coordinator_address="h:1234", process_id=0)
        with pytest.raises(ValueError, match="process_id"):
            initialize_multihost(coordinator_address="h:1234", num_processes=2)
        with pytest.raises(ValueError, match="missing"):
            initialize_multihost(process_id=1)
        # num_processes=1 alone is a legitimate single-process declaration
        assert initialize_multihost(num_processes=1) is False

    def test_single_process_helpers(self):
        assert is_primary_host()
        assert all_hosts_agree(42)


class TestPreemptionGuard:
    def test_sigterm_sets_flag_and_restores_handler(self):
        before = signal.getsignal(signal.SIGTERM)
        with PreemptionGuard() as guard:
            assert not guard.preempted
            assert not guard.should_checkpoint()
            os.kill(os.getpid(), signal.SIGTERM)
            time.sleep(0.05)
            assert guard.preempted
            assert guard.should_checkpoint()
        assert signal.getsignal(signal.SIGTERM) is before

    def test_install_idempotent(self):
        guard = PreemptionGuard()
        guard.install()
        first = signal.getsignal(signal.SIGTERM)
        guard.install()
        assert signal.getsignal(signal.SIGTERM) is first
        guard.uninstall()
        assert signal.getsignal(signal.SIGTERM) is not first


def _tiny_trainer(tmp_path, steps, **cfg_kw):
    cfg = TrainingConfig(
        model_repo="", steps=steps, batch_size=1, lr=1e-3, seed=0,
        dummy_width=64, dummy_height=64, dummy_num_frames=9, dummy_prompt_len=8,
        save_every=0, log_every=1000, progress=False,
        output_dir=str(tmp_path), **cfg_kw,
    )
    mcfg = tiny_test_config(LTXModelType.VideoOnly)
    params = init_ltx_params(jax.random.key(0), mcfg, dtype=jnp.float32)
    ds = DummyDataset(
        width=64, height=64, num_frames=9, dataset_length=8,
        latent_dim=16, prompt_embed_dim=48, prompt_sequence_length=8,
    )
    return Trainer(cfg, model_config=mcfg, params=params, dataset=ds), mcfg, params


class TestTrainerPreemption:
    def test_sigterm_checkpoints_and_exits(self, tmp_path):
        tr, mcfg, params = _tiny_trainer(tmp_path, steps=500)

        # Deliver SIGTERM once the first step has gone through.
        def fire():
            time.sleep(3.0)
            os.kill(os.getpid(), signal.SIGTERM)

        t = threading.Thread(target=fire, daemon=True)
        t.start()
        tr.train()
        t.join()

        marker = tmp_path / "PREEMPTED"
        assert marker.exists(), "preemption marker missing"
        stop_step = int(marker.read_text())
        assert 0 < stop_step < 500, "trainer did not exit early"
        latest = ckpt.latest_checkpoint(tmp_path)
        assert latest is not None
        assert f"step_{stop_step}" in latest.name

        # Restart resumes exactly at the preempted step and completes.
        tr2, _, _ = _tiny_trainer(
            tmp_path, steps=stop_step + 2, resume=True, handle_preemption=False
        )
        assert tr2.start_step == stop_step
        tr2.train()
        assert ckpt.latest_checkpoint(tmp_path) is not None
        assert f"step_{stop_step + 2}" in ckpt.latest_checkpoint(tmp_path).name

    def test_preemption_respects_accumulation_window(self, tmp_path):
        """SIGTERM mid-window must defer to the next boundary: stopping with
        a partial gradient sum would drop micro-batches and under-scale the
        first post-resume update."""
        tr, _, _ = _tiny_trainer(tmp_path, steps=500, grad_accum_steps=4)

        def fire():
            time.sleep(3.0)
            os.kill(os.getpid(), signal.SIGTERM)

        t = threading.Thread(target=fire, daemon=True)
        t.start()
        tr.train()
        t.join()
        marker = tmp_path / "PREEMPTED"
        assert marker.exists()
        stop_step = int(marker.read_text())
        assert stop_step % 4 == 0, (
            f"preempted at step {stop_step}, inside an accumulation window"
        )

    def test_handler_disabled(self, tmp_path):
        tr, _, _ = _tiny_trainer(tmp_path, steps=2, handle_preemption=False)
        before = signal.getsignal(signal.SIGTERM)
        tr.train()
        assert signal.getsignal(signal.SIGTERM) is before
        assert not (tmp_path / "PREEMPTED").exists()
