"""Drive: REAL multi-process distributed training with preemption + resume.

Two OS processes form one JAX distributed job (coordinator on localhost,
Gloo CPU collectives, 4 virtual devices each -> 8 global devices), train a
tiny model GSPMD-sharded over a global (2, 1, 4) = (data, fsdp, tensor)
mesh, then SIGTERM arrives on ONE process only:

- PreemptionGuard OR-reduces the local flags across processes
  (parallel/distributed.py), so BOTH processes agree to checkpoint at the
  same step — the cross-host-agreed stop the docstring promises;
- save_checkpoint gathers non-addressable shards on every process and
  process 0 writes (trainer/checkpoints.py);
- a second 2-process job resumes from that step and completes.

This exercises the exact multi-host failure-recovery path SURVEY §5 calls
for, minus real TPU hardware: jax.distributed + cross-process collectives
+ agreed preemption + exact resume are all the real thing; only the
interconnect differs.

    python scripts/drive_multihost.py     # prints DRIVE_PASS on success
"""

import os
import signal
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = Path("/tmp/multihost_drive_out")
def _free_port() -> int:
    import socket

    with socket.socket() as sk:
        sk.bind(("127.0.0.1", 0))
        return sk.getsockname()[1]


COORD = f"127.0.0.1:{_free_port()}"

CHILD = r"""
import os, sys
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from mlx_video_tpu.config import LTXModelType, tiny_test_config
from mlx_video_tpu.models.ltx.model import init_ltx_params
from mlx_video_tpu.trainer.config import TrainingConfig
from mlx_video_tpu.trainer.datasets import DummyDataset
from mlx_video_tpu.trainer.trainer import Trainer
from mlx_video_tpu.parallel.distributed import initialize_multihost, is_primary_host

pid = int(sys.argv[sys.argv.index("--pid") + 1])
steps = int(sys.argv[sys.argv.index("--steps") + 1])
resume = "--resume" in sys.argv
ok = initialize_multihost(
    coordinator_address="COORD_ADDR", num_processes=2, process_id=pid
)
assert ok, "distributed runtime failed to initialize"
assert jax.process_count() == 2 and jax.device_count() == 8, (
    jax.process_count(), jax.device_count())
print(f"INIT pid={pid} primary={is_primary_host()} devices={jax.device_count()}", flush=True)

cfg = TrainingConfig(
    model_repo="", steps=steps, batch_size=2, lr=1e-3, seed=0,
    dummy_width=64, dummy_height=64, dummy_num_frames=9, dummy_prompt_len=8,
    save_every=0, log_every=2, progress=False, resume=resume,
    output_dir="OUT_DIR", mesh_shape=(2, 1, 4), handle_preemption=True,
)
mcfg = tiny_test_config(LTXModelType.VideoOnly)
params = init_ltx_params(jax.random.key(0), mcfg, dtype=jnp.float32)
ds = DummyDataset(width=64, height=64, num_frames=9, dataset_length=8,
                  latent_dim=16, prompt_embed_dim=48, prompt_sequence_length=8)
tr = Trainer(cfg, model_config=mcfg, params=params, dataset=ds)
print("START_STEP", tr.start_step, flush=True)
tr.train()
print("CHILD_DONE", flush=True)
"""


_PROCS = []  # every child ever spawned; main() reaps leftovers on ANY exit


def run_child(pid: int, steps: int, resume: bool = False) -> subprocess.Popen:
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + ":" + env.get("PYTHONPATH", "")
    # The parent gates on the child's per-step print() lines via readline;
    # block-buffered child stdout (the default for a pipe) would hold them
    # below the pipe buffer until exit and deadlock the preemption gate.
    env["PYTHONUNBUFFERED"] = "1"
    code = CHILD.replace("COORD_ADDR", COORD).replace("OUT_DIR", str(OUT))
    args = [sys.executable, "-c", code, "--pid", str(pid), "--steps", str(steps)]
    if resume:
        args.append("--resume")
    proc = subprocess.Popen(
        args, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True
    )
    _PROCS.append(proc)
    return proc


def main():
    import shutil

    shutil.rmtree(OUT, ignore_errors=True)
    try:
        _main_body(total=60)
    finally:
        # no child may outlive the drive (a peer blocked in a collective
        # would otherwise linger after an assertion failure)
        for proc in _PROCS:
            if proc.poll() is None:
                proc.kill()


def _main_body(total):
    p0 = run_child(0, total)
    p1 = run_child(1, total)

    # wait until proc 0 has logged a few steps, then SIGTERM proc 0 ONLY —
    # proc 1 must stop too, via the cross-process OR-reduction.
    deadline = time.time() + 600
    reached = False
    while time.time() < deadline:
        line = p0.stdout.readline()
        if not line:  # EOF: child died early — surface, don't spin
            assert p0.poll() is None, f"child 0 died rc={p0.returncode}"
            time.sleep(0.1)
            continue
        print("p0:", line, end="")
        if "step 10" in line or "step 12" in line:
            reached = True
            break
    assert reached, "child 0 never reached step 10"
    p0.send_signal(signal.SIGTERM)
    out0, _ = p0.communicate(timeout=600)
    out1, _ = p1.communicate(timeout=600)
    print(out0)
    print(out1)
    assert p0.returncode == 0, f"proc0 rc={p0.returncode}"
    assert p1.returncode == 0, f"proc1 rc={p1.returncode}"

    marker = OUT / "PREEMPTED"
    assert marker.exists(), "no PREEMPTED marker"
    stop = int(marker.read_text())
    assert 0 < stop < total, stop
    # BOTH processes reported the SAME checkpoint step (cross-host agreement)
    assert f"saved step {stop}" in out0, "proc0 did not checkpoint"
    assert f"saved step {stop}" in out1, "proc1 (no signal received!) did not stop at the agreed step"
    assert list(OUT.glob(f"*step_{stop}*")), f"no checkpoint for step {stop}"
    print(f"OK both processes agreed on preempt step {stop}")

    # restart both; they resume at the agreed step and complete
    p0 = run_child(0, total, resume=True)
    p1 = run_child(1, total, resume=True)
    out0, _ = p0.communicate(timeout=900)
    out1, _ = p1.communicate(timeout=900)
    print(out0)
    print(out1)
    assert p0.returncode == 0 and p1.returncode == 0, (p0.returncode, p1.returncode)
    for out in (out0, out1):
        assert f"START_STEP {stop}" in out, "resume did not pick up the agreed step"
        assert "CHILD_DONE" in out
    assert list(OUT.glob(f"*step_{total}*")), "resumed job did not finish"
    print(f"OK resumed both processes at {stop} and completed to {total}")
    print("DRIVE_PASS")


if __name__ == "__main__":
    main()
