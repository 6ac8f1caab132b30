"""Drive: preemption-aware trainer in a real subprocess.

Parent: start a trainer subprocess (tiny model, dummy data, 500 steps),
send SIGTERM after the first steps complete, assert it checkpoints the
current step and exits 0; then resume in a SECOND subprocess and assert it
starts at the preempted step and finishes. This is the cross-process
version of tests/test_distributed.py::TestTrainerPreemption — the signal
arrives from OUTSIDE the process, as TPU maintenance/spot reclamation
delivers it.

    python scripts/drive_preempt.py     # prints DRIVE_PASS on success
"""

import os
import signal
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = Path("/tmp/preempt_drive_out")

CHILD = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import sys
from mlx_video_tpu.config import LTXModelType, tiny_test_config
from mlx_video_tpu.models.ltx.model import init_ltx_params
from mlx_video_tpu.trainer.config import TrainingConfig
from mlx_video_tpu.trainer.datasets import DummyDataset
from mlx_video_tpu.trainer.trainer import Trainer
from mlx_video_tpu.parallel.distributed import initialize_multihost

initialize_multihost()  # single-process no-op, same call the CLI makes

resume = "--resume" in sys.argv
steps = int(sys.argv[sys.argv.index("--steps") + 1])
cfg = TrainingConfig(
    model_repo="", steps=steps, batch_size=1, lr=1e-3, seed=0,
    dummy_width=64, dummy_height=64, dummy_num_frames=9, dummy_prompt_len=8,
    save_every=0, log_every=5, progress=False, resume=resume,
    output_dir="/tmp/preempt_drive_out",
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


def run_child(extra):
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + ":" + env.get("PYTHONPATH", "")
    # The preemption gate below readline()s the trainer's per-step print()
    # lines live; block-buffered pipe stdout would hold them until exit.
    env["PYTHONUNBUFFERED"] = "1"
    return subprocess.Popen(
        [sys.executable, "-c", CHILD] + extra,
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


def main():
    import shutil

    shutil.rmtree(OUT, ignore_errors=True)

    p = run_child(["--steps", "500"])
    # wait until a couple of steps have logged, then SIGTERM
    deadline = time.time() + 300
    lines = []
    while time.time() < deadline:
        line = p.stdout.readline()
        if line:
            lines.append(line)
            print("child1:", line, end="")
        if "loss" in line or "step 5" in line or "step=5" in line:
            break
    time.sleep(1.0)
    p.send_signal(signal.SIGTERM)
    out, _ = p.communicate(timeout=300)
    print(out)
    assert p.returncode == 0, f"child1 rc={p.returncode}"
    marker = OUT / "PREEMPTED"
    assert marker.exists(), "no PREEMPTED marker"
    stop = int(marker.read_text())
    assert 0 < stop < 500, stop
    ckpts = list(OUT.glob(f"*step_{stop}*"))
    assert ckpts, f"no checkpoint for step {stop}: {list(OUT.iterdir())}"
    print(f"OK preempted at step {stop}, checkpoint {ckpts[0].name}")

    p2 = run_child(["--steps", str(stop + 3), "--resume"])
    out2, _ = p2.communicate(timeout=600)
    print(out2)
    assert p2.returncode == 0, f"child2 rc={p2.returncode}"
    assert f"START_STEP {stop}" in out2, "resume did not pick up preempted step"
    assert "CHILD_DONE" in out2
    assert list(OUT.glob(f"*step_{stop + 3}*")), "resumed run did not finish"
    print("OK resumed at", stop, "and completed to", stop + 3)
    print("DRIVE_PASS")


if __name__ == "__main__":
    main()
