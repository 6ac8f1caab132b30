"""Trainer auxiliary utilities: progress, config display, memory/seed, hub,
captioning, quantization metadata, video IO.

Behavioral spec: reference mlx_video/mlx_trainer/{progress,config_display,
gpu_utils,hf_hub_utils,captioning,quantization,video_utils}.py.
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time
from pathlib import Path
from typing import Dict, List, Optional


# -- progress (reference: mlx_trainer/progress.py) --------------------------


@dataclasses.dataclass
class ProgressStats:
    step: int
    total: int
    loss: float
    step_time: float


class TrainingProgress:
    """Minimal terminal progress line (rich is optional)."""

    def __init__(self, total: int, enabled: bool = True):
        self.total = total
        self.enabled = enabled
        self._start = time.time()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        if self.enabled:
            sys.stderr.write("\n")

    def update(self, stats: ProgressStats) -> None:
        if not self.enabled:
            return
        done = stats.step + 1
        eta = (time.time() - self._start) / max(done, 1) * max(self.total - done, 0)
        sys.stderr.write(
            f"\rstep {done}/{self.total} loss={stats.loss:.4f} "
            f"{stats.step_time:.2f}s/step eta={eta:.0f}s   "
        )
        sys.stderr.flush()


# -- config display (reference: mlx_trainer/config_display.py) ---------------


def print_config(cfg, file=None) -> None:
    file = file or sys.stdout
    print("Training configuration:", file=file)
    for field in dataclasses.fields(cfg):
        value = getattr(cfg, field.name)
        if value is not None and value != field.default:
            print(f"  {field.name}: {value}", file=file)


# -- memory / seed (reference: mlx_trainer/gpu_utils.py) --------------------


def log_device_memory(stage: str = "") -> None:
    from mlx_video_tpu.utils.profiling import log_memory

    log_memory(stage)


def set_seed(seed: int):
    import jax

    return jax.random.key(seed)


# -- hub push (reference: mlx_trainer/hf_hub_utils.py) -----------------------


def push_to_hub(output_dir: Path, model_id: str, token: Optional[str] = None) -> None:
    from huggingface_hub import HfApi

    api = HfApi(token=token)
    api.create_repo(model_id, exist_ok=True)
    api.upload_folder(folder_path=str(output_dir), repo_id=model_id)


# -- quantization metadata (reference: mlx_trainer/quantization.py) ----------


def read_quantization_metadata(model_path: Path) -> Optional[Dict]:
    """Read quantization.json next to the weights (reference format)."""
    for candidate in (Path(model_path), Path(model_path).parent):
        meta = candidate / "quantization.json"
        if meta.exists():
            return json.loads(meta.read_text())
    return None


# -- captioning (reference: mlx_trainer/captioning.py) -----------------------


def caption_image(
    image,
    model_name: str = "Salesforce/blip-image-captioning-base",
    max_new_tokens: Optional[int] = None,
) -> str:
    """Caption a single frame via a transformers captioner (the reference uses
    mlx_vlm SmolVLM with a transformers fallback; only the transformers
    backend exists on TPU hosts)."""
    import numpy as np

    captioner = _get_captioner(model_name)
    arr = np.asarray(image)
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
    from PIL import Image

    kwargs = {}
    if max_new_tokens is not None:
        kwargs["generate_kwargs"] = {"max_new_tokens": int(max_new_tokens)}
    result = captioner(Image.fromarray(arr), **kwargs)
    return result[0]["generated_text"] if result else ""


_CAPTIONERS: Dict[str, object] = {}


def _get_captioner(model_name: str):
    if model_name not in _CAPTIONERS:
        from transformers import pipeline

        _CAPTIONERS[model_name] = pipeline("image-to-text", model=model_name)
    return _CAPTIONERS[model_name]


def caption_video(video_path: Path, model_name: str = "Salesforce/blip-image-captioning-base") -> str:
    """Caption the middle frame of a clip (reference captioning strategy)."""
    from mlx_video_tpu.io.media import load_video

    frames = load_video(video_path)
    return caption_image(frames[len(frames) // 2], model_name)


# -- video utils (reference: mlx_trainer/video_utils.py) ---------------------


def read_video(path: Path, frame_cap: Optional[int] = None):
    from mlx_video_tpu.io.media import load_video

    return load_video(path, frame_cap=frame_cap)


def save_video(path: Path, frames, fps: float = 24.0) -> None:
    import numpy as np

    from mlx_video_tpu.io.media import VideoWriter

    frames = np.asarray(frames)
    if frames.dtype != np.uint8:
        frames = (np.clip(frames, 0, 1) * 255).astype(np.uint8)
    with VideoWriter(path, frames.shape[2], frames.shape[1], fps) as w:
        w.write(frames)
