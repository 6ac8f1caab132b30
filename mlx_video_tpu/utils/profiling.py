"""Phase timing, UI event stream, and TPU trace capture.

Behavioral spec: reference mlx_video/generate.py:43-94 (_PhaseTimer,
MLX_VIDEO_UI_EVENT json stream), 396-407 (GPU capture -> here
``jax.profiler`` traces), 4154-4180 (--profile report/JSON dump).
"""

from __future__ import annotations

import contextlib
import json
import os
import sys
import time
from pathlib import Path
from typing import Dict, Optional


# In-process subscribers (beyond the reference's stdout stream): callables
# receiving every ui_event payload regardless of the env gates. Used by the
# serve streaming endpoint to forward denoise_step/phase events per request.
import threading as _threading

_SINKS: list = []
_SINKS_LOCK = _threading.Lock()


def add_event_sink(fn) -> None:
    with _SINKS_LOCK:
        _SINKS.append(fn)


def remove_event_sink(fn) -> None:
    with _SINKS_LOCK:
        if fn in _SINKS:
            _SINKS.remove(fn)


def has_event_sinks() -> bool:
    """Whether anything subscribes in-process — producers of EXPENSIVE
    payloads (e.g. base64 preview frames) should check before building."""
    return bool(_SINKS)


def ui_event(payload: dict) -> None:
    """Machine-readable event line, gated by MLX_VIDEO_UI_JSON=1
    (reference: generate.py:43-61). In-process sinks always receive it."""
    if os.environ.get("MLX_VIDEO_UI_JSON") == "1":
        print("MLX_VIDEO_UI_EVENT " + json.dumps(payload), flush=True)
    if _SINKS:
        with _SINKS_LOCK:
            sinks = list(_SINKS)
        for fn in sinks:
            try:
                fn(payload)
            except Exception:  # noqa: BLE001 — a dead sink must not kill events
                pass


def progress_echo_enabled() -> bool:
    """Whether per-step denoise progress should be emitted
    (reference: generate.py:43-61 UI json + 765-775 plain echo). Also true
    while an in-process sink is subscribed (serve streaming): the denoise
    scan's progress callback is a trace-time static, so the first streamed
    request compiles the progress variant and later ones reuse it."""
    return (
        os.environ.get("MLX_VIDEO_UI_JSON") == "1"
        or os.environ.get("MLX_VIDEO_PROGRESS_ECHO") == "1"
        or bool(_SINKS)
    )


def step_event(step: int, total: int, sigma: Optional[float] = None) -> None:
    """Per-denoise-step progress line (reference: generate.py:765-775 echo,
    858-876 per-step ETA). Called from a ``jax.debug.callback`` inside the
    scanned sigma loop, so progress streams while the loop stays one
    compiled program."""
    if os.environ.get("MLX_VIDEO_PROGRESS_ECHO") == "1":
        try:
            every = int(os.environ.get("MLX_VIDEO_PROGRESS_ECHO_EVERY", "1") or 1)
        except ValueError:
            every = 1
        if step % every == 0 or step == total:
            extra = f" sigma={sigma:.4f}" if sigma is not None else ""
            print(f"progress: denoise step {step}/{total}{extra}", flush=True)
    payload = {"kind": "denoise_step", "step": step, "total": total}
    if sigma is not None:
        payload["sigma"] = sigma
    ui_event(payload)


class PhaseTimer:
    """Accumulates wall-clock per named phase (reference: generate.py:64-94)."""

    def __init__(self) -> None:
        self.phases: Dict[str, float] = {}
        self._order: list = []

    @contextlib.contextmanager
    def phase(self, name: str):
        start = time.perf_counter()
        try:
            yield
        finally:
            elapsed = time.perf_counter() - start
            if name not in self.phases:
                self._order.append(name)
            self.phases[name] = self.phases.get(name, 0.0) + elapsed
            ui_event({"kind": "phase", "phase": name, "seconds": elapsed})

    @property
    def total(self) -> float:
        return sum(self.phases.values())

    def report(self, file=None) -> None:
        file = file or sys.stdout
        print("\nPhase timing:", file=file)
        for name in self._order:
            secs = self.phases[name]
            pct = 100.0 * secs / self.total if self.total else 0.0
            print(f"  {name:<24} {secs:8.2f}s  {pct:5.1f}%", file=file)
        print(f"  {'total':<24} {self.total:8.2f}s", file=file)

    def dump_json(self, path) -> None:
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        with open(path, "w") as f:
            json.dump({"phases": self.phases, "total": self.total}, f, indent=2)


@contextlib.contextmanager
def tpu_trace(trace_dir: Optional[str]):
    """XPlane/TensorBoard profiler trace — the TPU equivalent of the
    reference's Metal GPU capture (reference: generate.py:396-407)."""
    if not trace_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def log_memory(stage: str, enabled: bool = True, file=None) -> None:
    """Device memory telemetry (reference: generate.py:311-335)."""
    if not enabled:
        return
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        in_use = stats.get("bytes_in_use", 0) / 1024**3
        peak = stats.get("peak_bytes_in_use", 0) / 1024**3
        limit = stats.get("bytes_limit", 0) / 1024**3
        print(
            f"Memory ({stage}): in_use={in_use:.2f}GB peak={peak:.2f}GB limit={limit:.2f}GB",
            file=file or sys.stderr,
        )
    except Exception:
        pass
