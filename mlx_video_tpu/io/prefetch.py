"""Threaded file prefetching: ctypes bindings for the native C++ pool.

Native-runtime counterpart of the reference's synchronous per-clip loading
(reference: mlx_video/mlx_trainer/datasets.py:131-283). The C++ pool
(mlx_video_tpu/native/prefetch.cpp) preads files on background threads so
batch N+1's disk IO overlaps batch N's on-device train step. A pure-Python
``ThreadPoolExecutor`` fallback keeps everything working where no C++
toolchain exists.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import tempfile
from pathlib import Path
from typing import Dict, Optional

_NATIVE_SRC = Path(__file__).resolve().parent.parent / "native" / "prefetch.cpp"
_LIB: Optional[ctypes.CDLL] = None
_LIB_FAILED = False


def _build_dir() -> Path:
    override = os.environ.get("MLX_VIDEO_TPU_NATIVE_DIR")
    if override:
        return Path(override)
    return Path(tempfile.gettempdir()) / f"mlx_video_tpu_native_py{sys.version_info[0]}{sys.version_info[1]}"


def build_native(force: bool = False) -> Optional[Path]:
    """Compile prefetch.cpp into a shared library (cached by source mtime).

    Returns the .so path, or None if no working C++ toolchain is available.
    """
    out_dir = _build_dir()
    out_dir.mkdir(parents=True, exist_ok=True)
    lib_path = out_dir / "libmlxv_prefetch.so"
    if (
        not force
        and lib_path.exists()
        and lib_path.stat().st_mtime >= _NATIVE_SRC.stat().st_mtime
    ):
        return lib_path
    cmd = [
        os.environ.get("CXX", "g++"),
        "-O2",
        "-std=c++17",
        "-shared",
        "-fPIC",
        "-pthread",
        str(_NATIVE_SRC),
        "-o",
        str(lib_path),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (OSError, subprocess.SubprocessError):
        return None
    return lib_path


def _load_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    if os.environ.get("MLX_VIDEO_TPU_NO_NATIVE") == "1":
        _LIB_FAILED = True
        return None
    lib_path = build_native()
    if lib_path is None:
        _LIB_FAILED = True
        return None
    try:
        lib = ctypes.CDLL(str(lib_path))
    except OSError:
        _LIB_FAILED = True
        return None
    lib.pf_create.restype = ctypes.c_void_p
    lib.pf_create.argtypes = [ctypes.c_int]
    lib.pf_submit.restype = ctypes.c_int64
    lib.pf_submit.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.pf_wait.restype = ctypes.c_int
    lib.pf_wait.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_uint64),
    ]
    lib.pf_release.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.pf_destroy.argtypes = [ctypes.c_void_p]
    lib.pf_advise.restype = ctypes.c_int
    lib.pf_advise.argtypes = [ctypes.c_char_p]
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return _load_lib() is not None


def advise_willneed(path) -> None:
    """Hint the page cache to read ahead a file about to be mmap-streamed
    (used by the safetensors weight loaders)."""
    lib = _load_lib()
    if lib is not None:
        lib.pf_advise(str(path).encode())


class FilePrefetcher:
    """Submit file paths for background reads; ``get`` returns the bytes.

    Uses the native pool when available, else a ThreadPoolExecutor. One
    outstanding read per distinct path; ``get`` is blocking and single-use
    (the buffer is released after return).
    """

    def __init__(self, num_threads: int = 4) -> None:
        self._lib = _load_lib()
        self._tickets: Dict[str, int] = {}
        if self._lib is not None:
            self._pool = self._lib.pf_create(num_threads)
            self._futures = None
        else:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = None
            self._executor = ThreadPoolExecutor(max_workers=num_threads)
            self._futures = {}

    @property
    def is_native(self) -> bool:
        return self._lib is not None

    def submit(self, path) -> None:
        key = str(path)
        if self._lib is not None:
            if key not in self._tickets:
                self._tickets[key] = self._lib.pf_submit(self._pool, key.encode())
        else:
            if key not in self._futures:
                self._futures[key] = self._executor.submit(Path(key).read_bytes)

    def get(self, path) -> bytes:
        key = str(path)
        if self._lib is not None:
            ticket = self._tickets.pop(key, None)
            if ticket is None:
                ticket = self._lib.pf_submit(self._pool, key.encode())
            data = ctypes.POINTER(ctypes.c_uint8)()
            size = ctypes.c_uint64()
            err = self._lib.pf_wait(self._pool, ticket, ctypes.byref(data), ctypes.byref(size))
            if err != 0:
                raise OSError(-err, os.strerror(-err), key)
            try:
                return ctypes.string_at(data, size.value)
            finally:
                self._lib.pf_release(self._pool, ticket)
        fut = self._futures.pop(key, None)
        if fut is None:
            return Path(key).read_bytes()
        return fut.result()

    def close(self) -> None:
        if self._lib is not None and self._pool is not None:
            self._lib.pf_destroy(self._pool)
            self._pool = None
        elif self._futures is not None:
            self._executor.shutdown(wait=False)

    def __enter__(self) -> "FilePrefetcher":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def __del__(self) -> None:  # pragma: no cover - GC safety net
        try:
            self.close()
        except Exception:
            pass
