"""Streaming safetensors reader/writer.

Behavioral spec: reference mlx_video/models/ltx/ltx.py:747-885 (header parse
+ mmap chunked load, bf16-via-uint16 view) and ltx.py:566-590 (_scan_keys).

TPU-native: tensors are returned as NumPy arrays (bf16 via ml_dtypes, which
NumPy understands through jax's dtype registration); ``jnp.asarray`` on the
result is zero-copy on host. Loading is lazy per-tensor — a 40 GB shard is
mmapped once and individual tensors are materialized on demand, so the
parameter pytree builder can stream layer stacks without 2x peak memory.
"""

from __future__ import annotations

import json
import mmap
import struct
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Sequence, Tuple, Union

import ml_dtypes
import numpy as np

_DTYPES = {
    "F64": np.float64,
    "F32": np.float32,
    "F16": np.float16,
    "BF16": ml_dtypes.bfloat16,
    "I64": np.int64,
    "I32": np.int32,
    "I16": np.int16,
    "I8": np.int8,
    "U8": np.uint8,
    "U16": np.uint16,
    "U32": np.uint32,
    "U64": np.uint64,
    "BOOL": np.bool_,
    "F8_E4M3": ml_dtypes.float8_e4m3fn,
    "F8_E5M2": ml_dtypes.float8_e5m2,
}
_DTYPE_NAMES = {np.dtype(v): k for k, v in _DTYPES.items()}


class SafetensorsReader:
    """Lazy mmap-backed reader for one .safetensors file."""

    def __init__(self, path: Union[str, Path]):
        self.path = Path(path)
        try:  # native readahead hint for the sequential mmap stream
            from mlx_video_tpu.io.prefetch import advise_willneed

            advise_willneed(self.path)
        except Exception:
            pass
        with open(self.path, "rb") as f:
            header_len = struct.unpack("<Q", f.read(8))[0]
            header = json.loads(f.read(header_len))
        self.metadata: Dict[str, str] = header.pop("__metadata__", {}) or {}
        self._entries: Dict[str, dict] = header
        self._data_base = 8 + header_len
        self._file = open(self.path, "rb")
        self._mm = mmap.mmap(self._file.fileno(), 0, access=mmap.ACCESS_READ)

    def keys(self) -> List[str]:
        return list(self._entries.keys())

    def __contains__(self, key: str) -> bool:
        return key in self._entries

    def shape(self, key: str) -> Tuple[int, ...]:
        return tuple(self._entries[key]["shape"])

    def dtype(self, key: str):
        return _DTYPES[self._entries[key]["dtype"]]

    def get(self, key: str) -> np.ndarray:
        """Materialize one tensor (copies out of the mmap)."""
        meta = self._entries[key]
        dt = _DTYPES[meta["dtype"]]
        start, end = meta["data_offsets"]
        buf = self._mm[self._data_base + start : self._data_base + end]
        arr = np.frombuffer(buf, dtype=dt)
        return arr.reshape(tuple(meta["shape"]))

    def items(self) -> Iterator[Tuple[str, np.ndarray]]:
        for k in self._entries:
            yield k, self.get(k)

    def close(self) -> None:
        self._mm.close()
        self._file.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def parse_safetensors_bytes(data: bytes) -> Dict[str, np.ndarray]:
    """Parse a whole safetensors payload already in memory (e.g. delivered by
    the native file prefetcher) into name -> array. Arrays are views into
    ``data`` — copy if the buffer's lifetime is shorter than the arrays'."""
    header_len = struct.unpack("<Q", data[:8])[0]
    header = json.loads(data[8 : 8 + header_len])
    header.pop("__metadata__", None)
    base = 8 + header_len
    out: Dict[str, np.ndarray] = {}
    for key, meta in header.items():
        dt = _DTYPES[meta["dtype"]]
        start, end = meta["data_offsets"]
        arr = np.frombuffer(data, dtype=dt, count=(end - start) // np.dtype(dt).itemsize,
                            offset=base + start)
        out[key] = arr.reshape(tuple(meta["shape"]))
    return out


def scan_keys(paths: Sequence[Union[str, Path]]) -> set:
    """Union of tensor keys across files without materializing tensors
    (reference: ltx.py:566-590)."""
    keys: set = set()
    for p in paths:
        try:
            with open(p, "rb") as f:
                header_len = struct.unpack("<Q", f.read(8))[0]
                header = json.loads(f.read(header_len))
            keys.update(k for k in header if k != "__metadata__")
        except Exception:
            continue
    return keys


def read_metadata(path: Union[str, Path]) -> Dict[str, str]:
    with open(path, "rb") as f:
        header_len = struct.unpack("<Q", f.read(8))[0]
        header = json.loads(f.read(header_len))
    return header.get("__metadata__", {}) or {}


def save_safetensors(
    path: Union[str, Path],
    tensors: Dict[str, np.ndarray],
    metadata: Optional[Dict[str, str]] = None,
) -> None:
    """Write a .safetensors file (bf16 and fp8 supported via ml_dtypes)."""
    entries = {}
    offset = 0
    order = list(tensors.keys())
    blobs = []
    for k in order:
        arr = np.ascontiguousarray(tensors[k])
        dt_name = _DTYPE_NAMES.get(arr.dtype)
        if dt_name is None:
            raise ValueError(f"Unsupported dtype for safetensors: {arr.dtype} ({k})")
        nbytes = arr.nbytes
        entries[k] = {
            "dtype": dt_name,
            "shape": list(arr.shape),
            "data_offsets": [offset, offset + nbytes],
        }
        blobs.append(arr)
        offset += nbytes
    header: dict = dict(entries)
    if metadata:
        header["__metadata__"] = {str(k): str(v) for k, v in metadata.items()}
    header_bytes = json.dumps(header).encode("utf-8")
    # pad header to 8-byte alignment (spec recommendation)
    pad = (8 - len(header_bytes) % 8) % 8
    header_bytes += b" " * pad
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(header_bytes)))
        f.write(header_bytes)
        for arr in blobs:
            f.write(arr.tobytes())
