"""Native C++ file prefetcher + its dataset/weights integration."""

import numpy as np
import pytest

import mlx_video_tpu.io.prefetch as pf
from mlx_video_tpu.io.prefetch import FilePrefetcher, native_available
from mlx_video_tpu.io.safetensors import (
    SafetensorsReader,
    parse_safetensors_bytes,
    save_safetensors,
)


def test_native_library_builds():
    """g++ is part of the toolchain; the pool must come up native."""
    assert native_available()


def test_prefetch_roundtrip(tmp_path):
    files = []
    rng = np.random.default_rng(0)
    for i in range(6):
        p = tmp_path / f"blob_{i}.bin"
        p.write_bytes(rng.bytes(1000 * (i + 1) + i))
        files.append(p)
    with FilePrefetcher(num_threads=3) as fetcher:
        assert fetcher.is_native
        for p in files:
            fetcher.submit(p)
        # out-of-order consumption
        for p in reversed(files):
            assert fetcher.get(p) == p.read_bytes()


def test_prefetch_unsubmitted_get_and_missing(tmp_path):
    p = tmp_path / "late.bin"
    p.write_bytes(b"hello prefetch")
    with FilePrefetcher() as fetcher:
        assert fetcher.get(p) == b"hello prefetch"  # get without submit
        with pytest.raises(OSError):
            fetcher.get(tmp_path / "nope.bin")


def test_prefetch_python_fallback(tmp_path, monkeypatch):
    monkeypatch.setattr(pf, "_LIB", None)
    monkeypatch.setattr(pf, "_LIB_FAILED", True)
    p = tmp_path / "fb.bin"
    p.write_bytes(b"fallback bytes")
    with FilePrefetcher() as fetcher:
        assert not fetcher.is_native
        fetcher.submit(p)
        assert fetcher.get(p) == b"fallback bytes"


def test_parse_safetensors_bytes(tmp_path, rng):
    tensors = {
        "a": rng.normal(size=(3, 5)).astype(np.float32),
        "b": (rng.normal(size=(4,)) * 10).astype(np.int32),
    }
    path = tmp_path / "t.safetensors"
    save_safetensors(path, tensors)
    parsed = parse_safetensors_bytes(path.read_bytes())
    with SafetensorsReader(path) as r:
        for k in tensors:
            np.testing.assert_array_equal(parsed[k], r.get(k))


def test_iter_batches_prefetch_matches_sync(tmp_path, rng):
    from mlx_video_tpu.trainer.datasets import PrecomputedDataset, iter_batches

    (tmp_path / "latents").mkdir()
    (tmp_path / "conditions").mkdir()
    for i in range(5):
        save_safetensors(
            tmp_path / "latents" / f"clip_{i}.safetensors",
            {"latents": rng.normal(size=(4, 2, 3, 3)).astype(np.float32)},
        )
        save_safetensors(
            tmp_path / "conditions" / f"clip_{i}.safetensors",
            {"video_prompt_embeds": rng.normal(size=(7, 16)).astype(np.float32)},
        )
    ds = PrecomputedDataset(tmp_path)
    sync = list(iter_batches(ds, batch_size=2, shuffle=True, seed=3, prefetch=0))
    pre = list(iter_batches(ds, batch_size=2, shuffle=True, seed=3, prefetch=2))
    assert len(sync) == len(pre) == 3
    for a, b in zip(sync, pre):
        np.testing.assert_array_equal(a.latents["latents"], b.latents["latents"])
        np.testing.assert_array_equal(
            a.conditions["video_prompt_embeds"], b.conditions["video_prompt_embeds"]
        )
    assert ds._fetcher is None
