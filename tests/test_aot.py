"""AOT executable cache (utils/aot.py): correctness of the jit drop-in.

The perf claim (deserialize skips the axon tunnel's deferred device-side
compile) is chip-only and measured in scripts/probe_aot.py / PERF.md; here
we pin the semantics: identical results to plain jit, statics handled,
disk round-trip when the backend supports executable serialization, and
silent fallback when it does not.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_video_tpu.utils import aot


@pytest.fixture(autouse=True)
def _force_on(tmp_path, monkeypatch):
    monkeypatch.setenv("MLX_VIDEO_AOT", "1")
    monkeypatch.setenv("MLX_VIDEO_AOT_CACHE", str(tmp_path))
    aot.clear_memory_cache()
    yield
    aot.clear_memory_cache()


def _fn(params, x, *, scale, shift_on):
    y = x @ params["w"] + params["b"]
    if shift_on:
        y = y + 1.0
    return y * scale


def test_matches_plain_jit():
    f = aot.aot_jit(_fn, static_argnames=("scale", "shift_on"))
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    x = jnp.arange(8.0).reshape(2, 4)
    ref = _fn(params, x, scale=2.0, shift_on=True)
    out = f(params, x, scale=2.0, shift_on=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)
    # second call: memory-cache hit, same result
    out2 = f(params, x, scale=2.0, shift_on=True)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref), rtol=1e-6)


def test_distinct_statics_distinct_entries():
    f = aot.aot_jit(_fn, static_argnames=("scale", "shift_on"))
    params = {"w": jnp.eye(3), "b": jnp.zeros((3,))}
    x = jnp.ones((1, 3))
    a = np.asarray(f(params, x, scale=1.0, shift_on=False))
    b = np.asarray(f(params, x, scale=3.0, shift_on=True))
    np.testing.assert_allclose(a, np.ones((1, 3)), rtol=1e-6)
    np.testing.assert_allclose(b, np.full((1, 3), 6.0), rtol=1e-6)


def test_shape_change_recompiles_correctly():
    f = aot.aot_jit(_fn, static_argnames=("scale", "shift_on"))
    params = {"w": jnp.eye(2), "b": jnp.zeros((2,))}
    for n in (1, 3):
        x = jnp.ones((n, 2))
        out = f(params, x, scale=1.0, shift_on=False)
        assert out.shape == (n, 2)
        np.testing.assert_allclose(np.asarray(out), np.ones((n, 2)), rtol=1e-6)


def test_none_and_scalar_args():
    def g(x, maybe, s):
        y = x * s
        if maybe is not None:
            y = y + maybe
        return y

    f = aot.aot_jit(g)
    x = jnp.ones((2,))
    np.testing.assert_allclose(np.asarray(f(x, None, 2.0)), [2.0, 2.0], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(f(x, jnp.ones((2,)), 2.0)), [3.0, 3.0], rtol=1e-6
    )
    # weak (python float) vs strong (array) scalar must not collide
    np.testing.assert_allclose(
        np.asarray(f(x, None, jnp.asarray(3.0))), [3.0, 3.0], rtol=1e-6
    )


def test_disk_roundtrip_or_clean_fallback(tmp_path):
    """If this backend serializes executables, a fresh memory cache must
    load from disk; if not, the wrapper must have warned once and still
    produce correct results."""
    f = aot.aot_jit(_fn, static_argnames=("scale", "shift_on"), name="rt")
    params = {"w": jnp.eye(2), "b": jnp.ones((2,))}
    x = jnp.zeros((1, 2))
    ref = np.asarray(f(params, x, scale=1.0, shift_on=False))
    files = list(tmp_path.glob("rt-*.jaxexec"))
    aot.clear_memory_cache()
    out = np.asarray(f(params, x, scale=1.0, shift_on=False))
    np.testing.assert_allclose(out, ref, rtol=1e-6)
    # Either the disk binary executed (file retained) or the backend refused
    # at execution time (XLA:CPU machine-feature mismatch) and the wrapper
    # tombstoned the backend + removed the file — both are clean states.
    broken = list(tmp_path.glob("broken-*"))
    if files and not broken:
        assert files[0].stat().st_size > 0
    if broken:
        assert not files[0].exists()
        # tombstoned backend: no further save attempts
        aot.clear_memory_cache()
        out2 = np.asarray(f(params, x, scale=1.0, shift_on=False))
        np.testing.assert_allclose(out2, ref, rtol=1e-6)
        assert not list(tmp_path.glob("rt-*.jaxexec"))


def test_disabled_on_cpu_by_default(monkeypatch):
    monkeypatch.delenv("MLX_VIDEO_AOT", raising=False)
    if jax.default_backend() == "cpu":
        assert not aot.aot_enabled()


def test_corrupt_cache_file_recovers(tmp_path):
    f = aot.aot_jit(_fn, static_argnames=("scale", "shift_on"), name="cor")
    params = {"w": jnp.eye(2), "b": jnp.zeros((2,))}
    x = jnp.ones((1, 2))
    ref = np.asarray(f(params, x, scale=1.0, shift_on=False))
    files = list(tmp_path.glob("cor-*.jaxexec"))
    if files:
        files[0].write_bytes(b"garbage")
    aot.clear_memory_cache()
    out = np.asarray(f(params, x, scale=1.0, shift_on=False))
    np.testing.assert_allclose(out, ref, rtol=1e-6)


def test_donation_plumbed():
    def g(x):
        return x + 1.0

    f = aot.aot_jit(g, donate_argnames=("x",))
    x = jnp.ones((128,))
    out = f(x)
    np.testing.assert_allclose(np.asarray(out), np.full((128,), 2.0), rtol=1e-6)


class TestPreload:
    """preload_disk_executables: meta-indexed entries land in the memory
    cache ahead of first dispatch (r5 tunnel program-upload optimization)."""

    def test_preload_populates_memory_cache(self, tmp_path, monkeypatch):
        import jax.numpy as jnp

        monkeypatch.setenv("MLX_VIDEO_AOT", "1")
        monkeypatch.setenv("MLX_VIDEO_AOT_CACHE", str(tmp_path))
        from mlx_video_tpu.utils import aot

        aot.clear_memory_cache()
        f = aot.aot_jit(lambda x: x * 2.0, name="preload_probe")
        x = jnp.arange(8.0)
        np.testing.assert_allclose(np.asarray(f(x)), np.arange(8.0) * 2)
        # the save wrote a sidecar meta
        metas = [p for p in os.listdir(tmp_path) if p.endswith(".meta")]
        saved = [p for p in os.listdir(tmp_path) if p.endswith(".jaxexec")]
        if not saved:
            pytest.skip("backend cannot serialize executables")
        assert metas, "save did not write a .meta sidecar"
        # fresh process simulation: empty memory cache, preload from disk
        aot.clear_memory_cache()
        n = aot.preload_disk_executables(("preload_probe",))
        assert n == 1
        assert len(aot._MEMORY) == 1
        # filtered-out names load nothing
        aot.clear_memory_cache()
        assert aot.preload_disk_executables(("other_name",)) == 0
        # budget of 0 loads nothing
        assert aot.preload_disk_executables(("preload_probe",), max_bytes=0) == 0
