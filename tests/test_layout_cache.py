"""Disk cache for AUTO-layout discovery (utils/layouts.py): the warm
config-4 drive spent 59 s / 66 % of its on-chip phases re-discovering
formats every process; a hit must return an equivalent Format pytree
without compiling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_video_tpu.config import LTXModelType, tiny_test_config
from mlx_video_tpu.models.ltx.model import init_ltx_params
from mlx_video_tpu.pipelines import denoise as dn
from mlx_video_tpu.pipelines.positions import create_position_grid
from mlx_video_tpu.utils import layouts as lc


def _fmt_strs(tree):
    return [str(f) for f in jax.tree.leaves(tree)]


class TestLayoutCache:
    def _args(self):
        cfg = tiny_test_config(LTXModelType.VideoOnly)
        params = init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32)
        b, f, h, w = 1, 2, 2, 2
        lat = jnp.zeros((b, cfg.in_channels, f, h, w))
        pos = jnp.asarray(create_position_grid(b, f, h, w))
        ctx = jnp.zeros((b, 8, cfg.caption_channels))
        return cfg, params, lat, pos, ctx

    def test_discovery_roundtrips_through_disk(self, tmp_path, monkeypatch):
        monkeypatch.setenv("MLX_VIDEO_LAYOUT_CACHE", str(tmp_path))
        cfg, params, lat, pos, ctx = self._args()
        f1 = dn.preferred_param_formats(params, cfg, lat, pos, ctx)
        files = list(tmp_path.glob("*.json"))
        assert len(files) == 1  # discovery saved
        f2 = dn.preferred_param_formats(params, cfg, lat, pos, ctx)
        assert _fmt_strs(f1) == _fmt_strs(f2)
        # the hit's formats place params identically
        placed = dn.relayout_params(params, f2)
        out_a = jax.tree.leaves(placed)[0]
        assert np.asarray(out_a).shape == np.asarray(jax.tree.leaves(params)[0]).shape

    def test_distinct_geometry_distinct_entry(self, tmp_path, monkeypatch):
        monkeypatch.setenv("MLX_VIDEO_LAYOUT_CACHE", str(tmp_path))
        cfg, params, lat, pos, ctx = self._args()
        dn.preferred_param_formats(params, cfg, lat, pos, ctx)
        lat2 = jnp.zeros((1, cfg.in_channels, 4, 2, 2))
        pos2 = jnp.asarray(create_position_grid(1, 4, 2, 2))
        dn.preferred_param_formats(params, cfg, lat2, pos2, ctx)
        assert len(list(tmp_path.glob("*.json"))) == 2

    def test_template_mismatch_misses(self, tmp_path, monkeypatch):
        monkeypatch.setenv("MLX_VIDEO_LAYOUT_CACHE", str(tmp_path))
        cfg, params, lat, pos, ctx = self._args()
        fmts = dn.preferred_param_formats(params, cfg, lat, pos, ctx)
        key = lc.cache_key("x", (jnp.zeros((2,)),), ())
        lc.save_formats(key, fmts)
        # template with a different leaf count -> miss, not a crash
        assert lc.load_formats(key, {"a": jnp.zeros((2,))}) is None

    def test_disable_env(self, tmp_path, monkeypatch):
        monkeypatch.setenv("MLX_VIDEO_LAYOUT_CACHE", str(tmp_path))
        monkeypatch.setenv("MLX_VIDEO_LAYOUT_CACHE_DISABLE", "1")
        cfg, params, lat, pos, ctx = self._args()
        dn.preferred_param_formats(params, cfg, lat, pos, ctx)
        assert list(tmp_path.glob("*.json")) == []
