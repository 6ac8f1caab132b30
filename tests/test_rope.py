"""RoPE tests: rotation identities, shapes, padding semantics, precision.

Mirrors the intent of reference tests/test_rope.py with an independent NumPy
oracle (no code shared with the reference implementation).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mlx_video_tpu.config import LTXRopeType
from mlx_video_tpu.models.ltx import rope
from mlx_video_tpu.pipelines.positions import create_position_grid


def _numpy_freqs_oracle(positions, dim, theta, max_pos):
    """Independent re-derivation of the freq math for the middle-indices grid."""
    b, n_dims, s, _ = positions.shape
    mid = positions.mean(axis=-1)  # (B, n_dims, S)
    frac = np.stack([mid[:, i] / max_pos[i] for i in range(n_dims)], axis=-1)  # (B,S,n_dims)
    scaled = frac * 2.0 - 1.0
    num_indices = dim // (2 * n_dims)
    lin = np.linspace(0.0, 1.0, num_indices)
    idx = theta**lin * np.pi / 2
    freqs = scaled[..., None] * idx  # (B,S,n_dims,num_indices)
    freqs = np.swapaxes(freqs, -1, -2).reshape(b, s, -1)
    return freqs


class TestFreqGrid:
    def test_log_spacing(self):
        g = np.asarray(rope.generate_freq_grid(10000.0, 3, 128))
        assert g.shape == (21,)  # 128 // 6
        np.testing.assert_allclose(g[0], np.pi / 2, rtol=1e-6)
        np.testing.assert_allclose(g[-1], 10000.0 * np.pi / 2, rtol=1e-5)
        # log-spaced: ratios constant
        ratios = g[1:] / g[:-1]
        np.testing.assert_allclose(ratios, ratios[0], rtol=1e-4)


class TestPrecomputeShapes:
    def setup_method(self):
        self.positions = jnp.asarray(create_position_grid(2, 3, 4, 5))

    def test_interleaved_shape_and_padding(self):
        dim = 128
        cos, sin = rope.precompute_freqs_cis(
            self.positions, dim=dim, max_pos=[20, 2048, 2048],
            use_middle_indices_grid=True, rope_type=LTXRopeType.INTERLEAVED,
        )
        s = 3 * 4 * 5
        assert cos.shape == (2, s, dim) and sin.shape == (2, s, dim)
        # pad = dim % 6 = 2 at the FRONT: cos=1, sin=0
        np.testing.assert_allclose(np.asarray(cos[..., :2]), 1.0)
        np.testing.assert_allclose(np.asarray(sin[..., :2]), 0.0)

    def test_split_shape_and_padding(self):
        dim, heads = 128, 4
        cos, sin = rope.precompute_freqs_cis(
            self.positions, dim=dim, max_pos=[20, 2048, 2048],
            use_middle_indices_grid=True, num_attention_heads=heads,
            rope_type=LTXRopeType.SPLIT,
        )
        s = 3 * 4 * 5
        assert cos.shape == (2, heads, s, dim // 2 // heads)
        # pad = 64 - 63 = 1 at the front of the flattened (B,S,64) layout ->
        # lands in head 0, position 0.
        np.testing.assert_allclose(np.asarray(cos[:, 0, :, 0]), 1.0)
        np.testing.assert_allclose(np.asarray(sin[:, 0, :, 0]), 0.0)

    def test_freqs_match_numpy_oracle(self):
        dim = 126  # divisible by 6: no padding
        indices = rope.generate_freq_grid(10000.0, 3, dim)
        freqs = rope.generate_freqs(
            indices, self.positions, [20, 2048, 2048], use_middle_indices_grid=True
        )
        oracle = _numpy_freqs_oracle(np.asarray(self.positions), dim, 10000.0, [20, 2048, 2048])
        # Pre-trig frequency arguments must match tightly (fp32 rounding only).
        np.testing.assert_allclose(np.asarray(freqs), oracle, rtol=2e-5, atol=1e-3)

        # cos/sin comparison is limited by fp32 argument reduction at args up
        # to theta*pi/2 ~ 1.6e4 rad (same property as the reference's fp32
        # path), so only a loose tolerance is meaningful here.
        cos, sin = rope.precompute_freqs_cis(
            self.positions, dim=dim, max_pos=[20, 2048, 2048],
            use_middle_indices_grid=True, rope_type=LTXRopeType.INTERLEAVED,
        )
        np.testing.assert_allclose(np.asarray(cos), np.repeat(np.cos(oracle), 2, -1), atol=0.02)
        np.testing.assert_allclose(np.asarray(sin), np.repeat(np.sin(oracle), 2, -1), atol=0.02)


class TestRotationIdentities:
    def test_interleaved_zero_angle_is_identity(self, rng):
        x = jnp.asarray(rng.normal(size=(1, 7, 16)).astype(np.float32))
        cos = jnp.ones((1, 7, 16))
        sin = jnp.zeros((1, 7, 16))
        out = rope.apply_interleaved_rotary_emb(x, cos, sin)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)

    def test_interleaved_norm_preserved(self, rng):
        """Rotations preserve the norm of each 2D pair."""
        x = jnp.asarray(rng.normal(size=(1, 5, 8)).astype(np.float32))
        theta = rng.normal(size=(1, 5, 4)).astype(np.float32)
        cos = jnp.asarray(np.repeat(np.cos(theta), 2, axis=-1))
        sin = jnp.asarray(np.repeat(np.sin(theta), 2, axis=-1))
        out = np.asarray(rope.apply_interleaved_rotary_emb(x, cos, sin))
        xin = np.asarray(x).reshape(1, 5, 4, 2)
        xout = out.reshape(1, 5, 4, 2)
        np.testing.assert_allclose(
            np.linalg.norm(xout, axis=-1), np.linalg.norm(xin, axis=-1), atol=1e-5
        )

    def test_interleaved_90_degrees(self):
        x = jnp.asarray(np.array([[[1.0, 2.0]]], dtype=np.float32))
        cos = jnp.zeros((1, 1, 2))
        sin = jnp.ones((1, 1, 2))
        out = np.asarray(rope.apply_interleaved_rotary_emb(x, cos, sin))
        np.testing.assert_allclose(out, [[[-2.0, 1.0]]], atol=1e-6)

    def test_split_zero_angle_is_identity(self, rng):
        x = jnp.asarray(rng.normal(size=(1, 2, 5, 8)).astype(np.float32))  # (B,H,S,D)
        cos = jnp.ones((1, 2, 5, 4))
        sin = jnp.zeros((1, 2, 5, 4))
        out = rope.apply_split_rotary_emb(x, cos, sin)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)

    def test_split_flat_layout_roundtrip(self, rng):
        """Flattened (B,S,H*D) input agrees with per-head (B,H,S,D) input."""
        b, h, s, d = 1, 2, 5, 8
        x_heads = rng.normal(size=(b, h, s, d)).astype(np.float32)
        theta = rng.normal(size=(b, h, s, d // 2)).astype(np.float32)
        cos, sin = jnp.asarray(np.cos(theta)), jnp.asarray(np.sin(theta))
        out_heads = np.asarray(rope.apply_split_rotary_emb(jnp.asarray(x_heads), cos, sin))
        x_flat = np.transpose(x_heads, (0, 2, 1, 3)).reshape(b, s, h * d)
        out_flat = np.asarray(rope.apply_split_rotary_emb(jnp.asarray(x_flat), cos, sin))
        expected = np.transpose(out_heads, (0, 2, 1, 3)).reshape(b, s, h * d)
        np.testing.assert_allclose(out_flat, expected, atol=1e-5)

    def test_split_rotation_math(self):
        """first' = first*cos - sin*second; second' = second*cos + sin*first."""
        x = jnp.asarray(np.array([[[[1.0, 0.0, 0.0, 1.0]]]], dtype=np.float32))
        angle = np.pi / 2
        cos = jnp.full((1, 1, 1, 2), np.cos(angle), dtype=jnp.float32)
        sin = jnp.full((1, 1, 1, 2), np.sin(angle), dtype=jnp.float32)
        out = np.asarray(rope.apply_split_rotary_emb(x, cos, sin))
        np.testing.assert_allclose(out, [[[[0.0, -1.0, 1.0, 0.0]]]], atol=1e-6)


class TestPrecision:
    def test_bf16_input_output_dtype_preserved(self, rng):
        x = jnp.asarray(rng.normal(size=(1, 7, 16)).astype(np.float32)).astype(jnp.bfloat16)
        cos = jnp.ones((1, 7, 16))
        sin = jnp.zeros((1, 7, 16))
        out = rope.apply_interleaved_rotary_emb(x, cos, sin)
        assert out.dtype == jnp.bfloat16

    def test_bf16_positions_warn(self):
        positions = jnp.asarray(create_position_grid(1, 2, 2, 2)).astype(jnp.bfloat16)
        with pytest.warns(UserWarning, match="bfloat16"):
            rope.precompute_freqs_cis(
                positions, dim=12, max_pos=[20, 2048, 2048],
                use_middle_indices_grid=True, rope_type=LTXRopeType.INTERLEAVED,
            )

    def test_tables_are_fp32(self):
        positions = jnp.asarray(create_position_grid(1, 2, 2, 2))
        cos, sin = rope.precompute_freqs_cis(
            positions, dim=12, max_pos=[20, 2048, 2048],
            use_middle_indices_grid=True, rope_type=LTXRopeType.INTERLEAVED,
        )
        assert cos.dtype == jnp.float32 and sin.dtype == jnp.float32
