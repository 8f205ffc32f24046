"""Pallas kernel correctness (interpreter mode on CPU) vs jnp reference."""

import jax.numpy as jnp
import numpy as np
import pytest

from dispu_tpu.ops.chamfer import nn_distance
from dispu_tpu.ops.pallas_kernels import fps_pallas, nn_distance_chunked
from dispu_tpu.ops.sampling import farthest_point_sample


class TestFPSPallas:
    @pytest.mark.parametrize("n,npoint", [(100, 16), (128, 32), (300, 64)])
    def test_matches_xla_fps(self, rng, n, npoint):
        xyz = rng.randn(2, n, 3).astype(np.float32)
        want = np.asarray(farthest_point_sample(npoint, jnp.asarray(xyz)))
        got = np.asarray(fps_pallas(npoint, jnp.asarray(xyz), interpret=True))
        np.testing.assert_array_equal(got, want)

    def test_padding_never_selected(self, rng):
        # n = 130 pads to 256; padded lanes must never appear in the output
        xyz = rng.randn(1, 130, 3).astype(np.float32)
        got = np.asarray(fps_pallas(64, jnp.asarray(xyz), interpret=True))
        assert got.max() < 130
        assert got[0, 0] == 0
        assert len(set(got[0].tolist())) == 64  # all distinct


class TestChunkedNN:
    def test_matches_dense(self, rng):
        a = rng.randn(2, 300, 3).astype(np.float32)
        b = rng.randn(2, 200, 3).astype(np.float32)
        want = nn_distance(jnp.asarray(a), jnp.asarray(b))
        got = nn_distance_chunked(jnp.asarray(a), jnp.asarray(b), chunk=128)
        for w, g in zip(want, got):
            np.testing.assert_allclose(
                np.asarray(w), np.asarray(g), atol=1e-5
            )
