"""Pallas kernel correctness (interpreter mode on CPU) vs jnp reference."""

import jax
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


class TestKnnPallas:
    def test_matches_xla_knn(self, rng):
        from dispu_tpu.ops.knn import knn
        from dispu_tpu.ops.pallas_kernels import knn_pallas

        pts = jnp.asarray(rng.randn(2, 300, 3), np.float32)
        q = jnp.asarray(rng.randn(2, 100, 3), np.float32)
        d_ref, i_ref = knn(8, pts, q, impl="xla")
        d_got, i_got = knn_pallas(8, pts, q, interpret=True)
        np.testing.assert_array_equal(np.asarray(i_got), np.asarray(i_ref))
        np.testing.assert_allclose(
            np.asarray(d_got), np.asarray(d_ref), atol=1e-5
        )

    def test_unique_bias_excludes_duplicates(self, rng):
        from dispu_tpu.ops.knn import mask_duplicate_rows
        from dispu_tpu.ops.pallas_kernels import knn_pallas

        pts = rng.randn(1, 50, 3).astype(np.float32)
        pts[:, 1] = pts[:, 0]
        bias = mask_duplicate_rows(jnp.asarray(pts)).astype(jnp.float32) * 1e30
        _, idx = knn_pallas(
            5, jnp.asarray(pts), jnp.asarray(pts), bias, interpret=True
        )
        assert 1 not in np.asarray(idx)[0, 0]

    def test_gradients_match_xla_path(self, rng):
        """The custom VJP must reproduce autodiff-of-top_k gradients —
        training on TPU differentiates through the fused kernel."""
        from dispu_tpu.ops.knn import knn
        from dispu_tpu.ops.pallas_kernels import knn_pallas_diff

        pts = jnp.asarray(rng.randn(1, 40, 3), np.float32)
        q = jnp.asarray(rng.randn(1, 20, 3), np.float32)
        zero_bias = jnp.zeros((1, 40), jnp.float32)

        def loss_pallas(p, q_):
            d, _ = knn_pallas_diff(4, p, q_, zero_bias, True)
            return jnp.sum(jnp.sin(d))

        def loss_xla(p, q_):
            d, _ = knn(4, p, q_, impl="xla")
            return jnp.sum(jnp.sin(d))

        gp_p, gq_p = jax.grad(loss_pallas, argnums=(0, 1))(pts, q)
        gp_x, gq_x = jax.grad(loss_xla, argnums=(0, 1))(pts, q)
        np.testing.assert_allclose(
            np.asarray(gp_p), np.asarray(gp_x), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(gq_p), np.asarray(gq_x), atol=1e-4
        )

    def test_fps_pallas_under_grad_context(self, rng):
        """FPS in a differentiated computation must not break linearization."""
        from dispu_tpu.ops.pallas_kernels import fps_pallas

        pts = jnp.asarray(rng.randn(1, 64, 3), np.float32)

        def f(p):
            idx = fps_pallas(8, p, interpret=True)
            sel = jnp.take_along_axis(p, idx[..., None], axis=1)
            return jnp.sum(sel**2)

        g = jax.grad(f)(pts)
        assert np.isfinite(np.asarray(g)).all()


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
