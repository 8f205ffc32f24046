"""Native C++ library tests — cross-checked against the device/numpy ops."""

import numpy as np
import pytest

from dispu_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


class TestKnn:
    def test_matches_bruteforce(self, rng):
        support = rng.randn(2, 200, 3).astype(np.float32)
        queries = rng.randn(2, 50, 3).astype(np.float32)
        idx, d2 = native.knn_batch(support, queries, 8, return_dist=True)
        assert idx.shape == (2, 50, 8)
        for b in range(2):
            full = np.sum(
                (queries[b][:, None] - support[b][None]) ** 2, -1
            )
            want = np.sort(full, axis=1)[:, :8]
            np.testing.assert_allclose(
                np.take_along_axis(full, idx[b], axis=1), want, rtol=1e-5
            )
            np.testing.assert_allclose(d2[b], want, rtol=1e-5)

    def test_matches_device_knn(self, rng):
        from dispu_tpu.ops.knn import knn
        import jax.numpy as jnp

        pts = rng.randn(1, 300, 3).astype(np.float32)
        q = rng.randn(1, 40, 3).astype(np.float32)
        native_idx = native.knn_batch(pts, q, 5)
        _, device_idx = knn(5, jnp.asarray(pts), jnp.asarray(q))
        # same neighbor sets (tie order may differ): compare sorted
        np.testing.assert_array_equal(
            np.sort(native_idx[0], axis=-1),
            np.sort(np.asarray(device_idx)[0], axis=-1),
        )


class TestGridSubsample:
    def test_single_voxel_is_barycenter(self):
        pts = np.array([[0.1, 0.1, 0.1], [0.2, 0.2, 0.2]], np.float32)
        out, _ = native.grid_subsample(pts, cell=1.0)
        assert out.shape == (1, 3)
        np.testing.assert_allclose(out[0], [0.15, 0.15, 0.15], atol=1e-6)

    def test_feature_averaging(self):
        pts = np.array([[0, 0, 0], [0.1, 0, 0], [5, 5, 5]], np.float32)
        feats = np.array([[1.0, 0.0], [3.0, 2.0], [7.0, 7.0]], np.float32)
        out, f = native.grid_subsample(pts, cell=1.0, features=feats)
        assert len(out) == 2
        np.testing.assert_allclose(f[0], [2.0, 1.0], atol=1e-6)
        np.testing.assert_allclose(f[1], [7.0, 7.0], atol=1e-6)

    def test_reduces_density(self, rng):
        pts = rng.rand(5000, 3).astype(np.float32)
        out, _ = native.grid_subsample(pts, cell=0.25)
        assert 1 < len(out) <= 4**3 + 30  # ~4x4x4 voxels (+boundary)


class TestRender:
    def test_renders_something(self, rng):
        pts = (rng.rand(500, 3).astype(np.float32) - 0.5) * 1.6
        img = native.render_points(pts, size=128, radius=3)
        assert img.shape == (128, 128)
        assert img.max() > 0 and img.min() >= 0


class TestPointToMesh:
    def test_matches_device_metric(self, rng):
        from dispu_tpu.evaluation.meshio import read_off
        from dispu_tpu.evaluation.metrics import point_to_mesh_distance

        verts, faces = read_off("/root/reference/data/test/Icosahedron.off")
        pts = rng.randn(100, 3).astype(np.float32) * 0.8
        nd, nn_ = native.point_to_mesh(pts, verts, faces)
        dd, dn = point_to_mesh_distance(pts, verts, faces)
        np.testing.assert_allclose(nd, dd, atol=1e-4)
        np.testing.assert_allclose(nn_, dn, atol=1e-3)

    def test_point_on_surface_zero(self):
        verts = np.array(
            [[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32
        )
        faces = np.array([[0, 1, 2]], np.int32)
        pts = np.array([[0.25, 0.25, 0.0], [0.0, 0.0, 2.0]], np.float32)
        d, nearest = native.point_to_mesh(pts, verts, faces)
        np.testing.assert_allclose(d, [0.0, 2.0], atol=1e-6)
        np.testing.assert_allclose(nearest[1], [0, 0, 0], atol=1e-6)
