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


class TestRenderBall:
    def _oracle(self, h, w, xyzs, c0, c1, c2, r):
        """Literal numpy transcription of the reference loop
        (ref:tf_ops/renderball/render_balls_so.cpp:14-57)."""
        r = max(r, 1)
        depth = np.full((h, w), -2100000000, np.int64)
        show = np.zeros((h, w, 3), np.uint8)
        pattern = []
        for dx in range(-r, r + 1):
            for dy in range(-r, r + 1):
                if dx * dx + dy * dy < r * r:
                    dz = np.sqrt(float(r * r - dx * dx - dy * dy))
                    pattern.append((dx, dy, int(dz), dz / r))
        zmin = (xyzs[:, 2] - r).min()
        zmax = (xyzs[:, 2] + r).max()
        for i in range(len(xyzs)):
            x, y, z = xyzs[i]
            for dx, dy, dz, s in pattern:
                x2, y2, z2 = x + dx, y + dy, z + dz
                if 0 <= x2 < h and 0 <= y2 < w and depth[x2, y2] < z2:
                    depth[x2, y2] = z2
                    inten = min(1.0, (z2 - zmin) / (zmax - zmin) * 0.7 + 0.3)
                    show[x2, y2, 0] = np.uint8(s * c2[i] * inten)
                    show[x2, y2, 1] = np.uint8(s * c0[i] * inten)
                    show[x2, y2, 2] = np.uint8(s * c1[i] * inten)
        return show

    def test_matches_reference_semantics(self, rng):
        from dispu_tpu import native

        if not native.available():
            pytest.skip("native library unavailable")
        n, h, w = 60, 64, 80
        xyzs = np.stack([
            rng.randint(0, h, n), rng.randint(0, w, n),
            rng.randint(0, 100, n)
        ], axis=1).astype(np.int32)
        c0 = rng.rand(n).astype(np.float32) * 255
        c1 = rng.rand(n).astype(np.float32) * 255
        c2 = rng.rand(n).astype(np.float32) * 255
        got = native.render_ball(h, w, xyzs, c0, c1, c2, radius=5)
        want = self._oracle(h, w, xyzs, c0, c1, c2, 5)
        np.testing.assert_array_equal(got, want)

    def test_interpolation_visualization_flow(self, rng):
        """The visu_interpolation.py demo (ref:tf_ops/interpolation/
        visu_interpolation.py — Python-2 dead code in the reference):
        inverse-distance-interpolate colors from 4 anchors, render."""
        import jax.numpy as jnp

        from dispu_tpu import native
        from dispu_tpu.ops.interpolate import three_interpolate, three_nn

        if not native.available():
            pytest.skip("native library unavailable")
        anchors = jnp.asarray(
            [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 1]], jnp.float32
        )[None]
        colors = jnp.asarray(
            [[255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 0]],
            jnp.float32,
        )[None]
        cloud = jnp.asarray(rng.rand(100, 3), jnp.float32)[None]
        dist, idx = three_nn(cloud, anchors)
        dist = jnp.maximum(dist, 1e-10)
        weight = (1.0 / dist) / jnp.sum(1.0 / dist, axis=2, keepdims=True)
        interp = three_interpolate(colors, idx, weight)[0]
        assert np.isfinite(np.asarray(interp)).all()

        px = np.clip((np.asarray(cloud[0]) * 60 + 2), 0, 63).astype(np.int32)
        xyzs = np.concatenate([px[:, :2], px[:, 2:]], axis=1)
        img = native.render_ball(
            64, 64, xyzs,
            np.asarray(interp[:, 0]), np.asarray(interp[:, 1]),
            np.asarray(interp[:, 2]), radius=4,
        )
        assert img.shape == (64, 64, 3) and img.max() > 0


class TestKnnSingleCloud:
    """ref:libs/nearest_neighbors/knn.pyx:33-71 entry-point parity."""

    def test_matches_bruteforce(self, rng):
        pts = rng.randn(250, 3).astype(np.float32)
        q = rng.randn(31, 3).astype(np.float32)
        idx, d2 = native.knn(pts, q, 6, return_dist=True)
        assert idx.shape == (31, 6) and idx.dtype == np.int64
        full = np.sum((q[:, None] - pts[None]) ** 2, -1)
        np.testing.assert_array_equal(idx, np.argsort(full, axis=1)[:, :6])
        np.testing.assert_allclose(
            d2, np.sort(full, axis=1)[:, :6], rtol=1e-5
        )

    def test_generic_dim(self, rng):
        pts = rng.randn(120, 6).astype(np.float32)
        q = rng.randn(9, 6).astype(np.float32)
        idx = native.knn(pts, q, 4)
        full = np.sum((q[:, None] - pts[None]) ** 2, -1)
        np.testing.assert_array_equal(idx, np.argsort(full, axis=1)[:, :4])

    def test_k_exceeds_n_pads_idx_and_d2(self, rng):
        """k > n tail: idx repeats the last found and d2 must be
        initialized (it repeated the last valid distance on the KD-tree
        path but was left uninitialized on the generic-dim path)."""
        for dim in (3, 4):
            pts = rng.randn(5, dim).astype(np.float32)
            q = rng.randn(3, dim).astype(np.float32)
            idx, d2 = native.knn(pts, q, 8, return_dist=True)
            assert np.isfinite(d2).all()
            np.testing.assert_array_equal(
                idx[:, 5:], np.broadcast_to(idx[:, 4:5], (3, 3)))
            np.testing.assert_array_equal(
                d2[:, 5:], np.broadcast_to(d2[:, 4:5], (3, 3)))


class TestKnnBatchDistancePick:
    """ref:libs/nearest_neighbors/knn.pyx:115-148 entry-point parity."""

    def test_semantics(self, rng):
        pts = rng.randn(2, 100, 3).astype(np.float32)
        idx, queries = native.knn_batch_distance_pick(pts, 12, 5, seed=11)
        assert idx.shape == (2, 12, 5) and idx.dtype == np.int64
        assert queries.shape == (2, 12, 3)
        for b in range(2):
            for t in range(12):
                # the query is a dataset point and leads its own kNN list
                d = np.sum((pts[b] - queries[b, t]) ** 2, -1)
                assert d[idx[b, t, 0]] < 1e-10
                # indices are the exact k nearest of the query
                np.testing.assert_allclose(
                    np.sort(d[idx[b, t]]), np.sort(d)[:5], atol=1e-6
                )

    def test_coverage_balancing(self, rng):
        # with n = nqueries the picker's least-used rule touches distinct
        # points: the +100 self-penalty makes re-picking a point strictly
        # last resort, so all picked queries are distinct here
        pts = rng.randn(1, 64, 3).astype(np.float32)
        _, queries = native.knn_batch_distance_pick(pts, 32, 4, seed=0)
        uniq = np.unique(queries[0].round(6), axis=0)
        assert len(uniq) == 32

    def test_seeded_determinism(self, rng):
        pts = rng.randn(2, 80, 3).astype(np.float32)
        a = native.knn_batch_distance_pick(pts, 10, 4, seed=5)
        b = native.knn_batch_distance_pick(pts, 10, 4, seed=5)
        c = native.knn_batch_distance_pick(pts, 10, 4, seed=6)
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])
        assert not np.array_equal(a[0], c[0])
