"""Tests for the experimental op families (ref:Common/ops.py unused
variants) and the model_utils extras."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dispu_tpu.nn import experimental as X


def _cloud(rng, b=2, n=32, c=8):
    xyz = jnp.asarray(rng.randn(b, n, 3), jnp.float32)
    feat = jnp.asarray(rng.randn(b, n, c), jnp.float32)
    return xyz, feat


class TestSampleOffset:
    def test_shape_and_bound(self, rng):
        grouped_xyz = jnp.asarray(rng.randn(2, 16, 8, 3), jnp.float32)
        new_point = jnp.asarray(rng.randn(2, 16, 8, 12), jnp.float32)
        mod = X.SampleOffset([32, 3])
        v = mod.init(jax.random.PRNGKey(0), new_point, grouped_xyz)
        out = mod.apply(v, new_point, grouped_xyz)
        assert out.shape == (2, 16, 3)
        assert float(jnp.max(jnp.abs(out))) <= 0.5


class TestASNL:
    def test_downsample_path(self, rng):
        xyz, feat = _cloud(rng)
        mod = X.PointASNLSetAbstraction(npoint=16, nsample=8, mlp=[16, 16, 24])
        v = mod.init(jax.random.PRNGKey(0), xyz, feat)
        new_xyz, new_feat = mod.apply(v, xyz, feat)
        assert new_xyz.shape == (2, 16, 3)
        assert new_feat.shape == (2, 16, 24)

    def test_same_size_path(self, rng):
        xyz, feat = _cloud(rng)
        mod = X.PointASNLSetAbstraction(npoint=32, nsample=8, mlp=[16, 16, 24])
        v = mod.init(jax.random.PRNGKey(0), xyz, feat)
        new_xyz, new_feat = mod.apply(v, xyz, feat)
        # same-size path keeps the input coordinates (no adaptive shift)
        np.testing.assert_array_equal(np.asarray(new_xyz), np.asarray(xyz))
        assert new_feat.shape == (2, 32, 24)


class TestDownscales:
    def test_pointdownscale_weighted_xyz(self, rng):
        xyz, feat = _cloud(rng)
        mod = X.PointDownscale(npoint=16, nsample=8, as_neighbor=4)
        v = mod.init(jax.random.PRNGKey(0), xyz, feat)
        new_xyz, off = mod.apply(v, xyz, feat)
        assert new_xyz.shape == off.shape == (2, 16, 3)
        # the weighted sum of neighbors stays inside the cloud's bbox
        assert float(jnp.max(off)) <= float(jnp.max(xyz)) + 1e-5

    def test_pointdownscale2(self, rng):
        xyz, feat = _cloud(rng)
        mod = X.PointDownscale2(npoint=16, nsample=8, as_neighbor=4)
        v = mod.init(jax.random.PRNGKey(0), xyz, feat)
        new_xyz, off = mod.apply(v, xyz, feat)
        assert off.shape == (2, 16, 3)
        assert float(jnp.max(jnp.abs(off))) <= 0.5

    def test_pointdownscale3_bounded(self, rng):
        xyz, feat = _cloud(rng)
        mod = X.PointDownscale3(npoint=16, nsample=8, as_neighbor=4)
        v = mod.init(jax.random.PRNGKey(0), xyz, feat)
        _, off = mod.apply(v, xyz, feat)
        assert off.shape == (2, 16, 3)
        assert float(jnp.max(jnp.abs(off))) <= 0.5

    def test_pointdownscale3_noise_rng(self, rng):
        xyz, feat = _cloud(rng)
        mod = X.PointDownscale3(npoint=16, nsample=8, as_neighbor=4,
                                use_noise=True)
        v = mod.init({"params": jax.random.PRNGKey(0),
                      "noise": jax.random.PRNGKey(1)}, xyz, feat)
        _, off = mod.apply(v, xyz, feat, rngs={"noise": jax.random.PRNGKey(2)})
        assert off.shape == (2, 16, 3)

    def test_pointdownscale3_1(self, rng):
        xyz, feat = _cloud(rng)
        mod = X.PointDownscale3_1(npoint=16, nsample=8, mlp=[16, 16, 24])
        v = mod.init(jax.random.PRNGKey(0), xyz, feat)
        new_xyz, coord = mod.apply(v, xyz, feat)
        assert new_xyz.shape == (2, 16, 3)
        assert coord.shape == (2, 16, 3)

    def test_pointdownscale4(self, rng):
        xyz, feat = _cloud(rng)
        mod = X.PointDownscale4(npoint=16, nsample=8)
        v = mod.init(jax.random.PRNGKey(0), xyz, feat)
        _, off = mod.apply(v, xyz, feat)
        assert off.shape == (2, 16, 3)

    def test_pointshuffle_v1(self, rng):
        xyz, feat = _cloud(rng)
        mod = X.PointShuffleV1(nsample=8)
        v = mod.init(jax.random.PRNGKey(0), xyz, feat)
        out = mod.apply(v, xyz, feat)
        # grouped features carry the prepended neighbor xyz (+3 channels)
        assert out.shape == (feat.shape[0], feat.shape[1], feat.shape[2] + 3)


class TestShufflers:
    def test_point_shuffler_oracle(self, rng):
        x = rng.randn(1, 6, 1, 8).astype(np.float32)
        out = np.asarray(X.point_shuffler(jnp.asarray(x), scale=2))
        assert out.shape == (1, 12, 1, 4)
        # out[b, i·s + r, 0, q] == in[b, i, 0, q·s + r]
        for i in range(6):
            for r in range(2):
                for q in range(4):
                    assert out[0, i * 2 + r, 0, q] == x[0, i, 0, q * 2 + r]

    def test_shuffle_up_down_roundtrip(self, rng):
        x = jnp.asarray(rng.randn(2, 8, 4, 6), jnp.float32)
        up = X.shuffle_up(x, 2)
        assert up.shape == (2, 2, 8, 12)
        back = X.shuffle_down(up, 2)
        assert back.shape == x.shape
        # torch pixel_shuffle/unshuffle with these permutations invert
        np.testing.assert_allclose(np.asarray(back), np.asarray(x))


class TestUpShuffleLayers:
    def test_variant_shapes(self, rng):
        feat = jnp.asarray(rng.randn(2, 16, 8), jnp.float32)
        for variant in (1, 2):
            mod = X.UpShuffleLayer(up_ratio=4, variant=variant)
            v = mod.init(jax.random.PRNGKey(0), feat)
            out = mod.apply(v, feat)
            assert out.shape == (2, 64, 8)

    def test_variant_orderings_differ(self, rng):
        feat = jnp.asarray(rng.randn(1, 4, 8), jnp.float32)
        m1 = X.UpShuffleLayer(up_ratio=4, variant=1)
        v = m1.init(jax.random.PRNGKey(0), feat)
        out1 = m1.apply(v, feat)
        m2 = X.UpShuffleLayer(up_ratio=4, variant=2)
        out2 = m2.apply(v, feat)  # same params, different shuffle order
        # both are permutations of the same channel data per point
        assert not np.allclose(np.asarray(out1), np.asarray(out2))
        np.testing.assert_allclose(
            np.sort(np.asarray(out1).reshape(4, -1), axis=-1),
            np.sort(np.asarray(out2).reshape(4, -1), axis=-1),
            rtol=1e-6,
        )

    def test_layer3(self, rng):
        feat = jnp.asarray(rng.randn(2, 16, 8), jnp.float32)
        mod = X.UpShuffleLayer3(up_ratio=4, k=4)
        v = mod.init(jax.random.PRNGKey(0), feat)
        out = mod.apply(v, feat)
        assert out.shape == (2, 64, 8)

    def test_layer4(self, rng):
        feat = jnp.asarray(rng.randn(1, 32, 8), jnp.float32)
        mod = X.UpShuffleLayer4(up_ratio=4, k=16)
        v = mod.init(jax.random.PRNGKey(0), feat)
        out = mod.apply(v, feat)
        # cc = 2c = 16; out channels cc//2·r / r points → (b, n·r, cc//2)
        assert out.shape == (1, 128, 8)

    def test_layer5(self, rng):
        feat = jnp.asarray(rng.randn(1, 16, 8), jnp.float32)
        pc = jnp.asarray(rng.randn(1, 16, 3), jnp.float32)
        mod = X.UpShuffleLayer5(k=8)
        v = mod.init(jax.random.PRNGKey(0), pc, feat)
        out = mod.apply(v, pc, feat)
        assert out.shape == (1, 32, 16)  # 2× points, 2c channels


class TestDuplicates:
    def test_duplicate_up_edge(self, rng):
        feat = jnp.asarray(rng.randn(1, 16, 12), jnp.float32)
        mod = X.DuplicateUpEdge(up_ratio=4, k=8)
        v = mod.init(jax.random.PRNGKey(0), feat)
        out = mod.apply(v, feat)
        assert out.shape == (1, 64, 128)

    def test_duplicate_up2_unique_codes(self, rng):
        feat = jnp.asarray(rng.randn(1, 16, 12), jnp.float32)
        mod = X.DuplicateUp2(up_ratio=4, patch_num=16)
        v = mod.init(jax.random.PRNGKey(0), feat)
        out = mod.apply(v, feat)
        assert out.shape == (1, 64, 128)

    def test_point_upscale(self, rng):
        feat = jnp.asarray(rng.randn(1, 16, 8), jnp.float32)
        mod = X.PointUpscale(npoint=64, k=8)
        v = mod.init(jax.random.PRNGKey(0), feat)
        coord = mod.apply(v, feat)
        assert coord.shape == (1, 64, 3)


class TestExtractors:
    def test_down(self, rng):
        pts = jnp.asarray(rng.randn(1, 32, 3), jnp.float32)
        mod = X.feature_extraction_down()
        v = mod.init(jax.random.PRNGKey(0), pts)
        out = mod.apply(v, pts)
        assert out.shape == (1, 32, 64)

    def test_up_and_up2_channels(self, rng):
        pts = jnp.asarray(rng.randn(1, 32, 3), jnp.float32)
        for ctor in (X.feature_extraction_up, X.feature_extraction_up2):
            mod = ctor()
            v = mod.init(jax.random.PRNGKey(0), pts, False)
            out = mod.apply(v, pts, False)
            assert out.shape == (1, 32, 480)


class TestUnits:
    def test_weight_learning_unit(self, rng):
        x = jnp.asarray(rng.randn(1, 8, 1, 16), jnp.float32)
        mod = X.WeightLearningUnit(up_ratio=4)
        v = mod.init(jax.random.PRNGKey(0), x)
        out = mod.apply(v, x)
        assert out.shape == (1, 8, 1, 32)  # (b, n, 1, n·r)

    def test_coordinate_reconstruction(self, rng):
        x = jnp.asarray(rng.randn(1, 8, 1, 16), jnp.float32)
        mod = X.CoordinateReconstructionUnit()
        v = mod.init(jax.random.PRNGKey(0), x)
        out = mod.apply(v, x)
        assert out.shape == (1, 8, 3)

    def test_instance_norm_normalizes(self, rng):
        x = jnp.asarray(rng.randn(2, 16, 4, 6) * 3 + 5, jnp.float32)
        mod = X.InstanceNorm()
        v = mod.init(jax.random.PRNGKey(0), x)
        out = np.asarray(mod.apply(v, x))
        # with identity affine params: per-instance, per-channel ~N(0,1)
        mu = out.mean(axis=(1, 2))
        sd = out.std(axis=(1, 2))
        assert np.abs(mu).max() < 1e-4
        assert np.abs(sd - 1.0).max() < 0.01

    def test_instance_norm_faithful_formula(self, rng):
        x = rng.randn(1, 8, 2, 3).astype(np.float32)
        mod = X.InstanceNorm(faithful=True)
        v = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
        out = np.asarray(mod.apply(v, jnp.asarray(x)))
        mu = x.mean(axis=(1, 2), keepdims=True)
        var = x.var(axis=(1, 2), keepdims=True)
        want = (x - mu) / np.square(var + 1e-3)
        np.testing.assert_allclose(out, want, rtol=1e-4)


class TestDenseConvVariants:
    def test_channel_counts(self, rng):
        from dispu_tpu.nn.edgeconv import DenseEdgeBlock

        feat = jnp.asarray(rng.randn(1, 32, 8), jnp.float32)
        g, n = 12, 3
        for variant, want in (("default", g * n + 8), ("v0", g * n),
                              ("v2", g * n + 8)):
            mod = DenseEdgeBlock(growth_rate=g, n=n, k=4, variant=variant)
            v = mod.init(jax.random.PRNGKey(0), feat)
            out, idx = mod.apply(v, feat)
            assert out.shape == (1, 32, want), variant
            assert idx.shape == (1, 32, 4)


class TestGroupingExtras:
    def test_dilat_group_oracle(self, rng):
        from dispu_tpu.ops.grouping import dilat_group
        from dispu_tpu.ops.knn import knn

        xyz = jnp.asarray(rng.randn(1, 32, 3), jnp.float32)
        feat = jnp.asarray(rng.randn(1, 32, 5), jnp.float32)
        k, d = 4, 2
        gx, gp, idx = dilat_group(xyz, feat, k, dilation=d, use_xyz=True)
        _, full = knn(k * d + 1, xyz, xyz)
        want_idx = np.asarray(full)[:, :, 1::d]
        np.testing.assert_array_equal(np.asarray(idx), want_idx)
        assert gx.shape == (1, 32, k, 3)
        assert gp.shape == (1, 32, k, 8)
        # centered: adding back the center recovers the gathered xyz
        gathered = np.asarray(xyz)[0][want_idx[0]]
        np.testing.assert_allclose(
            np.asarray(gx)[0] + np.asarray(xyz)[0][:, None],
            gathered, atol=1e-6,
        )


class TestGeometryExtras:
    def test_covariance_oracle(self, rng):
        from dispu_tpu.ops.geometry import covariance_matrix

        pc = rng.randn(2, 4, 6, 3).astype(np.float32)
        bary, cov = covariance_matrix(jnp.asarray(pc))
        want_b = pc.mean(axis=2, keepdims=True)
        centered = pc - want_b
        want_c = np.einsum("bpki,bpkj->bpij", centered, centered)
        np.testing.assert_allclose(np.asarray(bary), want_b, atol=1e-5)
        np.testing.assert_allclose(np.asarray(cov), want_c, atol=1e-4)

    def test_exponential_distance(self, rng):
        from dispu_tpu.ops.geometry import exponential_distance

        q = rng.randn(1, 5, 7, 3).astype(np.float32)
        p = rng.randn(1, 5, 7, 3).astype(np.float32)
        d, e = exponential_distance(jnp.asarray(q), jnp.asarray(p))
        want_d = np.sum((q - p) ** 2, -1, keepdims=True)
        np.testing.assert_allclose(np.asarray(d), want_d, atol=1e-5)
        h = np.mean(np.min(want_d, axis=2, keepdims=True), axis=1,
                    keepdims=True)
        np.testing.assert_allclose(
            np.asarray(e), np.exp(-want_d / (h / 2)), rtol=1e-4
        )

    def test_grid_helpers(self):
        from dispu_tpu.ops.geometry import gen_1d_grid, gen_2d_grid

        g2 = np.asarray(gen_2d_grid(3))
        assert g2.shape == (9, 2)
        assert g2.min() == -0.2 and g2.max() == 0.2
        g1 = np.asarray(gen_1d_grid(5))
        assert g1.shape == (1, 5)
        assert g1.min() == -0.02 and g1.max() == 0.02


class TestPatches:
    def test_train_fps_seeds(self, rng):
        from dispu_tpu.ops.patches import extract_patches_train

        xyz = jnp.asarray(rng.randn(2, 64, 3), jnp.float32)
        feats = jnp.asarray(rng.randn(2, 64, 5), jnp.float32)
        gt = jnp.asarray(rng.randn(2, 256, 3), jnp.float32)
        patches, fpatches, gtp = extract_patches_train(
            xyz, k=16, patch_num=4, batch_features=feats, gt_xyz=gt, gt_k=64
        )
        assert patches.shape == (8, 16, 3)
        assert fpatches.shape == (8, 16, 5)
        assert gtp.shape == (8, 64, 3)
        # each patch is a subset of the source cloud (fold is patch-major:
        # rows [0..b) are patch 0 of every cloud)
        src = np.asarray(xyz)[0]
        p0 = np.asarray(patches)[0]
        d = np.abs(p0[:, None] - src[None]).sum(-1).min(1)
        assert d.max() < 1e-6

    def test_train_random_seed(self, rng):
        from dispu_tpu.ops.patches import extract_patches_train

        xyz = jnp.asarray(rng.randn(2, 64, 3), jnp.float32)
        patches, _, _ = extract_patches_train(
            xyz, k=16, patch_num=1, key=jax.random.PRNGKey(0)
        )
        assert patches.shape == (2, 16, 3)

    def test_test_path_filters_outliers(self, rng):
        from dispu_tpu.ops.patches import extract_patches_test

        pts = rng.randn(128, 3).astype(np.float32) * 0.1
        pts[0] = [100.0, 100.0, 100.0]  # gross outlier
        patches, seeds = extract_patches_test(pts, k=32)
        assert patches.shape[1:] == (32, 3)
        assert np.abs(patches).max() < 50.0  # outlier never gathered


class TestModelUtilsLosses:
    def test_repulsion4_numpy_oracle(self, rng):
        from dispu_tpu import losses as L
        from dispu_tpu.ops.grouping import group_point, query_ball_point

        pred = rng.randn(1, 64, 3).astype(np.float32) * 0.05
        got = float(L.repulsion4(jnp.asarray(pred)))
        # literal transcription of ref:Common/model_utils.py:189-207
        idx, _ = query_ball_point(0.07, 20, jnp.asarray(pred),
                                  jnp.asarray(pred))
        grouped = np.asarray(group_point(jnp.asarray(pred), idx))
        grouped = grouped - pred[:, :, None, :]
        d2 = np.sum(grouped**2, -1)
        d2 = np.sort(d2, axis=-1)[..., :5][..., 1:]  # 5 smallest, drop self
        d2 = np.maximum(d2, 1e-12)
        d = np.sqrt(d2)
        want = np.mean(0.07 - d * np.exp(-d2 / 0.03**2))
        assert got == pytest.approx(want, rel=1e-4)

    def test_perulsion_l1_l2(self, rng):
        from dispu_tpu import losses as L

        pred = jnp.asarray(rng.randn(1, 64, 3) * 0.01, jnp.float32)
        l2 = float(L.perulsion_loss(pred, use_knn=True))
        l1 = float(L.perulsion_loss(pred, use_knn=True, use_l1=True))
        assert np.isfinite(l1) and np.isfinite(l2)
        assert l1 > 0 and l2 > 0
        assert L.get_perulsion_loss is L.perulsion_loss

    def test_cd_loss2_matches_unnormalized_chamfer(self, rng):
        from dispu_tpu import losses as L

        a = jnp.asarray(rng.randn(2, 32, 3), jnp.float32)
        b = jnp.asarray(rng.randn(2, 48, 3), jnp.float32)
        got = float(L.cd_loss2(a, b, threshold=None))
        want = float(L.chamfer(a, b, radius=1.0))
        assert got == pytest.approx(want, rel=1e-6)

    def test_uniform_knn_prefers_grid(self, rng):
        from dispu_tpu import losses as L

        g = np.stack(np.meshgrid(*[np.linspace(0, 1, 5)] * 2), -1)
        grid = np.concatenate(
            [g.reshape(-1, 2), np.zeros((25, 1))], -1
        )[None].astype(np.float32)
        rnd = rng.rand(1, 25, 3).astype(np.float32)
        assert float(L.uniform_knn(jnp.asarray(grid))) < float(
            L.uniform_knn(jnp.asarray(rnd))
        )
