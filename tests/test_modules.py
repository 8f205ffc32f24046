"""Tests for the extended module zoo: PointNet++, GCN lib, up/down blocks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dispu_tpu.nn.gcn import (
    EdgeConvLayer,
    GCNBackbone,
    GINConvLayer,
    GraphSAGEConvLayer,
    MaxRelativeConvLayer,
    dilated_knn_graph,
    knn_graph,
)
from dispu_tpu.nn.pointnet import (
    PointNetFPModule,
    PointNetSAModule,
    PointNetSAModuleMSG,
    sample_and_group,
    sample_and_group_all,
)
from dispu_tpu.nn.upsample import DownBlock, UpBlock, UpProjectionUnit


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.randn(2, 64, 3), jnp.float32)
    feat = jnp.asarray(rng.randn(2, 64, 16), jnp.float32)
    return xyz, feat


class TestPointNet:
    def test_sample_and_group_shapes(self, cloud):
        xyz, feat = cloud
        new_xyz, new_points, idx, grouped = sample_and_group(
            16, 0.4, 8, xyz, feat
        )
        assert new_xyz.shape == (2, 16, 3)
        assert new_points.shape == (2, 16, 8, 19)  # 3 + 16
        assert grouped.shape == (2, 16, 8, 3)

    def test_group_all(self, cloud):
        xyz, feat = cloud
        new_xyz, new_points, idx, grouped = sample_and_group_all(xyz, feat)
        assert new_xyz.shape == (2, 1, 3)
        assert new_points.shape == (2, 1, 64, 19)

    def test_sa_module_poolings(self, cloud):
        xyz, feat = cloud
        for pooling in ("max", "avg", "weighted_avg", "max_and_avg"):
            mod = PointNetSAModule(
                npoint=16, radius=0.4, nsample=8, mlp=(32, 64), pooling=pooling
            )
            v = mod.init(jax.random.PRNGKey(0), xyz, feat)
            new_xyz, new_points, _ = mod.apply(v, xyz, feat)
            want_c = 128 if pooling == "max_and_avg" else 64
            assert new_points.shape == (2, 16, want_c), pooling

    def test_msg_module(self, cloud):
        xyz, feat = cloud
        mod = PointNetSAModuleMSG(
            npoint=16,
            radius_list=(0.2, 0.4),
            nsample_list=(4, 8),
            mlp_list=((16, 32), (16, 48)),
        )
        v = mod.init(jax.random.PRNGKey(0), xyz, feat)
        new_xyz, out = mod.apply(v, xyz, feat)
        assert out.shape == (2, 16, 80)  # 32 + 48

    def test_fp_module_interpolates(self, cloud):
        xyz, feat = cloud
        xyz2 = xyz[:, :16]
        feat2 = feat[:, :16]
        mod = PointNetFPModule(mlp=(32,))
        v = mod.init(jax.random.PRNGKey(0), xyz, xyz2, feat, feat2)
        out = mod.apply(v, xyz, xyz2, feat, feat2)
        assert out.shape == (2, 64, 32)


class TestGCN:
    def test_knn_graph_self_first(self, cloud):
        xyz, _ = cloud
        idx = knn_graph(xyz, 8)
        np.testing.assert_array_equal(
            np.asarray(idx)[..., 0], np.tile(np.arange(64), (2, 1))
        )

    def test_dilated_graph(self, cloud):
        xyz, _ = cloud
        idx = dilated_knn_graph(xyz, 4, dilation=2)
        assert idx.shape == (2, 64, 4)
        # dilated picks every 2nd of the 8-NN
        full = knn_graph(xyz, 8)
        np.testing.assert_array_equal(
            np.asarray(idx), np.asarray(full)[..., ::2]
        )

    @pytest.mark.parametrize(
        "layer_cls", [EdgeConvLayer, MaxRelativeConvLayer,
                      GraphSAGEConvLayer, GINConvLayer]
    )
    def test_vertex_layers(self, cloud, layer_cls):
        _, feat = cloud
        idx = knn_graph(feat, 8)
        mod = layer_cls(features=(32,))
        v = mod.init(jax.random.PRNGKey(0), feat, idx)
        out = mod.apply(v, feat, idx)
        assert out.shape == (2, 64, 32)
        assert np.isfinite(np.asarray(out)).all()

    def test_backbone_dense_concat(self, cloud):
        xyz, _ = cloud
        mod = GCNBackbone(depth=2, growth_rate=8, k=4)
        v = mod.init(jax.random.PRNGKey(0), xyz)
        out = mod.apply(v, xyz)
        assert out.shape == (2, 64, 3 + 8 + 8)


class TestUpDownBlocks:
    def test_up_then_down_restores_count(self, cloud):
        _, feat = cloud
        up = UpBlock(up_ratio=4)
        vu = up.init(jax.random.PRNGKey(0), feat)
        h = up.apply(vu, feat)
        assert h.shape == (2, 256, 128)
        down = DownBlock(up_ratio=4)
        vd = down.init(jax.random.PRNGKey(0), h)
        l = down.apply(vd, h)
        assert l.shape == (2, 64, 128)

    def test_up_projection_unit(self, cloud):
        _, feat = cloud
        mod = UpProjectionUnit(up_ratio=4)
        v = mod.init(jax.random.PRNGKey(0), feat)
        out = mod.apply(v, feat)
        assert out.shape == (2, 256, 128)


class TestPermutedRowDense:
    def test_matches_plain_dense_on_permuted_input(self):
        """kernel_row_perm keeps the stored (a,b)-major kernel semantics:
        feeding the (b,a)-major flatten must reproduce the plain layer fed
        the (a,b)-major flatten, with identical params."""
        from dispu_tpu.nn.layers import PointConv

        a, b_inner, feats = 5, 3, 7
        rng = np.random.RandomState(3)
        z = jnp.asarray(rng.randn(4, 10, a, b_inner), jnp.float32)

        plain = PointConv(feats, activation=None)
        perm = PointConv(feats, activation=None,
                         kernel_row_perm=(a, b_inner))

        x_amajor = z.reshape(4, 10, a * b_inner)
        x_bmajor = jnp.swapaxes(z, -1, -2).reshape(4, 10, a * b_inner)

        vs = plain.init(jax.random.PRNGKey(0), x_amajor)
        vs_perm = perm.init(jax.random.PRNGKey(0), x_bmajor)
        # identical param trees (names, shapes, values)
        jax.tree_util.tree_map(
            lambda p, q: np.testing.assert_array_equal(
                np.asarray(p), np.asarray(q)),
            vs, vs_perm,
        )
        out_plain = plain.apply(vs, x_amajor)
        out_perm = perm.apply(vs, x_bmajor)
        np.testing.assert_allclose(
            np.asarray(out_perm), np.asarray(out_plain), atol=1e-6
        )


class TestSplitDenseEdgeBlock:
    """dense_impl='split' distributes each conv over its concat parts —
    same param tree, same math; only f32 summation order differs."""

    @pytest.mark.parametrize("variant", ["default", "v0", "v2"])
    @pytest.mark.parametrize("use_bn", [False, True])
    def test_matches_concat(self, variant, use_bn):
        from dispu_tpu.nn.edgeconv import DenseEdgeBlock

        rng = np.random.RandomState(11)
        feat = jnp.asarray(rng.randn(2, 48, 13), jnp.float32)
        kw = dict(growth_rate=8, n=3, k=6, use_bn=use_bn, variant=variant)
        ref = DenseEdgeBlock(dense_impl="concat", **kw)
        spl = DenseEdgeBlock(dense_impl="split", **kw)

        v_ref = ref.init(jax.random.PRNGKey(0), feat)
        v_spl = spl.init(jax.random.PRNGKey(0), feat)
        # identical param trees (paths, shapes, AND values: same flax
        # param paths -> same init streams), so checkpoints interop
        jax.tree_util.tree_map(
            lambda p, q: np.testing.assert_array_equal(
                np.asarray(p), np.asarray(q)),
            v_ref, v_spl,
        )

        (o_ref, i_ref), _ = ref.apply(
            v_ref, feat, train=True, mutable=["batch_stats"])
        (o_spl, i_spl), _ = spl.apply(
            v_ref, feat, train=True, mutable=["batch_stats"])
        np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i_spl))
        np.testing.assert_allclose(
            np.asarray(o_spl), np.asarray(o_ref), rtol=2e-5, atol=2e-6)

    def test_gradients_match(self):
        from dispu_tpu.nn.edgeconv import DenseEdgeBlock

        rng = np.random.RandomState(12)
        feat = jnp.asarray(rng.randn(2, 48, 13), jnp.float32)
        kw = dict(growth_rate=8, n=3, k=6)
        ref = DenseEdgeBlock(dense_impl="concat", **kw)
        spl = DenseEdgeBlock(dense_impl="split", **kw)
        v = ref.init(jax.random.PRNGKey(1), feat)

        def loss(mod, params, x):
            out, _ = mod.apply(params, x)
            return jnp.sum(out**2)

        g_ref = jax.grad(lambda p: loss(ref, p, feat))(v)
        g_spl = jax.grad(lambda p: loss(spl, p, feat))(v)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-4),
            g_ref, g_spl,
        )
        gx_ref = jax.grad(lambda x: loss(ref, v, x))(feat)
        gx_spl = jax.grad(lambda x: loss(spl, v, x))(feat)
        np.testing.assert_allclose(
            np.asarray(gx_spl), np.asarray(gx_ref), rtol=5e-4, atol=1e-4)

    def test_backbone_and_generator_knob(self):
        """FeatureExtractorGCN / GeneratorConfig.dense_impl plumb through
        and match the concat path at f32 tolerance."""
        from dispu_tpu.config import GeneratorConfig
        from dispu_tpu.models.generator import DisPUGenerator
        from dispu_tpu.nn.edgeconv import FeatureExtractorGCN

        rng = np.random.RandomState(13)
        xyz = jnp.asarray(rng.randn(2, 64, 3), jnp.float32)
        fe_ref = FeatureExtractorGCN(dense_block=2, k=8)
        fe_spl = FeatureExtractorGCN(dense_block=2, k=8, dense_impl="split")
        v = fe_ref.init(jax.random.PRNGKey(2), xyz)
        np.testing.assert_allclose(
            np.asarray(fe_spl.apply(v, xyz)),
            np.asarray(fe_ref.apply(v, xyz)),
            rtol=2e-5, atol=2e-6)

        cfg = GeneratorConfig(num_points=64, knn=8, refine_nsample=8)
        gen_ref = DisPUGenerator(cfg=cfg)
        gen_spl = DisPUGenerator(
            cfg=GeneratorConfig(num_points=64, knn=8, refine_nsample=8,
                                dense_impl="split"))
        vg = gen_ref.init(jax.random.PRNGKey(3), xyz)
        c_ref, f_ref = gen_ref.apply(vg, xyz)
        c_spl, f_spl = gen_spl.apply(vg, xyz)
        np.testing.assert_allclose(
            np.asarray(c_spl), np.asarray(c_ref), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(f_spl), np.asarray(f_ref), rtol=1e-4, atol=1e-5)
