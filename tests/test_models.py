"""Shape/behavior tests for the generator and discriminator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dispu_tpu.config import DiscriminatorConfig, GeneratorConfig
from dispu_tpu.models import DisPUGenerator, PatchDiscriminator

# tiny configuration for fast CPU compiles (1-core test env)
TINY = GeneratorConfig(num_points=64, knn=8, refine_nsample=8)


@pytest.fixture(scope="module")
def gen_setup():
    model = DisPUGenerator(cfg=TINY)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model, variables, x


class TestGenerator:
    def test_output_shapes(self, gen_setup):
        model, variables, x = gen_setup
        coarse, fine = model.apply(variables, x, train=False)
        assert coarse.shape == (2, 256, 3)
        assert fine.shape == (2, 256, 3)

    def test_fast_knn_plumbing(self, gen_setup):
        """``fast_knn=True`` routes the packed turbo selection into the
        backbone + refiner kNNs; off-TPU the kNN falls back to the exact
        XLA path (variant ignored), so outputs must be bit-identical —
        this pins the config plumbing, the kernel deviation is pinned by
        tests/test_pallas.py::test_packed_turbo_variant."""
        import dataclasses

        model, variables, x = gen_setup
        fast = DisPUGenerator(cfg=dataclasses.replace(TINY, fast_knn=True))
        a = model.apply(variables, x, train=False)
        b = fast.apply(variables, x, train=False)
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))

    def test_backbone_channel_math(self, gen_setup):
        # the DenseGCN feature before upsampling must be 480-ch for the
        # default config (ref:Common/ops.py:1458-1482 channel comments)
        model = DisPUGenerator(cfg=GeneratorConfig())
        x = jnp.zeros((1, 32, 3))
        from dispu_tpu.nn.edgeconv import FeatureExtractorGCN

        fe = FeatureExtractorGCN(growth_rate=24, dense_block=4, k=8)
        v = fe.init(jax.random.PRNGKey(0), x)
        out = fe.apply(v, x)
        assert out.shape[-1] == 480

    def test_deterministic(self, gen_setup):
        model, variables, x = gen_setup
        a = model.apply(variables, x, train=False)
        b = model.apply(variables, x, train=False)
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))

    def test_fine_offset_bounded(self, gen_setup):
        # fine = coarse + sigmoid-bounded offset in (-0.5, 0.5)
        model, variables, x = gen_setup
        coarse, fine = model.apply(variables, x, train=False)
        off = np.asarray(fine - coarse)
        assert np.abs(off).max() < 0.5

    def test_batchnorm_stats_exist(self, gen_setup):
        # weight_net_hidden always carries BN (ref:Common/ops.py:181-191)
        _, variables, _ = gen_setup
        flat = jax.tree_util.tree_leaves_with_path(variables["batch_stats"])
        assert len(flat) > 0
        names = [jax.tree_util.keystr(p) for p, _ in flat]
        assert any("weight_net" in n for n in names)

    def test_train_mode_mutable_stats(self, gen_setup):
        model, variables, x = gen_setup
        (coarse, fine), updates = model.apply(
            variables, x, train=True, mutable=["batch_stats"]
        )
        assert coarse.shape == (2, 256, 3)
        assert "batch_stats" in updates


class TestDiscriminator:
    def test_patch_values_shape(self):
        cfg = DiscriminatorConfig()
        model = PatchDiscriminator(cfg=cfg)
        rng = np.random.RandomState(1)
        pred = jnp.asarray(rng.randn(2, 128, 3), jnp.float32)
        gt = jnp.asarray(rng.randn(2, 128, 3), jnp.float32)
        v = model.init(jax.random.PRNGKey(0), pred, gt)
        out = model.apply(v, pred, gt)
        # (b, num_point/8, 2, 1): [:, :, 0] = real(gt), [:, :, 1] = fake(pred)
        assert out.shape == (2, 16, 2, 1)

    def test_real_fake_split(self):
        from dispu_tpu.models.discriminator import split_real_fake

        v = jnp.arange(2 * 4 * 2 * 1, dtype=jnp.float32).reshape(2, 4, 2, 1)
        real, fake = split_real_fake(v)
        assert real.shape == (2, 4, 1)
        np.testing.assert_array_equal(np.asarray(real), np.asarray(v[:, :, 0]))
        np.testing.assert_array_equal(np.asarray(fake), np.asarray(v[:, :, 1]))
