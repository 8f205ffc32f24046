"""GAN-variant training tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dispu_tpu.config import (
    DataConfig,
    DiscriminatorConfig,
    ExperimentConfig,
    GeneratorConfig,
    LossConfig,
    TrainConfig,
)
from dispu_tpu.train.gan_steps import create_gan_state, make_gan_train_step

TINY_CFG = ExperimentConfig(
    generator=GeneratorConfig(num_points=32, knn=8, refine_nsample=8),
    discriminator=DiscriminatorConfig(),
    train=TrainConfig(batch_size=4),
    data=DataConfig(num_point=32),
    loss=LossConfig(repulsion_nsample=8),
    use_gan=True,
)


@pytest.fixture(scope="module")
def gan_state():
    return create_gan_state(jax.random.PRNGKey(0), TINY_CFG)


class TestGANStep:
    def test_step_runs(self, rng, gan_state):
        step = make_gan_train_step(TINY_CFG, donate=False)
        gt = jnp.asarray(rng.randn(4, 128, 3), jnp.float32)
        radius = jnp.ones((4,))
        new_state, metrics = step(gan_state, gt, radius, jax.random.PRNGKey(1))
        for k in ("total", "d_loss", "g_gan", "uniform", "fine_cd"):
            assert np.isfinite(float(metrics[k])), k
        assert int(new_state.gen.step) == 1

    def test_d_params_clipped(self, rng, gan_state):
        step = make_gan_train_step(TINY_CFG, donate=False)
        gt = jnp.asarray(rng.randn(4, 128, 3), jnp.float32)
        radius = jnp.ones((4,))
        new_state, _ = step(gan_state, gt, radius, jax.random.PRNGKey(1))
        for leaf in jax.tree_util.tree_leaves(new_state.d_params):
            assert float(jnp.abs(leaf).max()) <= 0.01 + 1e-7

    def test_both_networks_update(self, rng, gan_state):
        step = make_gan_train_step(TINY_CFG, donate=False)
        gt = jnp.asarray(rng.randn(4, 128, 3), jnp.float32)
        radius = jnp.ones((4,))
        new_state, _ = step(gan_state, gt, radius, jax.random.PRNGKey(1))

        def max_diff(a, b):
            return max(
                jax.tree_util.tree_leaves(
                    jax.tree_util.tree_map(
                        lambda x, y: float(jnp.abs(x - y).max()), a, b
                    )
                )
            )

        assert max_diff(gan_state.gen.params, new_state.gen.params) > 0
        assert max_diff(gan_state.d_params, new_state.d_params) > 0
