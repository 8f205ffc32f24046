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


class TestGANTrainer:
    def _cfg(self, log_dir):
        import dataclasses

        return dataclasses.replace(
            TINY_CFG,
            train=TrainConfig(batch_size=4, training_epoch=2,
                              epoch_per_save=1, backup_sources=True),
            log_dir=str(log_dir),
        )

    def test_interrupt_resume_roundtrip(self, tmp_path):
        """Crash mid-training → crash checkpoint written → a fresh
        GANTrainer resumes from it (the aux behaviors the reference only
        gave the CD path, ref:DisPU/model.py:56-65,188-227)."""
        import os

        from dispu_tpu.data.dataset import PatchDataset
        from dispu_tpu.train.gan_trainer import GANTrainer

        cfg = self._cfg(tmp_path / "log")
        ds = PatchDataset(h5_path="/nonexistent", synthetic_patches_count=8,
                          num_point=32)
        tr = GANTrainer(cfg, dataset=ds, use_mesh=False)
        # source backup exists (shared aux behavior)
        assert os.path.isdir(os.path.join(cfg.log_dir, "code"))

        calls = {"n": 0}
        real_step = tr.train_step

        def exploding_step(*args, **kw):
            if calls["n"] >= 3:
                raise RuntimeError("boom")
            calls["n"] += 1
            return real_step(*args, **kw)

        tr.train_step = exploding_step
        with pytest.raises(RuntimeError):
            tr.train(epochs=2)
        ckpts = [f for f in os.listdir(cfg.log_dir) if f.endswith(".msgpack")]
        assert ckpts, "crash checkpoint missing"

        tr2 = GANTrainer(cfg, dataset=ds, use_mesh=False)
        state, start_epoch = tr2.init_state(restore=True)
        assert start_epoch >= 1
        final = tr2.train(restore=True, epochs=start_epoch + 1)
        assert int(jax.device_get(final.gen.step)) > 0

    def test_trainer_machinery_is_shared(self):
        from dispu_tpu.train.gan_trainer import GANTrainer
        from dispu_tpu.train.trainer import BaseTrainer, Trainer

        assert issubclass(GANTrainer, BaseTrainer)
        assert issubclass(Trainer, BaseTrainer)
        for name in ("_batches", "train", "_train_loop", "_visualize",
                     "init_state"):
            assert getattr(GANTrainer, name) is getattr(BaseTrainer, name)


class TestGANDataParallel:
    def test_sharded_gan_step(self, rng):
        """D+G fused step jitted over the 8-device mesh: batch sharded,
        both networks' states replicated, finite losses, D clip holds."""
        import dataclasses

        from dispu_tpu.parallel.mesh import (
            make_mesh,
            replicated_sharding,
            shard_batch,
        )

        cfg = dataclasses.replace(
            TINY_CFG, train=TrainConfig(batch_size=16)
        )
        mesh = make_mesh()
        step = make_gan_train_step(cfg, mesh=mesh, donate=False)
        state = create_gan_state(jax.random.PRNGKey(0), cfg)
        state = jax.device_put(state, replicated_sharding(mesh))
        gt = jnp.asarray(rng.randn(16, 128, 3), jnp.float32)
        radius = jnp.ones((16,), jnp.float32)
        gt, radius = shard_batch(mesh, gt, radius)
        new_state, metrics = step(state, gt, radius, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["total"]))
        assert np.isfinite(float(metrics["d_loss"]))
        assert int(jax.device_get(new_state.gen.step)) == 1
        max_d = max(
            float(jnp.abs(p).max())
            for p in jax.tree_util.tree_leaves(new_state.d_params)
        )
        assert max_d <= 0.01 + 1e-6  # weight clip (ref:model_gan.py:222-224)


def test_generator_restores_from_gan_checkpoint(tmp_path):
    """--phase test on a GAN-trained log dir: the checkpoint stores a full
    GANState; the test phase must restore it and use the generator half
    (ref:DisPU/model.py:344-358 restores only the generator scope)."""
    import jax

    from dispu_tpu.config import (DataConfig, ExperimentConfig,
                                  GeneratorConfig, LossConfig, TrainConfig)
    from dispu_tpu.train.gan_steps import create_gan_state
    from dispu_tpu.utils.checkpoint import (latest_checkpoint,
                                            restore_checkpoint,
                                            save_checkpoint)

    gen = GeneratorConfig(num_points=32, knn=8, refine_nsample=8)
    cfg = ExperimentConfig(
        generator=gen,
        train=TrainConfig(batch_size=2),
        data=DataConfig(num_point=32),
        loss=LossConfig(repulsion_nsample=8),
    )
    state = create_gan_state(jax.random.PRNGKey(0), cfg)
    save_checkpoint(str(tmp_path), state, epoch=7)

    epoch, path = latest_checkpoint(str(tmp_path))
    assert epoch == 7
    template = create_gan_state(jax.random.PRNGKey(1), cfg)
    restored = restore_checkpoint(path, template).gen
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(restored.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.gen.params)[0]),
    )
