"""Sharded whole-cloud evaluation + h5 data path tests."""

import jax.numpy as jnp
import numpy as np

from dispu_tpu.evaluation.metrics import cd_hd
from dispu_tpu.ops.chamfer import nn_distance
from dispu_tpu.parallel.mesh import make_mesh
from dispu_tpu.parallel.sharded_eval import sharded_cd_hd


class TestShardedEval:
    def test_matches_single_device(self, rng):
        pred = jnp.asarray(rng.randn(1000, 3), jnp.float32)
        gt = jnp.asarray(rng.randn(800, 3), jnp.float32)
        mesh = make_mesh()
        cd_s, hd_s = sharded_cd_hd(mesh, pred, gt)

        fwd, _, bwd, _ = nn_distance(pred[None], gt[None])
        cd_ref = float(jnp.mean(fwd) + jnp.mean(bwd))
        hd_ref = float(jnp.max(fwd) + jnp.max(bwd))
        np.testing.assert_allclose(float(cd_s), cd_ref, rtol=1e-5)
        np.testing.assert_allclose(float(hd_s), hd_ref, rtol=1e-5)

    def test_non_divisible_sizes(self, rng):
        # 1003 and 777 are not divisible by 8 — padding must not change results
        pred = jnp.asarray(rng.randn(1003, 3), jnp.float32)
        gt = jnp.asarray(rng.randn(777, 3), jnp.float32)
        mesh = make_mesh()
        cd_s, hd_s = sharded_cd_hd(mesh, pred, gt)
        fwd, _, bwd, _ = nn_distance(pred[None], gt[None])
        np.testing.assert_allclose(
            float(cd_s), float(jnp.mean(fwd) + jnp.mean(bwd)), rtol=1e-5
        )
        np.testing.assert_allclose(
            float(hd_s), float(jnp.max(fwd) + jnp.max(bwd)), rtol=1e-5
        )


class TestH5Path:
    def test_h5_roundtrip(self, rng, tmp_path):
        """Exercise the real PU-GAN h5 loading path end to end."""
        import h5py

        from dispu_tpu.data.dataset import PatchDataset

        path = str(tmp_path / "PUGAN_poisson_64_poisson_256.h5")
        dense = rng.randn(10, 256, 3).astype(np.float32) * 3 + 1
        sparse = dense[:, :64]
        with h5py.File(path, "w") as f:
            f.create_dataset("poisson_256", data=dense)
            f.create_dataset("poisson_64", data=sparse)

        # random mode: input column = dense cloud, both normalized together
        ds = PatchDataset(h5_path=path, num_point=64, up_ratio=4,
                          random_input=True)
        assert len(ds) == 10
        assert ds.gt.shape == (10, 256, 3)
        radii = np.sqrt((ds.gt**2).sum(-1)).max(axis=1)
        np.testing.assert_allclose(radii, 1.0, atol=1e-5)

        # non-random mode reads the sparse input column
        ds2 = PatchDataset(h5_path=path, num_point=64, up_ratio=4,
                           random_input=False)
        assert ds2.inputs.shape == (10, 64, 3)
        batches = list(ds2.epoch(4))
        assert len(batches) == 2
