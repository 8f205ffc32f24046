"""Golden numeric-drift guards.

Fixed-seed forward statistics of the flagship model on CPU.  These catch
accidental semantic changes (layer wiring, init, op behavior) across
refactors — the kind of drift unit tests on individual ops can miss.
If a change is *intentional* (architecture/config change), update the
constants and say so in the commit message.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dispu_tpu.config import GeneratorConfig
from dispu_tpu.models.generator import DisPUGenerator

# Constants captured on CPU (x64 disabled), jax 0.9.0, seed 0.
GOLDEN = {
    "coarse_mean": 0.0241935253,
    "coarse_std": 0.2636114359,
    "fine_mean": -0.0252040364,
    "fine_std": 0.2852306068,
    "param_count": 784774,
}


def _setup():
    cfg = GeneratorConfig(num_points=64, knn=8, refine_nsample=8)
    model = DisPUGenerator(cfg=cfg)
    x = jnp.asarray(
        np.random.RandomState(1234).randn(2, 64, 3), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model, variables, x


class TestGolden:
    def test_forward_statistics(self):
        model, variables, x = _setup()
        coarse, fine = model.apply(variables, x, train=False)
        got = {
            "coarse_mean": float(jnp.mean(coarse)),
            "coarse_std": float(jnp.std(coarse)),
            "fine_mean": float(jnp.mean(fine)),
            "fine_std": float(jnp.std(fine)),
        }
        for k, want in GOLDEN.items():
            if k == "param_count":
                continue
            np.testing.assert_allclose(got[k], want, rtol=1e-4, err_msg=k)

    def test_param_count(self):
        _, variables, _ = _setup()
        count = sum(
            int(np.prod(p.shape))
            for p in jax.tree_util.tree_leaves(variables["params"])
        )
        assert count == GOLDEN["param_count"], count


class TestShippedDataGolden:
    """Golden values on the shipped test clouds (demo/gt mirrors the
    reference's data/test files — SURVEY.md §4 asks for golden-value tests
    on these).  Pins the xyz reader, normalization, and FPS seed walk."""

    def test_icosahedron_normalization_and_seeds(self):
        from dispu_tpu.evaluation.meshio import read_xyz
        from dispu_tpu.ops.geometry import normalize_point_cloud
        from dispu_tpu.ops.sampling import farthest_point_sample

        pc = read_xyz("demo/gt/Icosahedron.xyz")[:, :3]
        assert pc.shape == (2048, 3)
        norm, centroid, furthest = normalize_point_cloud(jnp.asarray(pc))
        np.testing.assert_allclose(
            np.asarray(centroid).ravel(),
            [0.0015769233, -0.0019079042, 0.0049190465],
            atol=1e-6,
        )
        np.testing.assert_allclose(
            float(np.asarray(furthest).ravel()[0]), 0.99387646, atol=1e-6
        )
        seeds = farthest_point_sample(8, jnp.asarray(norm)[None])[0]
        np.testing.assert_array_equal(
            np.asarray(seeds), [0, 496, 1809, 1455, 721, 501, 106, 992]
        )

    def test_fandisk_reads(self):
        from dispu_tpu.evaluation.meshio import read_xyz

        pc = read_xyz("demo/gt/fandisk.xyz")[:, :3]
        assert pc.shape == (2048, 3)
        np.testing.assert_allclose(
            pc.mean(0), [0.013948, 0.00665, 0.030092], atol=1e-5
        )
