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
