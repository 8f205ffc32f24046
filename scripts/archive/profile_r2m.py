"""Round-2 session M: in-kernel top-5 ball selection — on-chip parity + step.

Run: cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
        python -u scripts/profile_r2m.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from scripts.harness import timed

R = np.random.RandomState(0)


def main():
    print("backend:", jax.default_backend(), flush=True)

    from dispu_tpu import losses as L
    from dispu_tpu.ops.grouping import query_ball_point
    from dispu_tpu.ops.pallas_kernels import query_ball_pallas

    pts = jnp.asarray(R.randn(28, 1024, 3) * 0.5, jnp.float32)
    for radius in (0.07, 0.5):
        _, _, want = jax.jit(lambda p: query_ball_point(
            radius, 20, p, p, impl="xla", select_smallest=5))(pts)
        _, _, got = jax.jit(lambda p: query_ball_pallas(
            radius, 20, p, p, select_smallest=5))(pts)
        print(f"select5 r={radius} parity:",
              bool(jnp.array_equal(want, got)), flush=True)

    timed("repulsion v3 fwd (in-kernel top5)",
          lambda x: L.repulsion(x, nsample=20, radius=0.07), (pts,))
    timed("repulsion v3 fwd+bwd",
          lambda x: jax.grad(
              lambda z: L.repulsion(z, nsample=20, radius=0.07))(x),
          (pts,), iters=15)

    from dispu_tpu.config import ExperimentConfig, TrainConfig
    from dispu_tpu.train.state import create_generator_state
    from dispu_tpu.train.steps import make_train_step

    cfg = ExperimentConfig(train=TrainConfig(batch_size=28))
    step = make_train_step(cfg, mesh=None, donate=False)
    state = create_generator_state(
        jax.random.PRNGKey(0), cfg.generator, cfg.train)
    gt = jnp.asarray(
        R.randn(28, cfg.generator.num_out_points, 3), jnp.float32)
    rad = jnp.ones((28,), jnp.float32)

    @jax.jit
    def loop(state):
        def body(s, _):
            s2, m = step(s, gt, rad,
                         jax.random.fold_in(jax.random.PRNGKey(1), s.step))
            return s2, m["total"]
        return jax.lax.scan(body, state, None, length=20)

    s2, tot = loop(state)
    float(jnp.sum(tot))
    t0 = time.perf_counter()
    s2, tot = loop(state)
    float(jnp.sum(tot))
    ms = (time.perf_counter() - t0) / 20 * 1000
    print(f"train step b=28: {ms:.2f} ms/step ({28_000 / ms:.0f} p/s)",
          flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
