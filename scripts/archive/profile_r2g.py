"""Round-2 session G: train step after stop-grad kNN selection +
repulsion-v2 (rank by kernel dists, gather only the 5 winners).

Run: cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
        python -u scripts/profile_r2g.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from scripts.harness import timed

R = np.random.RandomState(0)


def main():
    print("backend:", jax.default_backend(), flush=True)

    from dispu_tpu.ops.grouping import query_ball_point
    from dispu_tpu.ops.pallas_kernels import query_ball_pallas
    from dispu_tpu import losses as L

    pts = jnp.asarray(R.randn(28, 1024, 3) * 0.5, jnp.float32)

    # with_dists parity on-chip
    for radius in (0.07, 0.5):
        i_x, c_x, d_x = jax.jit(lambda p: query_ball_point(
            radius, 20, p, p, impl="xla", return_dists=True))(pts)
        i_p, c_p, d_p = jax.jit(lambda p: query_ball_pallas(
            radius, 20, p, p, with_dists=True))(pts)
        iok = bool(jnp.array_equal(i_x, i_p) and jnp.array_equal(c_x, c_p))
        ddev = float(jnp.max(jnp.abs(d_x - d_p)))
        print(f"ball+dists r={radius}: idx/cnt {'ok' if iok else 'MISMATCH'}"
              f" dist max|dev|={ddev:.3e}", flush=True)

    timed("repulsion v2 fwd (28,1024)",
          lambda x: L.repulsion(x, nsample=20, radius=0.07), (pts,))
    timed("repulsion v2 fwd+bwd",
          lambda x: jax.grad(
              lambda z: L.repulsion(z, nsample=20, radius=0.07))(x),
          (pts,), iters=15)

    # grad-through-gathered-neighborhood: stop-grad selection effect
    from dispu_tpu.ops.knn import knn, knn_indices
    from dispu_tpu.ops.grouping import group_point

    xyz = jnp.asarray(R.randn(28, 1024, 3), jnp.float32)

    def loss_old(p):
        _, idx = knn(16, p, p)
        g = group_point(p, idx, impl="onehot_hp")
        return jnp.sum(jnp.sin(g))

    def loss_new(p):
        idx = knn_indices(16, p, p)
        g = group_point(p, idx, impl="onehot_hp")
        return jnp.sum(jnp.sin(g))

    timed("knn-select+gather grad [dist cotangent materialized]",
          lambda p: jax.grad(loss_old)(p), (xyz,), iters=15)
    timed("knn-select+gather grad [stop-grad selection]",
          lambda p: jax.grad(loss_new)(p), (xyz,), iters=15)

    # full train + gan steps
    from dispu_tpu.config import ExperimentConfig, TrainConfig
    from dispu_tpu.train.state import create_generator_state
    from dispu_tpu.train.steps import make_train_step
    from dispu_tpu.train.gan_steps import create_gan_state, make_gan_train_step

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
    print("train total finite:", bool(np.isfinite(float(jnp.sum(tot)))),
          flush=True)
    t0 = time.perf_counter()
    s2, tot = loop(state)
    float(jnp.sum(tot))
    ms = (time.perf_counter() - t0) / 20 * 1000
    print(f"train step b=28: {ms:.2f} ms/step ({28_000 / ms:.0f} p/s)",
          flush=True)

    gstep = make_gan_train_step(cfg, mesh=None, donate=False)
    gstate = create_gan_state(jax.random.PRNGKey(2), cfg)

    @jax.jit
    def gloop(gs):
        def body(s, _):
            s2, m = gstep(s, gt, rad,
                          jax.random.fold_in(jax.random.PRNGKey(3),
                                             s.gen.step))
            return s2, m["total"]
        return jax.lax.scan(body, gs, None, length=10)

    g2, tot = gloop(gstate)
    float(jnp.sum(tot))
    t0 = time.perf_counter()
    g2, tot = gloop(gstate)
    float(jnp.sum(tot))
    ms = (time.perf_counter() - t0) / 10 * 1000
    print(f"gan step b=28: {ms:.2f} ms/step", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
