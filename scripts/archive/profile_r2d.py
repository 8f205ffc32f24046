"""Round-2 session D: verify + time the ball-query kernel and t-major pool.

Run: cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
        python -u scripts/profile_r2d.py
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

    # ---- on-chip parity: bit-equal idx + cnt across regimes ----
    pts = jnp.asarray(R.randn(28, 1024, 3) * 0.5, jnp.float32)
    for radius in (0.07, 0.3, 1.0):
        i_x, c_x = jax.jit(
            lambda p: query_ball_point(radius, 20, p, p, impl="xla"))(pts)
        i_p, c_p = jax.jit(
            lambda p: query_ball_pallas(radius, 20, p, p))(pts)
        ok = bool(jnp.array_equal(i_x, i_p) and jnp.array_equal(c_x, c_p))
        print(f"ball r={radius}: parity {'ok' if ok else 'MISMATCH'}",
              flush=True)

    timed("query_ball (28,1024) ns=20 xla",
          lambda p: query_ball_point(0.07, 20, p, p, impl="xla"), (pts,))
    timed("query_ball (28,1024) ns=20 pallas",
          lambda p: query_ball_pallas(0.07, 20, p, p), (pts,))

    from dispu_tpu import losses as L

    timed("repulsion loss (28,1024) [now pallas ball]",
          lambda x: L.repulsion(x, nsample=20, radius=0.07), (pts,))
    timed("uniform loss fast (28,1024) [now pallas ball]",
          lambda x: L.uniform(x), (pts,))
    timed("repulsion+grad",
          lambda x: jax.grad(
              lambda z: L.repulsion(z, nsample=20, radius=0.07))(x),
          (pts,), iters=15)

    # ---- e2e with t-major pooling ----
    from dispu_tpu.config import ExperimentConfig, GeneratorConfig, TrainConfig
    from dispu_tpu.models.generator import DisPUGenerator

    inp = jnp.asarray(R.randn(64, 256, 3), jnp.float32)
    model = DisPUGenerator(cfg=GeneratorConfig())
    vs = jax.jit(lambda: model.init(jax.random.PRNGKey(0), inp,
                                    train=False))()
    ms = timed("e2e fwd b=64 [onehot_hp + tmajor pool]",
               lambda v, x: model.apply(v, x, train=False), (vs, inp),
               iters=20)
    print(f"   -> {64 / (ms / 1000):.0f} patches/sec", flush=True)

    model_t = DisPUGenerator(cfg=GeneratorConfig(
        fast_gather=True, fast_gather_backbone=True))
    vs_t = jax.jit(lambda: model_t.init(jax.random.PRNGKey(0), inp,
                                        train=False))()
    ms = timed("e2e fwd b=64 [turbo + tmajor pool]",
               lambda v, x: model_t.apply(v, x, train=False), (vs_t, inp),
               iters=20)
    print(f"   -> {64 / (ms / 1000):.0f} patches/sec", flush=True)

    # ---- train + gan steps ----
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
    float(jnp.sum(tot))
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
