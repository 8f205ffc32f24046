"""Round-2 session E: threshold-walk selection loops + loss decomposition.

Run: cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
        python -u scripts/profile_r2e.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from scripts.harness import timed

R = np.random.RandomState(0)


def main():
    print("backend:", jax.default_backend(), flush=True)

    from dispu_tpu.ops.knn import knn
    from dispu_tpu.ops.grouping import group_point, query_ball_point
    from dispu_tpu.ops.pallas_kernels import knn_pallas, query_ball_pallas

    # ---- parity on-chip after the selection-loop rewrite ----
    xyz = jnp.asarray(R.randn(64, 1024, 3), jnp.float32)
    d_x, i_x = jax.jit(lambda p: knn(16, p, p, impl="xla"))(xyz)
    d_p, i_p = jax.jit(lambda p: knn_pallas(16, p, p))(xyz)
    print("knn threshold-walk parity:",
          bool(jnp.array_equal(i_x, i_p) and jnp.array_equal(d_x, d_p)),
          flush=True)
    # adversarial ties: quantized coords produce many equal distances
    q = jnp.round(xyz * 4.0) / 4.0
    d_x, i_x = jax.jit(lambda p: knn(16, p, p, impl="xla"))(q)
    d_p, i_p = jax.jit(lambda p: knn_pallas(16, p, p))(q)
    print("knn tie-heavy parity:",
          bool(jnp.array_equal(i_x, i_p) and jnp.array_equal(d_x, d_p)),
          flush=True)

    pts = jnp.asarray(R.randn(28, 1024, 3) * 0.5, jnp.float32)
    for radius in (0.07, 0.3, 1.0):
        ix, cx = jax.jit(
            lambda p: query_ball_point(radius, 20, p, p, impl="xla"))(pts)
        ip, cp = jax.jit(
            lambda p: query_ball_pallas(radius, 20, p, p))(pts)
        print(f"ball r={radius} parity:",
              bool(jnp.array_equal(ix, ip) and jnp.array_equal(cx, cp)),
              flush=True)

    # ---- timings ----
    timed("knn (64,1024,3) k16 [threshold-walk]",
          lambda p: knn_pallas(16, p, p), (xyz,))
    feats = jnp.asarray(R.randn(64, 256, 48), jnp.float32)
    timed("knn feat (64,256,48) k17 [threshold-walk]",
          lambda p: knn_pallas(17, p, p), (feats,))
    timed("query_ball (28,1024) ns=20 [threshold-walk]",
          lambda p: query_ball_pallas(0.07, 20, p, p), (pts,))

    # ---- repulsion decomposition ----
    from dispu_tpu import losses as L

    def rep_ball_only(x):
        idx, _ = query_ball_point(0.07, 20, x, x)
        return idx

    def rep_thru_gather(x):
        idx, _ = query_ball_point(0.07, 20, x, x)
        g = group_point(x, idx) - x[:, :, None, :]
        return jnp.sum(g**2, axis=-1)

    def rep_full(x):
        return L.repulsion(x, nsample=20, radius=0.07)

    timed("repulsion: ball only", rep_ball_only, (pts,))
    timed("repulsion: +gather +dists", rep_thru_gather, (pts,))
    timed("repulsion: full (+top_k5 +mean)", rep_full, (pts,))

    # ---- chamfer decomposition at train shapes ----
    from dispu_tpu.ops.chamfer import nn_distance

    a = jnp.asarray(R.randn(28, 1024, 3), jnp.float32)
    b_ = jnp.asarray(R.randn(28, 1024, 3), jnp.float32)
    timed("nn_distance fwd", lambda x, y: nn_distance(x, y), (a, b_))
    timed("nn_distance fwd+bwd",
          lambda x, y: jax.grad(
              lambda p, g: jnp.sum(nn_distance(p, g)[0]) +
                           jnp.sum(nn_distance(p, g)[2]),
              argnums=(0, 1))(x, y),
          (a, b_), iters=15)

    # ---- e2e + train step ----
    from dispu_tpu.config import ExperimentConfig, GeneratorConfig, TrainConfig
    from dispu_tpu.models.generator import DisPUGenerator
    from dispu_tpu.train.state import create_generator_state
    from dispu_tpu.train.steps import make_train_step

    inp = jnp.asarray(R.randn(64, 256, 3), jnp.float32)
    model = DisPUGenerator(cfg=GeneratorConfig())
    vs = jax.jit(lambda: model.init(jax.random.PRNGKey(0), inp,
                                    train=False))()
    ms = timed("e2e fwd b=64 [exact default]",
               lambda v, x: model.apply(v, x, train=False), (vs, inp),
               iters=20)
    print(f"   -> {64 / (ms / 1000):.0f} patches/sec", flush=True)

    model_t = DisPUGenerator(cfg=GeneratorConfig(
        fast_gather=True, fast_gather_backbone=True))
    vs_t = jax.jit(lambda: model_t.init(jax.random.PRNGKey(0), inp,
                                        train=False))()
    ms = timed("e2e fwd b=64 [turbo]",
               lambda v, x: model_t.apply(v, x, train=False), (vs_t, inp),
               iters=20)
    print(f"   -> {64 / (ms / 1000):.0f} patches/sec", flush=True)

    for bs in (28, 64):
        cfg = ExperimentConfig(train=TrainConfig(batch_size=bs))
        step = make_train_step(cfg, mesh=None, donate=False)
        state = create_generator_state(
            jax.random.PRNGKey(0), cfg.generator, cfg.train)
        gt = jnp.asarray(
            R.randn(bs, cfg.generator.num_out_points, 3), jnp.float32)
        rad = jnp.ones((bs,), jnp.float32)

        @jax.jit
        def loop(state, gt=gt, rad=rad, step=step):
            def body(s, _):
                s2, m = step(s, gt, rad,
                             jax.random.fold_in(jax.random.PRNGKey(1),
                                                s.step))
                return s2, m["total"]
            return jax.lax.scan(body, state, None, length=20)

        s2, tot = loop(state)
        float(jnp.sum(tot))
        t0 = time.perf_counter()
        s2, tot = loop(state)
        float(jnp.sum(tot))
        ms = (time.perf_counter() - t0) / 20 * 1000
        print(f"train step b={bs}: {ms:.2f} ms/step "
              f"({bs * 1000 / ms:.0f} p/s)", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
