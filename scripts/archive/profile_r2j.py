"""Round-2 session J: chamfer-via-kNN-kernel + scaled-config timings.

Run: cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
        python -u scripts/profile_r2j.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from scripts.harness import timed

R = np.random.RandomState(0)


def main():
    print("backend:", jax.default_backend(), flush=True)

    from dispu_tpu.ops.chamfer import nn_distance
    from dispu_tpu.ops.geometry import pairwise_sq_dist
    from dispu_tpu.ops.pallas_kernels import knn_pallas

    a = jnp.asarray(R.randn(28, 1024, 3), jnp.float32)
    b_ = jnp.asarray(R.randn(28, 1024, 3), jnp.float32)

    # on-chip parity: k=1 kernel selection vs XLA argmin
    d = jax.jit(pairwise_sq_dist)(a, b_)
    idx_ref = jnp.argmin(d, axis=-1).astype(jnp.int32)
    _, idx_k = jax.jit(lambda x, y: knn_pallas(1, y, x))(a, b_)
    print("chamfer k1 idx parity:",
          bool(jnp.array_equal(idx_ref, idx_k[..., 0])), flush=True)

    timed("nn_distance fwd [k1 kernel]",
          lambda x, y: nn_distance(x, y), (a, b_))
    timed("nn_distance fwd+bwd [k1 kernel]",
          lambda x, y: jax.grad(
              lambda p, g: jnp.sum(nn_distance(p, g)[0]) +
                           jnp.sum(nn_distance(p, g)[2]),
              argnums=(0, 1))(x, y),
          (a, b_), iters=15)

    # train + e2e with the chamfer change
    from dispu_tpu.config import ExperimentConfig, GeneratorConfig, TrainConfig
    from dispu_tpu.models.generator import DisPUGenerator
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

    inp = jnp.asarray(R.randn(64, 256, 3), jnp.float32)
    model = DisPUGenerator(cfg=GeneratorConfig())
    vs = jax.jit(lambda: model.init(jax.random.PRNGKey(0), inp,
                                    train=False))()
    ms = timed("e2e fwd b=64 [exact default]",
               lambda v, x: model.apply(v, x, train=False), (vs, inp),
               iters=20)
    print(f"   -> {64 / (ms / 1000):.0f} patches/sec", flush=True)

    # scaled-up variant: 2x growth rate / 2x refine mlp — production-scale
    # sanity that throughput degrades gracefully with model width
    big = GeneratorConfig(growth_rate=48, refine_mlp=(256, 256, 512))
    model_b = DisPUGenerator(cfg=big)
    vs_b = jax.jit(lambda: model_b.init(jax.random.PRNGKey(0), inp,
                                        train=False))()
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(vs_b["params"]))
    print(f"2x-width config: {n_params/1e6:.2f}M params", flush=True)
    ms = timed("e2e fwd b=64 [2x width]",
               lambda v, x: model_b.apply(v, x, train=False), (vs_b, inp),
               iters=10)
    print(f"   -> {64 / (ms / 1000):.0f} patches/sec", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
