"""Round-3 session G: where do 64.5 wall - 40.4 bench ms/step go?

Bisects the difference between the scan-method step benchmark (fixed
batch, total-only output) and the real trainer chunk (per-step gather
from the device-resident pool, all metrics kept).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(label, fn, *args, iters=20):
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: None, jax.device_get(jax.tree_util.tree_leaves(out)[0])
    )
    t0 = time.perf_counter()
    out = fn(*args)
    leaves = jax.tree_util.tree_leaves(out)
    float(jnp.sum(leaves[-1])) if hasattr(leaves[-1], "dtype") else None
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{label:58s} {dt:7.2f} ms/step", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    R = np.random.RandomState(0)

    from dispu_tpu.config import ExperimentConfig, TrainConfig
    from dispu_tpu.data.dataset import synthetic_patches
    from dispu_tpu.train.state import create_generator_state
    from dispu_tpu.train.steps import make_train_step

    cfg = ExperimentConfig(train=TrainConfig(batch_size=28))
    raw = make_train_step(cfg, jit_compile=False)
    state0 = create_generator_state(
        jax.random.PRNGKey(0), cfg.generator, cfg.train
    )
    gt_fixed = jnp.asarray(
        R.randn(28, cfg.generator.num_out_points, 3), jnp.float32
    )
    rad = jnp.ones((28,), jnp.float32)
    gt_all, _, rad_all = synthetic_patches(560, 1024, seed=0)
    gt_pool = jnp.asarray(gt_all)
    rad_pool = jnp.asarray(rad_all)
    idx_chunk = jnp.asarray(
        np.stack([R.permutation(560)[:28] for _ in range(20)])
    )

    # 1. fixed batch, only 'total' survives (the round-2/3 bench shape)
    @jax.jit
    def loop_fixed_total(state):
        def body(s, _):
            s2, m = raw(s, gt_fixed, rad,
                        jax.random.fold_in(jax.random.PRNGKey(1), s.step))
            return s2, m["total"]
        return jax.lax.scan(body, state, None, length=20)

    timeit("A fixed batch, total-only", loop_fixed_total, state0)

    # 2. fixed batch, ALL metrics stacked
    @jax.jit
    def loop_fixed_all(state):
        def body(s, _):
            s2, m = raw(s, gt_fixed, rad,
                        jax.random.fold_in(jax.random.PRNGKey(1), s.step))
            return s2, m
        return jax.lax.scan(body, state, None, length=20)

    timeit("B fixed batch, all metrics", loop_fixed_all, state0)

    # 3. per-step pool gather (synthetic data), all metrics
    @jax.jit
    def loop_gather(state, idxc):
        def body(s, idx):
            gt = gt_pool[idx]
            s2, m = raw(s, gt, rad_pool[idx],
                        jax.random.fold_in(jax.random.PRNGKey(1), s.step))
            return s2, m
        return jax.lax.scan(body, state, idxc)

    timeit("C pool gather (synthetic), all metrics", loop_gather,
           state0, idx_chunk)

    # 4. fixed SYNTHETIC batch (data values, not gather, as the variable)
    gt_syn = gt_pool[:28]

    @jax.jit
    def loop_fixed_syn(state):
        def body(s, _):
            s2, m = raw(s, gt_syn, rad,
                        jax.random.fold_in(jax.random.PRNGKey(1), s.step))
            return s2, m["total"]
        return jax.lax.scan(body, state, None, length=20)

    timeit("D fixed SYNTHETIC batch, total-only", loop_fixed_syn, state0)


if __name__ == "__main__":
    main()
