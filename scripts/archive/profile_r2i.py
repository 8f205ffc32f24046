"""Round-2 session I: remat at large batch.

Run: cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
        python -u scripts/profile_r2i.py
"""

import dataclasses
import time

import numpy as np
import jax
import jax.numpy as jnp

R = np.random.RandomState(0)


def step_time(bs, remat, iters=20):
    from dispu_tpu.config import ExperimentConfig, TrainConfig
    from dispu_tpu.train.state import create_generator_state
    from dispu_tpu.train.steps import make_train_step

    cfg = ExperimentConfig(train=TrainConfig(batch_size=bs, remat=remat))
    step = make_train_step(cfg, mesh=None, donate=False)
    state = create_generator_state(
        jax.random.PRNGKey(0), cfg.generator, cfg.train)
    gt = jnp.asarray(
        R.randn(bs, cfg.generator.num_out_points, 3), jnp.float32)
    rad = jnp.ones((bs,), jnp.float32)

    @jax.jit
    def loop(state):
        def body(s, _):
            s2, m = step(s, gt, rad,
                         jax.random.fold_in(jax.random.PRNGKey(1), s.step))
            return s2, m["total"]
        return jax.lax.scan(body, state, None, length=iters)

    s2, tot = loop(state)
    float(jnp.sum(tot))
    t0 = time.perf_counter()
    s2, tot = loop(state)
    float(jnp.sum(tot))
    ms = (time.perf_counter() - t0) / iters * 1000
    print(f"train b={bs} remat={remat}: {ms:.2f} ms/step "
          f"({bs * 1000 / ms:.0f} p/s)", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    for bs, remat in ((28, False), (28, True), (64, False), (64, True),
                      (128, True), (128, False)):
        try:
            step_time(bs, remat, iters=10 if bs >= 128 else 20)
        except Exception as e:
            print(f"b={bs} remat={remat} FAILED: {repr(e)[:200]}",
                  flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
