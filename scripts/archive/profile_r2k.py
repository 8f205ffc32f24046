"""Round-2 session K: tiny-n kNN heuristic + uniform loss + GAN step.

Run: cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
        python -u scripts/profile_r2k.py
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
    from dispu_tpu.ops.knn import knn

    pts = jnp.asarray(R.randn(28, 1024, 3) * 0.5, jnp.float32)

    # tiny-cloud knn: xla vs pallas at the uniform-loss shape
    flat = jnp.asarray(R.randn(1428, 12, 3), jnp.float32)
    timed("knn(2) tiny disks [xla]",
          lambda f: knn(2, f, f, impl="xla"), (flat,))
    timed("knn(2) tiny disks [pallas]",
          lambda f: knn(2, f, f, impl="pallas"), (flat,))

    timed("uniform loss (28,1024) [auto=xla tiny]",
          lambda x: L.uniform(x), (pts,))

    # GAN step end-to-end
    from dispu_tpu.config import ExperimentConfig, TrainConfig
    from dispu_tpu.train.gan_steps import create_gan_state, make_gan_train_step

    cfg = ExperimentConfig(train=TrainConfig(batch_size=28))
    gt = jnp.asarray(
        R.randn(28, cfg.generator.num_out_points, 3), jnp.float32)
    rad = jnp.ones((28,), jnp.float32)
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
