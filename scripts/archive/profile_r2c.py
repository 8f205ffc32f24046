"""Round-2 session C: weight-pool einsum formulations + train-step costs.

Run: cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
        python -u scripts/profile_r2c.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from scripts.harness import timed

R = np.random.RandomState(0)


def main():
    print("backend:", jax.default_backend(), flush=True)

    b, n, k, c, t, o = 64, 1024, 16, 128, 16, 256
    y = jnp.asarray(R.randn(b, n, k, c), jnp.float32)
    w = jnp.asarray(R.randn(b, n, k, t), jnp.float32)
    A = jnp.asarray(R.randn(c * t, o) * 0.02, jnp.float32)

    def pool_current(y, w, A):
        z = jnp.einsum("bnkc,bnkt->bnct", y, w)   # (b,n,c,t)
        return z.reshape(b, n, -1) @ A            # c-major flatten

    def pool_tmajor(y, w, A):
        # zero-relayout form: rhs y is already (K=k, N=c) in layout, lhs w
        # only needs its small (k,t) plane transposed; the c-major dense
        # kernel is row-permuted instead (exact same math, reassociated)
        z = jnp.einsum("bnkt,bnkc->bntc", w, y)   # (b,n,t,c)
        A_perm = A.reshape(c, t, o).transpose(1, 0, 2).reshape(c * t, o)
        return z.reshape(b, n, -1) @ A_perm       # t-major flatten

    r0 = jax.jit(pool_current)(y, w, A)
    r1 = jax.jit(pool_tmajor)(y, w, A)
    print("tmajor max|dev|:", float(jnp.max(jnp.abs(r0 - r1))), flush=True)
    timed("weight-pool current (bnct, c-major)", pool_current, (y, w, A))
    timed("weight-pool tmajor (bntc, permuted A)", pool_tmajor, (y, w, A))

    # grads (training path)
    for name, fn in (("current", pool_current), ("tmajor", pool_tmajor)):
        timed(f"weight-pool+grad [{name}]",
              lambda y_, w_, A_, f=fn: jax.grad(
                  lambda yy, ww: jnp.sum(jnp.sin(f(yy, ww, A_)))
              , argnums=(0, 1))(y_, w_),
              (y, w, A), iters=10)

    # ---------------- chamfer / losses at train shapes ----------------
    from dispu_tpu.ops.chamfer import nn_distance
    from dispu_tpu import losses as L

    p = jnp.asarray(R.randn(28, 1024, 3), jnp.float32)
    q = jnp.asarray(R.randn(28, 1024, 3), jnp.float32)
    timed("nn_distance fwd (28,1024)x(28,1024)",
          lambda a, b_: nn_distance(a, b_), (p, q))
    timed("nn_distance grad",
          lambda a, b_: jax.grad(
              lambda x, z: jnp.sum(nn_distance(x, z)[0]) +
                           jnp.sum(nn_distance(x, z)[2]),
              argnums=(0, 1))(a, b_),
          (p, q), iters=15)

    rad = jnp.ones((28,), jnp.float32)
    timed("repulsion loss (28,1024)",
          lambda x: L.repulsion(x, nsample=20, radius=0.07), (p,))
    timed("uniform loss fast (28,1024)",
          lambda x: L.uniform(x), (p,))

    # ---------------- full train step, batch 28 ----------------
    from dispu_tpu.config import ExperimentConfig, TrainConfig
    from dispu_tpu.train.state import create_generator_state
    from dispu_tpu.train.steps import make_train_step

    cfg = ExperimentConfig(train=TrainConfig(batch_size=28))
    step = make_train_step(cfg, mesh=None, donate=False)
    state = create_generator_state(
        jax.random.PRNGKey(0), cfg.generator, cfg.train)
    gt = jnp.asarray(
        R.randn(28, cfg.generator.num_out_points, 3), jnp.float32)

    @jax.jit
    def loop(state):
        def body(s, _):
            s2, m = step(s, gt, rad,
                         jax.random.fold_in(jax.random.PRNGKey(1), s.step))
            return s2, m["total"]
        s, tot = jax.lax.scan(body, state, None, length=20)
        return s, tot

    s2, tot = loop(state)
    float(jnp.sum(tot))
    t0 = time.perf_counter()
    s2, tot = loop(state)
    float(jnp.sum(tot))
    ms = (time.perf_counter() - t0) / 20 * 1000
    print(f"train step b=28 (in-scan): {ms:.2f} ms/step "
          f"({28_000 / ms:.0f} patches/s)", flush=True)

    # GAN step
    from dispu_tpu.train.gan_steps import create_gan_state, make_gan_train_step

    gstep = make_gan_train_step(cfg, mesh=None, donate=False)
    gstate = create_gan_state(jax.random.PRNGKey(2), cfg)

    @jax.jit
    def gloop(gs):
        def body(s, _):
            s2, m = gstep(s, gt, rad,
                          jax.random.fold_in(jax.random.PRNGKey(3),
                                             s.gen.step))
            return s2, m["total"]
        s, tot = jax.lax.scan(body, gs, None, length=10)
        return s, tot

    try:
        g2, tot = gloop(gstate)
        float(jnp.sum(tot))
        t0 = time.perf_counter()
        g2, tot = gloop(gstate)
        float(jnp.sum(tot))
        ms = (time.perf_counter() - t0) / 10 * 1000
        print(f"gan step b=28 (in-scan): {ms:.2f} ms/step", flush=True)
    except Exception as e:
        print("gan loop failed:", repr(e)[:300], flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
