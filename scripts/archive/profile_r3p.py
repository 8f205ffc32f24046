"""Round-3 session P: in-context turbo kNN + shared-geometry GAN step.

Follows session O's kernel-level unroll/packed comparison with the two
in-context measurements that decide what ships:

* the generator's second pass in the turbo configuration with and
  without ``fast_knn`` (packed-key selection in the refiner xyz kNN and
  the backbone feature kNN) — session O measures the kernel alone;
* the GAN train step after the critic-geometry hoist (FPS seeds +
  3-scale kNN + gathers computed once per step, shared by the D and G
  passes — see train/gan_steps.py; round-3 baseline 47.45 ms/step).

Run on the TPU (one process — chip grants are slow):
    cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
        python -u scripts/profile_r3p.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from scripts.harness import timed

R = np.random.RandomState(0)


def main():
    print("backend:", jax.default_backend(), flush=True)

    import dataclasses

    from dispu_tpu.config import (ExperimentConfig, GeneratorConfig,
                                  TrainConfig)
    from dispu_tpu.models.generator import DisPUGenerator
    from dispu_tpu.train.state import create_generator_state
    from dispu_tpu.utils.checkpoint import restore_checkpoint

    gen_cfg = GeneratorConfig()
    tmpl = create_generator_state(
        jax.random.PRNGKey(0), gen_cfg, TrainConfig())
    state = restore_checkpoint("demo/log/model-280.msgpack", tmpl)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    patches1 = jnp.asarray(R.randn(64, 256, 3) * 0.3, jnp.float32)
    patches2 = jnp.asarray(R.randn(32, 1024, 3) * 0.3, jnp.float32)

    # A: exact vs fast_knn on the exact-path config (isolates the kNN)
    for fast_knn in (False, True):
        cfg = dataclasses.replace(gen_cfg, fast_knn=fast_knn)
        model = DisPUGenerator(cfg=cfg)
        timed(f"A gen pass2 exact-path fast_knn={fast_knn} (O ref: 104.3)",
              lambda x, m=model: m.apply(variables, x, train=False)[1],
              (patches2,), iters=4)

    # B: the full turbo configuration (bench headline path) +- fast_knn
    for fast_knn in (False, True):
        cfg = dataclasses.replace(
            gen_cfg, fast_gather=True, fast_gather_backbone=True,
            fast_knn=fast_knn)
        model = DisPUGenerator(cfg=cfg)
        timed(f"B gen pass1 turbo fast_knn={fast_knn}",
              lambda x, m=model: m.apply(variables, x, train=False)[1],
              (patches1,), iters=8)
        timed(f"B gen pass2 turbo fast_knn={fast_knn}",
              lambda x, m=model: m.apply(variables, x, train=False)[1],
              (patches2,), iters=4)

    # C: GAN step with the shared critic geometry (round-3 ref: 47.45)
    from dispu_tpu.train.gan_steps import create_gan_state, make_gan_train_step

    cfg = ExperimentConfig(train=TrainConfig(batch_size=28))
    gstate = create_gan_state(jax.random.PRNGKey(0), cfg)
    gstep = make_gan_train_step(cfg, mesh=None, donate=False)
    gt = jnp.asarray(
        R.randn(28, cfg.generator.num_out_points, 3), jnp.float32)
    rad = jnp.ones((28,), jnp.float32)

    @jax.jit
    def gloop(s0):
        def body(s, _):
            s2, m = gstep(s, gt, rad,
                          jax.random.fold_in(jax.random.PRNGKey(1), s.gen.step))
            return s2, m["total"]
        s, tot = jax.lax.scan(body, s0, None, length=20)
        return s, tot

    s2, tot = gloop(gstate)
    float(jnp.sum(tot))
    t0 = time.perf_counter()
    s2, tot = gloop(gstate)
    float(jnp.sum(tot))
    ms = (time.perf_counter() - t0) / 20 * 1000
    print(f"C GAN step b=28 in-scan shared-geometry (r3 ref 47.45): "
          f"{ms:.2f} ms/step", flush=True)

    # E: bf16 NN compute at the pass-2 scale.  The round-2 rejection
    # ("bfloat16" in PERFORMANCE.md) measured the model dtype at
    # pass1/bench scale (64, 256→1024), where the casts around the f32
    # selection/geometry ops outweighed the matmul savings.  Pass 2's
    # conv stack streams ~4× the activation rows (HBM-bound per the SOL
    # table), so bf16's halved activation traffic may now win.
    for fast in (False, True):
        cfg2 = dataclasses.replace(
            gen_cfg, fast_gather=fast, fast_gather_backbone=fast)
        m16 = DisPUGenerator(cfg=cfg2, dtype=jnp.bfloat16)
        timed(f"E gen pass2 bf16-compute turbo={fast}",
              lambda x, m=m16: m.apply(variables, x, train=False)[1],
              (patches2,), iters=4)
        timed(f"E gen pass1 bf16-compute turbo={fast}",
              lambda x, m=m16: m.apply(variables, x, train=False)[1],
              (patches1,), iters=8)
        if not fast:
            # output deviation of bf16 compute on the trained weights
            mf = DisPUGenerator(cfg=cfg2)
            a = jax.jit(lambda x: mf.apply(variables, x, train=False)[1])(
                patches2)
            b = jax.jit(lambda x: m16.apply(variables, x, train=False)[1])(
                patches2)
            dev = float(jnp.max(jnp.abs(a - b)))
            scale = float(jnp.max(jnp.abs(a)))
            print(f"E bf16 pass2 output max|dev| {dev:.2e} "
                  f"(scale {scale:.2f})", flush=True)

    # D: CD step unchanged-path sanity (r3 ref 36.23)
    from dispu_tpu.train.steps import make_train_step

    step = make_train_step(cfg, mesh=None, donate=False)
    tstate = create_generator_state(
        jax.random.PRNGKey(0), cfg.generator, cfg.train)

    @jax.jit
    def loop(s0):
        def body(s, _):
            s2, m = step(s, gt, rad,
                         jax.random.fold_in(jax.random.PRNGKey(1), s.step))
            return s2, m["total"]
        s, tot = jax.lax.scan(body, s0, None, length=20)
        return s, tot

    s2, tot = loop(tstate)
    float(jnp.sum(tot))
    t0 = time.perf_counter()
    s2, tot = loop(tstate)
    float(jnp.sum(tot))
    ms = (time.perf_counter() - t0) / 20 * 1000
    print(f"D CD step b=28 in-scan (r3 ref 36.23): {ms:.2f} ms/step",
          flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
