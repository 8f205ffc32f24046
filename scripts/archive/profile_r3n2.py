"""Round-3 session N2: pin the kNN-variant crossover + in-context numbers.

Session N measured the two selection formulations head to head (walk vs
maskout, scripts/profile_r3n.py): maskout wins 28.0 -> 22.9 ms at the
pass-2 shape (32, 4096, k16) and at n=1024; walk wins at n=256 (3.68 vs
4.36).  knn_pallas(variant='auto') now picks maskout iff n_pad >= 1024.
This session pins the crossover (n=512), checks the k=1 chamfer shape,
and re-measures the in-context generator/train-step numbers with the new
default.

Run on the TPU (one process — chip grants are slow):
    cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
        python -u scripts/profile_r3n2.py
"""

import numpy as np
import jax
import jax.numpy as jnp

from scripts.harness import timed

R = np.random.RandomState(0)


def main():
    print("backend:", jax.default_backend(), flush=True)

    from dispu_tpu.ops.pallas_kernels import knn_pallas

    # A: crossover shapes (auto currently: maskout iff n_pad >= 1024)
    for (b, n, k) in ((64, 512, 16), (128, 512, 16), (64, 768, 16)):
        pts = jnp.asarray(R.randn(b, n, 3), jnp.float32)
        for variant in ("walk", "maskout"):
            timed(f"A knn {variant:7s} ({b},{n},k{k})",
                  lambda p, v=variant: knn_pallas(k, p, p, variant=v)[1],
                  (pts,), iters=10)

    # B: k=1 (the chamfer argmin path routes here at model scale)
    for (b, n, m) in ((28, 4096, 4096), (28, 1024, 4096)):
        pts = jnp.asarray(R.randn(b, n, 3), jnp.float32)
        qs = jnp.asarray(R.randn(b, m, 3), jnp.float32)
        for variant in ("walk", "maskout"):
            timed(f"B k1  {variant:7s} ({b},n{n},m{m})",
                  lambda p, q, v=variant: knn_pallas(
                      1, p, q, variant=v)[1],
                  (pts, qs), iters=10)

    # C: feature-space backbone shape (c=24, n=1024 -> auto=maskout)
    feat = jnp.asarray(R.randn(64, 1024, 24), jnp.float32)
    for variant in ("walk", "maskout"):
        timed(f"C knn {variant:7s} feature (64,1024,c24,k17)",
              lambda f, v=variant: knn_pallas(17, f, f, variant=v)[1],
              (feat,), iters=10)

    # D: maskout tile_m sweep at the pass-2 shape (512 clamps to 384)
    pts = jnp.asarray(R.randn(32, 4096, 3), jnp.float32)
    for tm in (128, 384, 512):
        timed(f"D maskout tile_m={tm} (32,4096,k16)",
              lambda p, tm=tm: knn_pallas(
                  16, p, p, tile_m=tm, variant="maskout")[1],
              (pts,), iters=10)

    # E: in-context with the new auto default
    from dispu_tpu.config import (ExperimentConfig, GeneratorConfig,
                                  TrainConfig)
    from dispu_tpu.models.generator import DisPUGenerator
    from dispu_tpu.train.state import create_generator_state
    from dispu_tpu.train.steps import make_train_step
    from dispu_tpu.utils.checkpoint import restore_checkpoint

    gen_cfg = GeneratorConfig()
    tmpl = create_generator_state(
        jax.random.PRNGKey(0), gen_cfg, TrainConfig())
    state = restore_checkpoint("demo/log/model-280.msgpack", tmpl)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    model = DisPUGenerator(cfg=gen_cfg)
    patches1 = jnp.asarray(R.randn(64, 256, 3) * 0.3, jnp.float32)
    patches2 = jnp.asarray(R.randn(32, 1024, 3) * 0.3, jnp.float32)
    timed("E gen pass1 b=64 256->1024  (L: 32.15)",
          lambda x: model.apply(variables, x, train=False)[1],
          (patches1,), iters=8)
    timed("E gen pass2 b=32 1024->4096 (L: 111.71)",
          lambda x: model.apply(variables, x, train=False)[1],
          (patches2,), iters=4)

    import time

    cfg = ExperimentConfig(train=TrainConfig(batch_size=28))
    step = make_train_step(cfg, mesh=None, donate=False)
    tstate = create_generator_state(
        jax.random.PRNGKey(0), cfg.generator, cfg.train)
    gt = jnp.asarray(
        R.randn(28, cfg.generator.num_out_points, 3), jnp.float32)
    rad = jnp.ones((28,), jnp.float32)

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
    print(f"E CD train step b=28 in-scan (L: 36.69): {ms:.2f} ms/step",
          flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
