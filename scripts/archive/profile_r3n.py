"""Round-3 session N: kNN selection-loop formulations, head to head.

The pass-2 chunk's largest component is the xyz kNN at (32, 4096, k=16):
28.1 ms, selection-round bound (session K).  The 'walk' formulation
scans for the strictly-next (d, lane) entry each round without rewriting
the tile (~11 elementwise passes/round); the 'maskout' formulation does
plain min + first-lane argmin and overwrites the selected lane with a
finite sentinel (~6 passes/round) — VPU instruction count should drop
~40% if the loop is pass-bound, at the cost of one (tile_m, n) VMEM
store per round.

Run on the TPU (one process — chip grants are slow):
    cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
        python -u scripts/profile_r3n.py
"""

import numpy as np
import jax
import jax.numpy as jnp

from scripts.harness import timed

R = np.random.RandomState(0)


def main():
    print("backend:", jax.default_backend(), flush=True)

    from dispu_tpu.ops.pallas_kernels import knn_pallas

    for (b, n, k) in ((32, 4096, 16), (64, 1024, 16), (28, 1024, 16),
                      (64, 256, 17)):
        pts = jnp.asarray(R.randn(b, n, 3), jnp.float32)
        # on-chip bit-parity between the variants (the XLA oracle parity
        # is covered by tests + bench.parity_guard)
        d_w, i_w = jax.jit(
            lambda p: knn_pallas(k, p, p, variant="walk"))(pts)
        d_m, i_m = jax.jit(
            lambda p: knn_pallas(k, p, p, variant="maskout"))(pts)
        same = bool(jnp.array_equal(i_w, i_m) and jnp.array_equal(d_w, d_m))
        print(f"A parity walk==maskout ({b},{n},k{k}): "
              f"{'ok' if same else 'MISMATCH'}", flush=True)
        timed(f"A knn walk    ({b},{n},k{k})",
              lambda p: knn_pallas(k, p, p, variant="walk")[1],
              (pts,), iters=10)
        timed(f"A knn maskout ({b},{n},k{k})",
              lambda p: knn_pallas(k, p, p, variant="maskout")[1],
              (pts,), iters=10)

    # tile_m sweep for the winner at the pass-2 shape
    pts = jnp.asarray(R.randn(32, 4096, 3), jnp.float32)
    for tm in (128, 256, 512):
        timed(f"B maskout tile_m={tm} (32,4096,k16)",
              lambda p, tm=tm: knn_pallas(
                  16, p, p, tile_m=tm, variant="maskout")[1],
              (pts,), iters=10)

    # feature-space backbone shape (c=24): the backbone edge-conv kNNs
    feat = jnp.asarray(R.randn(64, 1024, 24), jnp.float32)
    for variant in ("walk", "maskout"):
        timed(f"C knn {variant} feature (64,1024,c24,k17)",
              lambda f, v=variant: knn_pallas(17, f, f, variant=v)[1],
              (feat,), iters=10)

    # in-context: pass-2 chunk + train step with the new default
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
    timed("D gen pass1 b=64 256->1024  (L: 32.15)",
          lambda x: model.apply(variables, x, train=False)[1],
          (patches1,), iters=8)
    timed("D gen pass2 b=32 1024->4096 (L: 111.71)",
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
    print(f"D CD train step b=28 in-scan (L: 36.69): {ms:.2f} ms/step",
          flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
