"""Round-3 session O: unrolled mask-out + packed-key turbo kNN selection.

Session N's maskout loop still pays a (tile_m, n) VMEM load + store per
selection round through the explicit scratch ref (fori_loop carries the
tile between rounds by memory).  The 'unroll' variant replaces the
fori_loop with a static Python loop so the tile is one SSA value chained
through all k rounds — Mosaic schedules the temporaries, the explicit
per-round load disappears, and the (tm, k_pad) output accumulators hit
the refs once instead of k times.

The 'packed' variant is the TURBO candidate: one sortable int32 key per
lane (f32 distance bits, low lane_bits replaced by the lane index) packed
ONCE, then each round is a single threshold-min pass — ~3 elementwise
passes per round vs maskout's ~6, no knockout writes.  An earlier
per-round-packing attempt at (64,1024,16) only gained 10% (PERFORMANCE.md
'Packed-key kNN selection'); this one pre-packs and targets the
selection-bound refiner shape (32,4096,16) where maskout spends 22.9 ms.

Run on the TPU (one process — chip grants are slow):
    cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
        python -u scripts/profile_r3o.py
"""

import numpy as np
import jax
import jax.numpy as jnp

from scripts.harness import timed

R = np.random.RandomState(0)


def main():
    print("backend:", jax.default_backend(), flush=True)

    from dispu_tpu.ops.pallas_kernels import knn_pallas

    for (b, n, k) in ((32, 4096, 16), (64, 1024, 16), (64, 512, 16),
                      (64, 256, 17)):
        pts = jnp.asarray(R.randn(b, n, 3), jnp.float32)
        d_m, i_m = jax.jit(
            lambda p: knn_pallas(k, p, p, variant="maskout"))(pts)
        d_u, i_u = jax.jit(
            lambda p: knn_pallas(k, p, p, variant="unroll"))(pts)
        same = bool(jnp.array_equal(i_m, i_u) and jnp.array_equal(d_m, d_u))
        print(f"A parity maskout==unroll ({b},{n},k{k}): "
              f"{'ok' if same else 'MISMATCH'}", flush=True)
        # packed (turbo): indices equal on generic random clouds (no
        # high-bit distance ties), distances truncated
        d_p, i_p = jax.jit(
            lambda p: knn_pallas(k, p, p, variant="packed"))(pts)
        isame = bool(jnp.array_equal(i_m, i_p))
        drel = float(jnp.max(jnp.abs(d_p - d_m)
                             / jnp.maximum(jnp.abs(d_m), 1e-12)))
        print(f"A parity packed idx==maskout ({b},{n},k{k}): "
              f"{'ok' if isame else 'MISMATCH'}  dist rel {drel:.2e}",
              flush=True)
        timed(f"A knn maskout ({b},{n},k{k})",
              lambda p, k=k: knn_pallas(k, p, p, variant="maskout")[1],
              (pts,), iters=10)
        timed(f"A knn unroll  ({b},{n},k{k})",
              lambda p, k=k: knn_pallas(k, p, p, variant="unroll")[1],
              (pts,), iters=10)
        timed(f"A knn packed  ({b},{n},k{k})",
              lambda p, k=k: knn_pallas(k, p, p, variant="packed")[1],
              (pts,), iters=10)

    # chamfer argmin shape (k=1: unroll == maskout minus the loop/refs)
    a = jnp.asarray(R.randn(28, 4096, 3), jnp.float32)
    for variant in ("maskout", "unroll"):
        timed(f"B knn {variant} chamfer (28,4096x4096,k1)",
              lambda p, v=variant: knn_pallas(1, p, p, variant=v)[1],
              (a,), iters=10)

    # feature-space backbone shape (c=24)
    feat = jnp.asarray(R.randn(64, 1024, 24), jnp.float32)
    for variant in ("maskout", "unroll", "packed"):
        timed(f"C knn {variant} feature (64,1024,c24,k17)",
              lambda f, v=variant: knn_pallas(17, f, f, variant=v)[1],
              (feat,), iters=10)

    # walk at small n (current auto pick below 512) vs unroll/packed
    small = jnp.asarray(R.randn(64, 256, 3), jnp.float32)
    for variant in ("walk", "unroll", "packed"):
        timed(f"D knn {variant} small (64,256,k17)",
              lambda p, v=variant: knn_pallas(17, p, p, variant=v)[1],
              (small,), iters=10)

    # in-context: pass1/pass2 + train step with auto (set by the current
    # code — rerun after flipping the auto pick to compare)
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
    timed("E gen pass1 b=64 256->1024  (N: 31.25)",
          lambda x: model.apply(variables, x, train=False)[1],
          (patches1,), iters=8)
    timed("E gen pass2 b=32 1024->4096 (N: 104.33)",
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
    print(f"E CD train step b=28 in-scan (N: 36.23): {ms:.2f} ms/step",
          flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
