"""Round-3 session T: part-split dense EdgeConv (dense_impl='split').

PERFORMANCE.md's speed-of-light table shows the pass-2 conv stack is
HBM-streaming-bound: each DenseEdgeBlock layer reads a concatenated
(b, n, k, up-to-3g+c) activation and the edge tensor alone is
(b·n·k, 2c).  ``dense_impl='split'`` distributes every conv over its
concat parts (``concat(a,b) @ W = a @ Wa + b @ Wb``) and the max-over-k
over the output concat: the tiled center feature stays (b, n, 1, c)
(k× cheaper matmul + read) and only the narrow (b, n, k, g=24) per-layer
conv outputs ever materialize.  Same math, same param tree
(tests/test_modules.py pins init equality + f32-tolerance outputs).

Measured here:
  A. FeatureExtractorGCN forward alone, concat vs split, at the bench
     (64, 256) and pass-2 (32, 1024 / 32, 4096) shapes;
  B. generator forward headline, concat vs split × exact/turbo, at the
     bench protocol and the 16x second-pass chunk;
  C. CD train step b=28 (split also shrinks the saved-activation
     footprint in backward);
  D. on-chip output deviation split vs concat (same params) at the
     bench shape — expected ~1e-6 relative (f32 sum order) unless a
     feature-space kNN near-tie flips.

Decision: if B shows >=10% on either protocol with D's deviation at
round-off level, flip GeneratorConfig.dense_impl default to 'split' and
re-measure bench.py + the 16x whole-cloud number.

Run on the TPU (one process — chip grants are slow):
    cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
        python -u scripts/profile_r3t.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from scripts.harness import timed

R = np.random.RandomState(0)


def main():
    print("backend:", jax.default_backend(), flush=True)

    from dispu_tpu.config import GeneratorConfig
    from dispu_tpu.models.generator import DisPUGenerator
    from dispu_tpu.nn.edgeconv import FeatureExtractorGCN

    # ---- A: backbone alone -------------------------------------------
    for (b, n) in ((64, 256), (32, 1024), (32, 4096)):
        xyz = jnp.asarray(R.randn(b, n, 3), jnp.float32)
        for impl in ("concat", "split"):
            fe = FeatureExtractorGCN(gather_impl="onehot_hp",
                                     dense_impl=impl)
            v = fe.init(jax.random.PRNGKey(0), xyz)
            timed(f"A backbone {impl} ({b},{n})",
                  lambda x, m=fe, vv=v: m.apply(vv, x), (xyz,), iters=10)

    # ---- B: generator forward headline ---------------------------------
    def headline(tag, cfg, batch=64, iters=20, npts=None):
        model = DisPUGenerator(cfg=cfg)
        n_in = npts or cfg.num_points
        x = jnp.asarray(R.randn(batch, n_in, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x, train=False)

        @jax.jit
        def fwd_many(v, x0):
            def body(carry, _):
                _, fine = model.apply(v, carry, train=False)
                return fine[:, :n_in, :], jnp.sum(fine)
            _, sums = jax.lax.scan(body, x0, None, length=iters)
            return jnp.sum(sums)

        float(fwd_many(variables, x))
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            assert np.isfinite(float(fwd_many(variables, x)))
            dt = min(dt, time.perf_counter() - t0)
        print(f"B {tag}: {batch * iters / dt:.1f} patches/sec "
              f"({dt / iters * 1000:.1f} ms/fwd)", flush=True)

    for impl in ("concat", "split"):
        headline(f"bench exact {impl}", GeneratorConfig(dense_impl=impl))
        headline(f"bench turbo {impl}", GeneratorConfig(
            fast_gather=True, fast_gather_backbone=True, fast_knn=True,
            fused_grouping=True, dense_impl=impl))
        headline(f"pass2 exact {impl}",
                 GeneratorConfig(num_points=1024, dense_impl=impl),
                 batch=32, iters=10)
        headline(f"pass2 turbo {impl}",
                 GeneratorConfig(num_points=1024, fast_gather=True,
                                 fast_gather_backbone=True, fast_knn=True,
                                 fused_grouping=True, dense_impl=impl),
                 batch=32, iters=10)

    # ---- C: CD train step ----------------------------------------------
    from dispu_tpu.config import (ExperimentConfig, GeneratorConfig as GC,
                                  TrainConfig)
    from dispu_tpu.train.state import create_generator_state
    from dispu_tpu.train.steps import make_train_step

    gt = jnp.asarray(R.randn(28, 1024, 3) * 0.3, jnp.float32)
    rad = jnp.ones((28,), jnp.float32)
    for impl in ("concat", "split"):
        cfg = ExperimentConfig(
            generator=GC(dense_impl=impl),
            train=TrainConfig(batch_size=28))
        step = make_train_step(cfg, mesh=None, donate=False)
        tstate = create_generator_state(
            jax.random.PRNGKey(0), cfg.generator, cfg.train)

        @jax.jit
        def loop(s0):
            def body(s, _):
                s2, mtr = step(s, gt, rad,
                               jax.random.fold_in(jax.random.PRNGKey(1),
                                                  s.step))
                return s2, mtr["total"]
            s, tot = jax.lax.scan(body, s0, None, length=20)
            return s, tot

        s2, tot = loop(tstate)
        float(jnp.sum(tot))
        t0 = time.perf_counter()
        s2, tot = loop(tstate)
        float(jnp.sum(tot))
        ms = (time.perf_counter() - t0) / 20 * 1000
        print(f"C CD step b=28 dense_impl={impl} (r3 ref 36.23): "
              f"{ms:.2f} ms/step", flush=True)

    # ---- D: on-chip output deviation (same params) ----------------------
    x = jnp.asarray(R.randn(64, 256, 3), jnp.float32)
    g_ref = DisPUGenerator(cfg=GeneratorConfig())
    g_spl = DisPUGenerator(cfg=GeneratorConfig(dense_impl="split"))
    v = g_ref.init(jax.random.PRNGKey(0), x, train=False)
    c0, f0 = jax.jit(lambda vv, xx: g_ref.apply(vv, xx))(v, x)
    c1, f1 = jax.jit(lambda vv, xx: g_spl.apply(vv, xx))(v, x)
    for tag, a, bb in (("coarse", c0, c1), ("fine", f0, f1)):
        dev = float(jnp.max(jnp.abs(a - bb)))
        scale = float(jnp.max(jnp.abs(a)))
        print(f"D {tag} max|Δ|={dev:.3e} (scale {scale:.3f})", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
