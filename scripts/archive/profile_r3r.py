"""Round-3 session R: the fused kNN+gather kernel vs the composed path.

ROUND3.md lever 2 ("fused kNN+gather kernel"): the refiner pays
~22.9 ms for the xyz kNN (selection-round / VPU bound) plus ~17-40 ms
for the combined [xyz|feature] gather (memory-system bound) at the 16x
second-pass shape.  ``knn_group_pallas`` computes both in one kernel —
each selection round's knockout mask doubles as the one-hot MXU operand
gathering that round's neighbor row — so the gather rides the MXU while
the selection rides the VPU, and Mosaic may overlap them (round j's
matmuls are independent of round j+1's selection).

Measured here:
  A. kernel-level: fused (exact/turbo) vs knn_pallas + group_point
     (exact combined / onehot turbo) at the two refiner shapes;
  B. in-context: generator forward at the bench protocol and the 16x
     second-pass chunk with fused_grouping on vs off, exact and turbo.

Run on the TPU (one process — chip grants are slow):
    cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
        python -u scripts/profile_r3r.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from scripts.harness import timed

R = np.random.RandomState(0)


def main():
    print("backend:", jax.default_backend(), flush=True)

    from dispu_tpu.ops.grouping import grouping
    from dispu_tpu.ops.pallas_kernels import knn_group_pallas, knn_pallas

    # ---- A: kernel level -------------------------------------------
    for (b, n, k, c) in ((32, 4096, 16, 128), (64, 1024, 16, 128)):
        pts = jnp.asarray(R.randn(b, n, 3), jnp.float32)
        fe = jnp.asarray(R.randn(b, n, c), jnp.float32)

        timed(f"A fused exact ({b},{n},k{k},c{c})",
              lambda p, f, k=k: knn_group_pallas(k, p, p, f)[2:],
              (pts, fe), iters=10)
        timed(f"A fused turbo ({b},{n},k{k},c{c})",
              lambda p, f, k=k: knn_group_pallas(k, p, p, f,
                                                 exact=False)[2:],
              (pts, fe), iters=10)
        try:
            timed(f"A fused exact tile256 ({b},{n},k{k},c{c})",
                  lambda p, f, k=k: knn_group_pallas(
                      k, p, p, f, tile_m=256)[2:],
                  (pts, fe), iters=10)
        except Exception as e:  # VMEM envelope probe — OOM is informative
            print(f"A fused exact tile256 ({b},{n}): FAILED "
                  f"{type(e).__name__}", flush=True)
        for impl in ("gather", "onehot_hp", "onehot"):
            timed(f"A composed {impl} ({b},{n},k{k},c{c})",
                  lambda p, f, k=k, im=impl: grouping(
                      f, k, p, p, gather_impl=im)[:2],
                  (pts, fe), iters=10)

        # parity on chip (the interpret tests cannot prove Mosaic behavior)
        d0, i0 = jax.jit(lambda p: knn_pallas(k, p, p))(pts)
        d1, i1, gx1, gf1 = jax.jit(
            lambda p, f: knn_group_pallas(k, p, p, f))(pts, fe)
        gx0 = jax.vmap(lambda t, ii: t[ii])(pts, i0)
        gf0 = jax.vmap(lambda t, ii: t[ii])(fe, i0)
        ok = (bool(jnp.array_equal(i0, i1)) and bool(jnp.array_equal(d0, d1))
              and bool(jnp.array_equal(gx0, gx1))
              and bool(jnp.array_equal(gf0, gf1)))
        print(f"A on-chip parity ({b},{n}): {'ok' if ok else 'MISMATCH'}",
              flush=True)

    # ---- A2: backbone edge-conv shape (drop_first, feature keys) -----
    from dispu_tpu.nn.edgeconv import edge_feature
    from dispu_tpu.ops.pallas_kernels import knn_group_pallas as kgp

    for (b, n, c) in ((64, 1024, 48), (64, 1024, 24), (32, 1024, 48)):
        fe = jnp.asarray(R.randn(b, n, c), jnp.float32)
        timed(f"A2 fused edge exact ({b},{n},c{c},k16)",
              lambda f: edge_feature(f, 16, gather_impl="fused")[0],
              (fe,), iters=10)
        timed(f"A2 fused edge turbo ({b},{n},c{c},k16)",
              lambda f: edge_feature(f, 16, gather_impl="fused_turbo")[0],
              (fe,), iters=10)
        timed(f"A2 composed edge hp ({b},{n},c{c},k16)",
              lambda f: edge_feature(f, 16, gather_impl="onehot_hp")[0],
              (fe,), iters=10)
        timed(f"A2 composed edge gather ({b},{n},c{c},k16)",
              lambda f: edge_feature(f, 16, gather_impl="gather")[0],
              (fe,), iters=10)
        # on-chip parity of the drop_first mode vs the composed path
        e0, i0 = jax.jit(
            lambda f: edge_feature(f, 16, gather_impl="onehot_hp"))(fe)
        e1, i1 = jax.jit(
            lambda f: edge_feature(f, 16, gather_impl="fused"))(fe)
        ok = (bool(jnp.array_equal(i0, i1))
              and bool(jnp.array_equal(e0, e1)))
        print(f"A2 on-chip parity ({b},{n},c{c}): "
              f"{'ok' if ok else 'MISMATCH'}", flush=True)

    # ---- B: in context ----------------------------------------------
    from dispu_tpu.config import GeneratorConfig
    from dispu_tpu.models.generator import DisPUGenerator

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

    # bench protocol (b=64, 256->1024)
    headline("bench exact base ", GeneratorConfig())
    headline("bench exact fused", GeneratorConfig(fused_grouping=True))
    headline("bench turbo base ", GeneratorConfig(
        fast_gather=True, fast_gather_backbone=True))
    headline("bench turbo fused", GeneratorConfig(
        fast_gather=True, fast_gather_backbone=True, fused_grouping=True))

    # 16x second-pass chunk scale (b=32, 1024->4096)
    cfg2 = GeneratorConfig(num_points=1024)
    headline("pass2 exact base ", cfg2, batch=32, iters=10)
    headline("pass2 exact fused",
             GeneratorConfig(num_points=1024, fused_grouping=True),
             batch=32, iters=10)
    headline("pass2 turbo base ",
             GeneratorConfig(num_points=1024, fast_gather=True,
                             fast_gather_backbone=True),
             batch=32, iters=10)
    headline("pass2 turbo fused",
             GeneratorConfig(num_points=1024, fast_gather=True,
                             fast_gather_backbone=True, fused_grouping=True),
             batch=32, iters=10)

    # ---- C: CD train step with fused grouping (fwd AND bwd) ----------
    # the fused custom-VJP backward scatter-adds with XLA at[].add
    # instead of the onehot_hp transpose matmul — measure both directions
    from dispu_tpu.config import (ExperimentConfig, GeneratorConfig as GC,
                                  TrainConfig)
    from dispu_tpu.train.state import create_generator_state
    from dispu_tpu.train.steps import make_train_step

    gt = jnp.asarray(R.randn(28, 1024, 3) * 0.3, jnp.float32)
    rad = jnp.ones((28,), jnp.float32)
    for fused in (False, True):
        cfg = ExperimentConfig(
            generator=GC(fused_grouping=fused),
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
        print(f"C CD step b=28 fused_grouping={fused} "
              f"(r3 ref 36.23): {ms:.2f} ms/step", flush=True)

    # ---- D: GAN step with fused critic neighborhoods ------------------
    from dispu_tpu.config import DiscriminatorConfig
    from dispu_tpu.train.gan_steps import (create_gan_state,
                                           make_gan_train_step)

    for fused in (False, True):
        cfg = ExperimentConfig(
            generator=GC(fused_grouping=fused),
            discriminator=DiscriminatorConfig(fused_grouping=fused),
            train=TrainConfig(batch_size=28))
        gstep = make_gan_train_step(cfg, mesh=None, donate=False)
        gstate = create_gan_state(jax.random.PRNGKey(0), cfg)

        @jax.jit
        def gloop(s0):
            def body(s, _):
                s2, mtr = gstep(s, gt, rad,
                                jax.random.fold_in(jax.random.PRNGKey(1),
                                                   s.gen.step))
                return s2, mtr["total"]
            s, tot = jax.lax.scan(body, s0, None, length=20)
            return s, tot

        s2, tot = gloop(gstate)
        float(jnp.sum(tot))
        t0 = time.perf_counter()
        s2, tot = gloop(gstate)
        float(jnp.sum(tot))
        ms = (time.perf_counter() - t0) / 20 * 1000
        print(f"D GAN step b=28 fused={fused} (r3 ref 47.45): "
              f"{ms:.2f} ms/step", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
