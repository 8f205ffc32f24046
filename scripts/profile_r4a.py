"""Round-4 session A: the fori_loop fused kNN+gather at the 16x wall.

VERDICT r3 item 2: the fused kNN+gather kernel's win region stopped at
n <= 2048 because the statically unrolled selection keeps ~10 knockout-
chain (tm, n) f32 tiles live — 17.4 MiB stacks at (32,4096,c128), over
the 16 MiB VMEM envelope, and the tile_m=64 squeeze that did fit lost to
the composed path (67.0 vs 47.8 ms, scripts/profile_r3r.py).  Round 4
adds ``select='loop'`` — a fused fori_loop selection+gather body whose
only (tm, n) live state is the double-buffered carry.  (A first variant
that rebuilt gather one-hots in a post-loop unrolled pass compiled to a
28.34 MiB stack — the k independent rebuilds scheduled concurrently —
and was replaced by the fused body.)  This session measures, on chip:

  A. kernel-level at the 16x second-pass shape (32,4096,k16,c128):
     loop-fused exact/turbo at tile_m auto/96/128 vs the composed paths
     (knn_pallas + onehot_hp / onehot), plus (64,1024) to confirm the
     unrolled form still wins there (auto keeps it).
  B. on-chip value parity at both shapes: the round-4 xyz fix (three
     narrow per-term matmuls accumulated in f32 in-kernel, replacing the
     lane-packed 9-column table whose t2/t3 terms did not survive real
     hardware) should bring gxyz to f32 round-off like the features —
     prints max/mean rel deviations; these calibrate
     bench.parity_guard's tightened bounds.
  C. in-context: the 16x second-pass chunk (b=32, 1024->4096 forward)
     and whole-cloud 16x exact, fused_grouping on vs off — the VERDICT
     targets are chunk <= ~85 ms (from 104.3) and 16x whole-cloud exact
     <= ~420 ms (from 506), same-session A/B.

Run on the TPU (one process — chip grants are slow):
    cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
        python -u scripts/profile_r4a.py
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

    # ---- A: kernel level at the pass-2 shape --------------------------
    for (b, n, k, c) in ((32, 4096, 16, 128), (64, 1024, 16, 128)):
        pts = jnp.asarray(R.randn(b, n, 3), jnp.float32)
        fe = jnp.asarray(R.randn(b, n, c), jnp.float32)

        for sel in ("loop",) if n > 2048 else ("loop", "unroll"):
            for tag, kw in (("exact", {}), ("turbo", {"exact": False})):
                try:
                    timed(f"A fused {sel} {tag} ({b},{n},k{k},c{c})",
                          lambda p, f, k=k, s=sel, kw=kw: knn_group_pallas(
                              k, p, p, f, select=s, **kw)[2:],
                          (pts, fe), iters=10)
                except Exception as e:  # VMEM envelope probe
                    print(f"A fused {sel} {tag} ({b},{n}): FAILED "
                          f"{type(e).__name__}", flush=True)
        if n > 2048:
            for tm in (96, 128):
                try:
                    timed(f"A fused loop exact tile{tm} ({b},{n})",
                          lambda p, f, k=k, t=tm: knn_group_pallas(
                              k, p, p, f, tile_m=t, select="loop")[2:],
                          (pts, fe), iters=10)
                except Exception as e:  # VMEM envelope probe
                    print(f"A fused loop exact tile{tm} ({b},{n}): FAILED "
                          f"{type(e).__name__}", flush=True)
        for impl in ("onehot_hp", "onehot"):
            timed(f"A composed {impl} ({b},{n},k{k},c{c})",
                  lambda p, f, k=k, im=impl: grouping(
                      f, k, p, p, gather_impl=im)[:2],
                  (pts, fe), iters=10)

        # ---- B: on-chip value parity (calibrates bench.parity_guard) --
        d0, i0 = jax.jit(lambda p: knn_pallas(k, p, p))(pts)
        gx0 = jax.vmap(lambda t, ii: t[ii])(pts, i0)
        gf0 = jax.vmap(lambda t, ii: t[ii])(fe, i0)
        for sel in ("loop", "unroll") if n <= 2048 else ("loop",):
            try:
                d1, i1, gx1, gf1 = jax.jit(
                    lambda p, f, s=sel: knn_group_pallas(
                        k, p, p, f, select=s))(pts, fe)
            except Exception as e:
                print(f"B parity {sel} ({b},{n}): FAILED "
                      f"{type(e).__name__}", flush=True)
                continue
            sel_ok = bool(jnp.array_equal(i0, i1)
                          and jnp.array_equal(d0, d1))
            dev_x = float(jnp.max(jnp.abs(gx0 - gx1))
                          / jnp.max(jnp.abs(gx0)))
            mean_x = float(jnp.mean(jnp.abs(gx0 - gx1))
                           / jnp.max(jnp.abs(gx0)))
            dev_f = float(jnp.max(jnp.abs(gf0 - gf1))
                          / jnp.max(jnp.abs(gf0)))
            print(f"B parity {sel} ({b},{n}): idx/dist "
                  f"{'ok' if sel_ok else 'MISMATCH'}  "
                  f"xyz dev {dev_x:.2e} (mean {mean_x:.2e})  "
                  f"feat dev {dev_f:.2e}", flush=True)

    # ---- C: in context ------------------------------------------------
    from dispu_tpu.config import GeneratorConfig, InferenceConfig
    from dispu_tpu.inference import PatchUpsampler
    from dispu_tpu.models.generator import DisPUGenerator

    def headline(tag, cfg, batch, iters=10):
        model = DisPUGenerator(cfg=cfg)
        x = jnp.asarray(R.randn(batch, cfg.num_points, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x, train=False)

        @jax.jit
        def fwd_many(v, x0):
            def body(carry, _):
                _, fine = model.apply(v, carry, train=False)
                return fine[:, : cfg.num_points, :], jnp.sum(fine)
            _, sums = jax.lax.scan(body, x0, None, length=iters)
            return jnp.sum(sums)

        float(fwd_many(variables, x))
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            assert np.isfinite(float(fwd_many(variables, x)))
            dt = min(dt, time.perf_counter() - t0)
        print(f"C {tag}: {dt / iters * 1000:.1f} ms/fwd "
              f"({batch * iters / dt:.1f} patches/sec)", flush=True)

    # 16x second-pass chunk (b=32, 1024 -> 4096)
    headline("pass2 exact base ", GeneratorConfig(num_points=1024),
             batch=32)
    headline("pass2 exact fused",
             GeneratorConfig(num_points=1024, fused_grouping=True),
             batch=32)
    headline("pass2 turbo base ",
             GeneratorConfig(num_points=1024, fast_gather=True,
                             fast_gather_backbone=True, fast_knn=True,
                             dense_impl="split"), batch=32)
    headline("pass2 turbo fused",
             GeneratorConfig(num_points=1024, fast_gather=True,
                             fast_gather_backbone=True, fast_knn=True,
                             fused_grouping=True, dense_impl="split"),
             batch=32)

    # whole-cloud 16x exact (the VERDICT target: <= ~420 ms from 506)
    cloud = np.asarray(R.randn(10000, 3), np.float32)
    for fused in (False, True):
        gcfg = GeneratorConfig(fused_grouping=fused)
        ups = PatchUpsampler(
            DisPUGenerator(cfg=gcfg).init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 256, 3), jnp.float32), train=False),
            gcfg, InferenceConfig(final_ratio=16),
        )
        out = ups.upsample(cloud)  # warmup/compile
        assert np.isfinite(np.asarray(out)).all()
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = ups.upsample(cloud)
            assert np.isfinite(float(np.sum(np.asarray(out))))
            times.append(time.perf_counter() - t0)
        print(f"C 16x whole-cloud exact fused={fused}: "
              f"min {min(times)*1e3:.0f} ms  "
              f"median {sorted(times)[2]*1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
