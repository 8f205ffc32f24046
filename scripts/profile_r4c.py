"""Round-4 session C: the exact 16x second pass on the onehot3 gather.

Session r4a measured the fori_loop fused kNN+gather at the 16x wall and
found a negative result: the loop form fits the VMEM envelope but LOSES
to the composed path at (32,4096,c128) — 82.65 ms fused-turbo vs 45.50
composed-onehot; exact OOMs inside scan contexts — so the `grouping`
dispatch gate went back to n <= 2048.  The same session's parity guard
root-caused the "bf16 terms don't survive hardware" mystery to XLA's
--xla_allow_excess_precision convert fold (see _bf16_terms), which
makes the 3-pass bf16-split one-hot gather provably BIT-EXACT — so the
n > 2048 exact gather can now ride the MXU ('onehot3', half of
HIGHEST's 6 passes) instead of the memory-bound native gather (39.3 ms
at the second-pass shape).  This session measures, on chip:

  A. isolated gather A/B at (32,4096,k16,c131): native / onehot_hp /
     onehot3 / onehot (turbo floor).
  B. onehot3 bit-parity at that shape (the bench.parity_guard leg).
  C. in-context 16x second-pass chunk (b=32, 1024->4096 forward):
     exact with the onehot3 reroute (new default) vs exact with the
     native-gather reroute (the round-3 behavior, via
     grouping._EXACT_BIG_GATHER), plus the turbo base for reference.
     VERDICT r3 item 2 target: chunk <= ~85 ms (from 104.3; measured
     94.1 this round's session A on the native reroute).
  D. whole-cloud 16x exact end-to-end (target <= ~420 ms from 506).

Run on the TPU (one process — chip grants are slow):
    cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
        python -u scripts/profile_r4c.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from scripts.harness import timed

R = np.random.RandomState(0)


def main():
    print("backend:", jax.default_backend(), flush=True)

    from dispu_tpu.ops import grouping as grouping_mod
    from dispu_tpu.ops.grouping import group_point

    # ---- A: isolated gather A/B at the second-pass shape ---------------
    b, n, k, c = 32, 4096, 16, 131
    fe = jnp.asarray(R.randn(b, n, c), jnp.float32)
    idx = jnp.asarray(R.randint(0, n, (b, n, k)), jnp.int32)
    for impl in ("gather", "onehot_hp", "onehot3", "onehot"):
        timed(f"A group_point {impl} ({b},{n},k{k},c{c})",
              lambda f, i, im=impl: group_point(f, i, impl=im),
              (fe, idx), iters=10)

    # ---- B: onehot3 bit parity on chip ---------------------------------
    g_ref = jax.jit(lambda f, i: group_point(f, i))(fe, idx)
    g_3 = jax.jit(lambda f, i: group_point(f, i, impl="onehot3"))(fe, idx)
    print("B onehot3 parity:",
          "bit-equal" if bool(jnp.array_equal(g_ref, g_3)) else
          f"DEV {float(jnp.max(jnp.abs(g_ref - g_3))):.3e}", flush=True)
    del fe, idx, g_ref, g_3

    # ---- C: in-context pass-2 chunk ------------------------------------
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

    try:
        headline("pass2 exact onehot3", GeneratorConfig(num_points=1024),
                 batch=32)
        grouping_mod._EXACT_BIG_GATHER = "gather"
        jax.clear_caches()  # the reroute is baked at trace time
        headline("pass2 exact native ", GeneratorConfig(num_points=1024),
                 batch=32)
    finally:
        grouping_mod._EXACT_BIG_GATHER = "onehot3"
    jax.clear_caches()
    headline("pass2 turbo        ",
             GeneratorConfig(num_points=1024, fast_gather=True,
                             fast_gather_backbone=True, fast_knn=True,
                             dense_impl="split"), batch=32)

    # ---- D: whole-cloud 16x exact (VERDICT target <= ~420 ms) ----------
    cloud = np.asarray(R.randn(10000, 3), np.float32)
    gcfg = GeneratorConfig()
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
    print(f"D 16x whole-cloud exact (onehot3): min {min(times)*1e3:.0f} ms  "
          f"median {sorted(times)[2]*1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
