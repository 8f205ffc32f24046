"""Round-4 session D: in-context pass-2 + whole-cloud 16x only.

Sections C/D of scripts/profile_r4c.py, split out: the r4c combined run
hit a chip HBM RESOURCE_EXHAUSTED at the first in-context model.init —
the isolated-gather section's multi-GB outputs release lazily through
the remote-dispatch tunnel, so in-context headlines must run first (or
alone).  r4c's surviving sections already measured, on chip: isolated
gather at (32,4096,k16,c131) native 33.74 / onehot_hp 47.50 / onehot3
47.59 / onehot 15.58 ms — the 3-pass split TIES HIGHEST's 6-pass form
(the one-hot operand traffic dominates, not the MXU passes) and loses
to the memory-bound native gather, so _EXACT_BIG_GATHER's default is
decided by THIS session's in-context A/B; onehot3 parity: bit-equal.

Run on the TPU (one process — chip grants are slow):
    cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
        python -u scripts/profile_r4d.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

R = np.random.RandomState(0)


def main():
    print("backend:", jax.default_backend(), flush=True)

    from dispu_tpu.ops import grouping as grouping_mod
    from dispu_tpu.config import GeneratorConfig, InferenceConfig
    from dispu_tpu.inference import PatchUpsampler
    from dispu_tpu.models.generator import DisPUGenerator

    def headline(tag, cfg, batch, iters=10):
        model = DisPUGenerator(cfg=cfg)
        x = jnp.asarray(R.randn(batch, cfg.num_points, 3), jnp.float32)
        # init must be jitted: eager init dispatches the onehot3 einsum
        # standalone, materializing the (b, m*k, n) one-hot as a 16 GiB
        # HBM *argument* (the 20:35 session OOM); under jit XLA fuses the
        # one-hot generation into the contraction.
        variables = jax.jit(
            lambda k: model.init(k, x, train=False)
        )(jax.random.PRNGKey(0))

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
        # 26e8c8 flipped the module default to 'gather'; set the A leg
        # explicitly so a re-run still measures the recorded A/B.
        grouping_mod._EXACT_BIG_GATHER = "onehot3"
        jax.clear_caches()
        headline("pass2 exact onehot3", GeneratorConfig(num_points=1024),
                 batch=32)
        grouping_mod._EXACT_BIG_GATHER = "gather"
        jax.clear_caches()  # the reroute is baked at trace time
        headline("pass2 exact native ", GeneratorConfig(num_points=1024),
                 batch=32)
    finally:
        grouping_mod._EXACT_BIG_GATHER = "gather"
    jax.clear_caches()

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
