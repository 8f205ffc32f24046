"""Round-3 session J: Pallas VMEM gather at the 16x second-pass scale.

Run on the TPU (one process — chip grants are slow):
    cd /root/repo && python -u scripts/profile_r3j.py

ROUND3.md lever 2: the 16x second pass (132.6 ms/chunk) splits into the
refiner kNN (36 ms, selection-round bound) and the wide feature gather
(39 ms, memory-system bound on the native gather after the n>2048
onehot_hp reroute).  The r2 microbench compared the 3-pass Pallas gather
at a c=131 proxy shape, where c_pad=256 rounding doubles its MXU work;
the REAL model gathers c=128 exactly (xyz and features gather
separately), where c_pad=128 wastes nothing.  This session measures, at
the real (32, q=65536, n=4096, c=128) shape:
  * on-chip bit-parity of gather_rows_pallas (exact) vs the native
    gather, and of the new single-pass bf16 variant vs the XLA onehot;
  * micro: native / onehot bf16 / onehot_hp HIGHEST / pallas exact /
    pallas bf16;
  * in-context: generator pass 2 (b=32, 1024->4096) and pass 1 (b=64,
    256->1024) with cfg.gather_impl in {onehot_hp (current default
    dispatch), pallas};
  * 16x whole-cloud e2e with the winning impl.
"""

import numpy as np
import jax
import jax.numpy as jnp

from scripts.harness import timed

R = np.random.RandomState(0)


def main():
    print("backend:", jax.default_backend(), flush=True)

    from dispu_tpu.ops.grouping import group_point
    from dispu_tpu.ops.pallas_kernels import gather_rows_pallas

    b, n, c, m, k = 32, 4096, 128, 4096, 16
    tbl = jnp.asarray(R.randn(b, n, c), jnp.float32)
    idx3 = jnp.asarray(R.randint(0, n, (b, m, k)), jnp.int32)
    idx2 = idx3.reshape(b, m * k)

    # --- on-chip parity ------------------------------------------------
    g_nat = jax.jit(lambda f, i: group_point(f, i))(tbl, idx3)
    g_pal = jax.jit(
        lambda f, i: gather_rows_pallas(f, i).reshape(b, m, k, c)
    )(tbl, idx2)
    print("parity pallas_exact vs native:",
          "ok" if bool(jnp.array_equal(g_nat, g_pal)) else "MISMATCH",
          flush=True)
    g_oh = jax.jit(lambda f, i: group_point(f, i, impl="onehot"))(tbl, idx3)
    g_p1 = jax.jit(
        lambda f, i: gather_rows_pallas(f, i, 512, False, False)
        .reshape(b, m, k, c)
    )(tbl, idx2)
    print("parity pallas_bf16 vs XLA onehot:",
          "ok" if bool(jnp.array_equal(g_oh, g_p1)) else "MISMATCH",
          flush=True)

    # --- micro ---------------------------------------------------------
    timed("gather native (32,65536) n=4096 c=128",
          lambda f, i: group_point(f, i), (tbl, idx3), iters=10)
    timed("gather onehot bf16 XLA",
          lambda f, i: group_point(f, i, impl="onehot"), (tbl, idx3),
          iters=10)
    timed("gather onehot_hp HIGHEST XLA (pre-reroute form)",
          lambda f, i: jnp.einsum(
              "bqn,bnc->bqc",
              jax.nn.one_hot(i.reshape(b, m * k), n, dtype=f.dtype), f,
              precision=jax.lax.Precision.HIGHEST),
          (tbl, idx3), iters=4)
    timed("gather pallas exact (3-pass)",
          lambda f, i: gather_rows_pallas(f, i), (tbl, idx2), iters=10)
    timed("gather pallas bf16 (1-pass)",
          lambda f, i: gather_rows_pallas(f, i, 512, False, False),
          (tbl, idx2), iters=10)
    # tile_q=1024 at this shape exceeds the 16 MB scoped-VMEM limit by
    # 100 KB (measured: "Ran out of memory in memory space vmem"), so the
    # sweep stops at 512 (the default) / 256.
    for tq in (256,):
        timed(f"gather pallas exact tile_q={tq}",
              lambda f, i, tq=tq: gather_rows_pallas(f, i, tq),
              (tbl, idx2), iters=10)

    # --- in-context ----------------------------------------------------
    from dispu_tpu.config import GeneratorConfig, InferenceConfig, TrainConfig
    from dispu_tpu.inference import PatchUpsampler
    from dispu_tpu.train.state import create_generator_state
    from dispu_tpu.utils.checkpoint import restore_checkpoint

    patches1 = jnp.asarray(R.randn(64, 256, 3) * 0.3, jnp.float32)
    patches2 = jnp.asarray(R.randn(32, 1024, 3) * 0.3, jnp.float32)
    pc = jnp.asarray(R.randn(5000, 3) * 0.5, jnp.float32)

    for impl in ("onehot_hp", "pallas"):
        gen_cfg = GeneratorConfig(gather_impl=impl)
        tmpl = create_generator_state(
            jax.random.PRNGKey(0), gen_cfg, TrainConfig())
        state = restore_checkpoint("demo/log/model-280.msgpack", tmpl)
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        from dispu_tpu.models.generator import DisPUGenerator
        model = DisPUGenerator(cfg=gen_cfg)
        timed(f"gen pass1 b=64 256->1024   gather_impl={impl}",
              lambda x, model=model, v=variables:
              model.apply(v, x, train=False)[1], (patches1,), iters=8)
        timed(f"gen pass2 b=32 1024->4096  gather_impl={impl}",
              lambda x, model=model, v=variables:
              model.apply(v, x, train=False)[1], (patches2,), iters=4)

        up = PatchUpsampler(
            variables, gen_cfg=gen_cfg,
            inf_cfg=InferenceConfig(final_ratio=16, merge_fps="bucketed"),
        )
        import time as _t
        # e2e via the public API (compiles once, then timed host-to-host)
        pts = np.asarray(pc)
        out = up.upsample(pts)  # warm/compile
        t0 = _t.perf_counter()
        out = up.upsample(pts)
        dt = _t.perf_counter() - t0
        print(f"16x e2e whole-cloud (5000->80000) gather_impl={impl}: "
              f"{dt * 1000:.1f} ms  ({np.asarray(out).shape})", flush=True)


if __name__ == "__main__":
    main()
