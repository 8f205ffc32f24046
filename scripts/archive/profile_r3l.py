"""Round-3 session L: combined [xyz|feat] gather + Pallas NL attention.

Run on the TPU (one process — chip grants are slow):
    cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
        python -u scripts/profile_r3l.py

Follows session K's decomposition (ROUND3.md lever 2).  Changes measured:
  * ``grouping`` now gathers [xyz | feature] in ONE native gather (the
    gather is row-count-bound: c=3 cost the same 17 ms as c=128);
  * ``PointNonLocalCell`` dispatches its attention core to
    ``attention_pallas`` (map stays in VMEM; XLA form round-trips 2.1 GB
    at the 16x second-pass shape).

Baselines from session K (same chip, same protocol): gen pass1 35.25,
gen pass2 128.11 ms, 16x e2e 347.2 ms; attn core XLA 12.62 ms; CD train
step 40.39 ms wall-of-record (PERFORMANCE.md).
"""

import numpy as np
import jax
import jax.numpy as jnp

from scripts.harness import timed

R = np.random.RandomState(0)


def main():
    print("backend:", jax.default_backend(), flush=True)

    from dispu_tpu.ops.pallas_kernels import attention_pallas

    # ---------------- A. kernel parity + micro --------------------------
    def attn_xla(q, k, v):
        s = jnp.einsum("bqc,bnc->bqn", q, k) * 0.125
        return jnp.einsum("bqn,bnc->bqc", jax.nn.softmax(s, axis=-1), v)

    for (b, n) in ((32, 4096), (64, 1024)):
        q = jnp.asarray(R.randn(b, n, 64), jnp.float32)
        k = jnp.asarray(R.randn(b, n, 64), jnp.float32)
        v = jnp.asarray(R.randn(b, n, 64), jnp.float32)
        ref = jax.jit(attn_xla)(q, k, v)
        got = jax.jit(
            lambda q, k, v: attention_pallas(q, k, v, 0.125))(q, k, v)
        dev = float(jnp.max(jnp.abs(ref - got)))
        print(f"A parity attn ({b},{n}) max|dev| vs XLA: {dev:.3e}",
              flush=True)
        timed(f"A attn core XLA     ({b},{n}^2)", attn_xla, (q, k, v),
              iters=10)
        timed(f"A attn core pallas  ({b},{n}^2)",
              lambda q, k, v: attention_pallas(q, k, v, 0.125),
              (q, k, v), iters=10)
        # tile_q > 256 at nk=4096 exceeds the 16 MB scoped-VMEM limit
        # (the kernel now clamps internally; sweep only valid tiles)
        for tq in (128, 256):
            timed(f"A attn pallas tile_q={tq} ({b},{n}^2)",
                  lambda q, k, v, tq=tq: attention_pallas(
                      q, k, v, 0.125, tq),
                  (q, k, v), iters=10)

    # ---------------- B. in-context ------------------------------------
    from dispu_tpu.config import GeneratorConfig, InferenceConfig, TrainConfig
    from dispu_tpu.inference import PatchUpsampler
    from dispu_tpu.models.generator import DisPUGenerator
    from dispu_tpu.train.state import create_generator_state
    from dispu_tpu.utils.checkpoint import restore_checkpoint

    patches1 = jnp.asarray(R.randn(64, 256, 3) * 0.3, jnp.float32)
    patches2 = jnp.asarray(R.randn(32, 1024, 3) * 0.3, jnp.float32)
    pc = jnp.asarray(R.randn(5000, 3) * 0.5, jnp.float32)

    gen_cfg = GeneratorConfig()
    tmpl = create_generator_state(
        jax.random.PRNGKey(0), gen_cfg, TrainConfig())
    state = restore_checkpoint("demo/log/model-280.msgpack", tmpl)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    model = DisPUGenerator(cfg=gen_cfg)
    timed("B gen pass1 b=64 256->1024  (K: 35.25)",
          lambda x: model.apply(variables, x, train=False)[1],
          (patches1,), iters=8)
    timed("B gen pass2 b=32 1024->4096 (K: 128.11)",
          lambda x: model.apply(variables, x, train=False)[1],
          (patches2,), iters=4)

    up = PatchUpsampler(
        variables, gen_cfg=gen_cfg,
        inf_cfg=InferenceConfig(final_ratio=16, merge_fps="bucketed"),
    )
    import time as _t
    pts = np.asarray(pc)
    out = up.upsample(pts)  # warm/compile
    t0 = _t.perf_counter()
    out = up.upsample(pts)
    dt = _t.perf_counter() - t0
    print(f"B 16x e2e whole-cloud (K: 347.2): {dt * 1000:.1f} ms "
          f"({np.asarray(out).shape})", flush=True)

    up4 = PatchUpsampler(
        variables, gen_cfg=gen_cfg,
        inf_cfg=InferenceConfig(final_ratio=4, merge_fps="bucketed"),
    )
    out = up4.upsample(pts)
    t0 = _t.perf_counter()
    out = up4.upsample(pts)
    dt = _t.perf_counter() - t0
    print(f"B 4x e2e whole-cloud (r3: 75.9): {dt * 1000:.1f} ms "
          f"({np.asarray(out).shape})", flush=True)

    # ---------------- C. train step -------------------------------------
    import time

    from dispu_tpu.config import ExperimentConfig
    from dispu_tpu.train.steps import make_train_step

    cfg = ExperimentConfig(train=TrainConfig(batch_size=28))
    step = make_train_step(cfg, mesh=None, donate=False)
    state = create_generator_state(
        jax.random.PRNGKey(0), cfg.generator, cfg.train)
    gt = jnp.asarray(
        R.randn(28, cfg.generator.num_out_points, 3), jnp.float32)
    rad = jnp.ones((28,), jnp.float32)

    @jax.jit
    def loop(state):
        def body(s, _):
            s2, m = step(s, gt, rad,
                         jax.random.fold_in(jax.random.PRNGKey(1), s.step))
            return s2, m["total"]
        s, tot = jax.lax.scan(body, state, None, length=20)
        return s, tot

    s2, tot = loop(state)
    float(jnp.sum(tot))
    t0 = time.perf_counter()
    s2, tot = loop(state)
    float(jnp.sum(tot))
    ms = (time.perf_counter() - t0) / 20 * 1000
    print(f"C CD train step b=28 in-scan (r3: 40.39): {ms:.2f} ms/step",
          flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
