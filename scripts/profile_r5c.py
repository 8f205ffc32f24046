"""Round-5 closing perf session (post-retrain): cheap decision legs.

1. Fused kNN+gather at the BENCH shape.  profile_r5b showed grouping is
   now the refiner's cost center (11.6 of 20.8 ms at b=64, n=1024).  The
   round-3/4 fused kernel lost at the (32, 4096) pass-2 shape and was
   left opt-in — but at (64, 1024, k16), inside its exact unroll
   envelope, it was never A/B'd end-to-end.  Measure forward b=64 with
   gather_impl onehot_hp (default) vs fused_grouping (exact unroll form)
   vs fused refiner+critic off/on, and the isolated grouping stage.
2. Batched merge width sweep: fps_pallas_chunked_batch at width 128 vs
   256/512 for b=2/3 (wider chunks shorten the serial per-round chain
   that batching amortizes).

Run:  cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
        python -u scripts/profile_r5c.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.harness import timed  # noqa: E402

R = np.random.RandomState(0)


def fused_grouping_at_bench_shape():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from dispu_tpu.config import GeneratorConfig, TrainConfig
    from dispu_tpu.models.generator import DisPUGenerator
    from dispu_tpu.ops.grouping import grouping
    from dispu_tpu.train.state import create_generator_state

    print("== fused kNN+gather at the bench shape (b=64, n=1024) ==",
          flush=True)
    b, n, c, k = 64, 1024, 128, 16
    xyz = jnp.asarray(R.randn(b, n, 3), jnp.float32)
    feat = jnp.asarray(R.randn(b, n, c), jnp.float32)

    def composed(x, f):
        return grouping(f, k, x, x, use_xyz=True, gather_impl="onehot_hp")

    def fused(x, f):
        return grouping(f, k, x, x, use_xyz=True, gather_impl="fused")

    timed("grouping composed (onehot_hp)", composed, (xyz, feat))
    timed("grouping fused (exact unroll)", fused, (xyz, feat))

    # value check: fused gathers hold f32 round-off for their own idx
    gx_c, gf_c, _ = jax.jit(composed)(xyz, feat)
    gx_f, gf_f, _ = jax.jit(fused)(xyz, feat)
    for name, a, bb in (("xyz", gx_c, gx_f), ("feat", gf_c, gf_f)):
        dev = float(jnp.max(jnp.abs(a - bb))) / float(jnp.max(jnp.abs(a)))
        print(f"  {name} rel dev: {dev:.2e}", flush=True)

    state = create_generator_state(
        jax.random.PRNGKey(0), GeneratorConfig(), TrainConfig()
    )
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    x = jnp.asarray(R.randn(64, 256, 3), jnp.float32)
    for name, cfg in (
        ("exact default", GeneratorConfig()),
        ("refiner fused_grouping", dataclasses.replace(
            GeneratorConfig(), fused_grouping=True)),
    ):
        model = DisPUGenerator(cfg=cfg)
        t = timed(f"forward {name}", lambda xx: model.apply(
            variables, xx, train=False), (x,), iters=10)
        print(f"  -> {64/(t/1e3):.0f} patches/s", flush=True)
    # value drift of the full forward under the fused refiner grouping
    m0 = DisPUGenerator(cfg=GeneratorConfig())
    m1 = DisPUGenerator(
        cfg=dataclasses.replace(GeneratorConfig(), fused_grouping=True))
    _, f0 = jax.jit(lambda xx: m0.apply(variables, xx, train=False))(x)
    _, f1 = jax.jit(lambda xx: m1.apply(variables, xx, train=False))(x)
    dev = float(jnp.max(jnp.abs(f0 - f1)))
    print(f"  forward fine max|Δ| fused vs default: {dev:.2e} "
          f"(scale {float(jnp.max(jnp.abs(f0))):.2f})", flush=True)


def fused_grouping_train_step():
    """The flip would affect training too (knn_group_pallas_diff carries
    a custom_vjp): A/B the b=28 CD train step."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from dispu_tpu.config import ExperimentConfig, GeneratorConfig
    from dispu_tpu.train.state import create_generator_state
    from dispu_tpu.train.steps import make_train_step

    print("== CD train step b=28: fused_grouping off/on ==", flush=True)
    gt = jnp.asarray(R.randn(28, 1024, 3), jnp.float32)
    radius = jnp.ones((28,), jnp.float32)
    for name, gen_cfg in (
        ("default", GeneratorConfig()),
        ("fused_grouping", dataclasses.replace(
            GeneratorConfig(), fused_grouping=True)),
    ):
        cfg = ExperimentConfig(generator=gen_cfg)
        step = make_train_step(cfg, jit_compile=False)
        state = create_generator_state(
            jax.random.PRNGKey(0), gen_cfg, cfg.train
        )

        def one(s, g, r):
            s2, m = step(s, g, r, jax.random.PRNGKey(1))
            return m["total"], s2.params

        timed(f"train step {name}", one, (state, gt, radius), iters=10)


def mega_refiner_legs():
    """The round-5 mega-fused refiner block (kNN+gathers+MLP+skip in one
    kernel, no grouped tensor): isolated kernel at the bench shape, and
    the full forward with refine_local_impl='megafused' under the exact
    and turbo configs."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from dispu_tpu.config import GeneratorConfig, TrainConfig
    from dispu_tpu.models.generator import DisPUGenerator
    from dispu_tpu.nn.refine import PointShuffle2
    from dispu_tpu.ops.pallas_kernels import refine_block_pallas
    from dispu_tpu.train.state import create_generator_state

    print("== mega-fused refiner block ==", flush=True)
    b, n, c, k = 64, 1024, 128, 16
    xyz = jnp.asarray(R.randn(b, n, 3), jnp.float32)
    feat = jnp.asarray(R.randn(b, n, c), jnp.float32)
    mod = PointShuffle2(nsample=k, mlp=(128, 128, 256),
                        gather_impl="onehot")
    variables = mod.init(jax.random.PRNGKey(0), xyz, feat, train=False)
    mod_mega = PointShuffle2(nsample=k, mlp=(128, 128, 256),
                             gather_impl="onehot", local_impl="megafused")
    try:
        timed("mega refiner module (grouping+local+skip fused)",
              lambda x, f: mod_mega.apply(variables, x, f, train=False),
              (xyz, feat))
    except Exception as e:
        print(f"  mega refiner FAILED: {repr(e)[:400]}", flush=True)
        return
    timed("composed refiner module (onehot gather)",
          lambda x, f: mod.apply(variables, x, f, train=False),
          (xyz, feat))
    _, want = jax.jit(
        lambda x, f: mod.apply(variables, x, f, train=False))(xyz, feat)
    _, got = jax.jit(
        lambda x, f: mod_mega.apply(variables, x, f, train=False))(xyz, feat)
    dev = float(jnp.max(jnp.abs(got - want)))
    print(f"  mega vs composed-onehot max|Δ|: {dev:.2e} "
          f"(scale {float(jnp.max(jnp.abs(want))):.2f})", flush=True)

    state = create_generator_state(
        jax.random.PRNGKey(0), GeneratorConfig(), TrainConfig()
    )
    gvars = {"params": state.params, "batch_stats": state.batch_stats}
    x = jnp.asarray(R.randn(64, 256, 3), jnp.float32)
    for name, cfg in (
        ("exact + megafused", dataclasses.replace(
            GeneratorConfig(), refine_local_impl="megafused")),
        ("turbo + megafused", GeneratorConfig(
            fast_gather=True, fast_gather_backbone=True, fast_knn=True,
            fused_grouping=True, dense_impl="split",
            refine_local_impl="megafused")),
        ("turbo (round-4 flags)", GeneratorConfig(
            fast_gather=True, fast_gather_backbone=True, fast_knn=True,
            fused_grouping=True, dense_impl="split")),
    ):
        model = DisPUGenerator(cfg=cfg)
        t = timed(f"forward {name}", lambda xx: model.apply(
            gvars, xx, train=False), (x,), iters=10)
        print(f"  -> {64/(t/1e3):.0f} patches/s", flush=True)


def batched_merge_width_sweep():
    import jax.numpy as jnp

    from dispu_tpu.ops.pallas_kernels import fps_pallas_chunked_batch

    print("== batched merge width sweep (80k from 237.5k) ==", flush=True)
    n, m = 237_568, 80_000
    pts = jnp.asarray(R.randn(3, n, 3), jnp.float32)
    for bsz in (2, 3):
        for width in (128, 256, 512):
            try:
                t = timed(
                    f"batch b={bsz} width={width}",
                    lambda x: fps_pallas_chunked_batch(m, x, width=width),
                    (pts[:bsz],), iters=3,
                )
                print(f"  -> per-cloud {t/bsz:.1f} ms", flush=True)
            except Exception as e:
                print(f"  b={bsz} width={width} FAILED: {repr(e)[:200]}",
                      flush=True)


def main():
    import jax

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    fused_grouping_at_bench_shape()
    mega_refiner_legs()
    fused_grouping_train_step()
    batched_merge_width_sweep()


if __name__ == "__main__":
    main()
