"""Round-3 session U: combined-winner configs at the decision protocols.

r3o/r3r/r3s/r3t measure each late-round-3 knob in isolation (kNN
selection variants, fused kNN+gather, sort-free Morton rank, part-split
dense EdgeConv); r3t's B-grid crosses them at the forward protocols but
with random-init weights and no whole-cloud leg.  This closes the
decision space the defaults flip needs:

  A. bench headline (demo checkpoint weights, r3q protocol):
     exact anchor vs exact+fused vs exact+split vs exact+fused+split,
     and the turbo base vs turbo+fused+split (fast_knn per r3o/r3p).
  B. whole-cloud 4x/16x min/median: exact-path candidates (merge exact)
     and turbo candidates (bucketed merge, rank argsort vs radix, bf16).
  C. CD train step b=28 and GAN step with dense split + fused grouping
     (the differentiable path: knn_group_pallas_diff custom VJP).

Run on the TPU (one process — chip grants are slow):
    cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
        python -u scripts/profile_r3u.py
"""

import dataclasses
import time
import traceback

import numpy as np
import jax
import jax.numpy as jnp

from dispu_tpu.config import (DiscriminatorConfig, ExperimentConfig,
                              GeneratorConfig, InferenceConfig, TrainConfig)
from dispu_tpu.inference import PatchUpsampler
from dispu_tpu.models.generator import DisPUGenerator
from dispu_tpu.train.state import create_generator_state
from dispu_tpu.utils.checkpoint import restore_checkpoint

R = np.random.RandomState(0)


def headline(tag, model, variables, batch=64, iters=20):
    """The bench.py protocol: scan-chained forwards, host-fetch bounded."""
    x = jnp.asarray(R.randn(batch, model.cfg.num_points, 3), jnp.float32)

    @jax.jit
    def fwd_many(v, x0):
        def body(carry, _):
            _, fine = model.apply(v, carry, train=False)
            return fine[:, : model.cfg.num_points, :], jnp.sum(fine)
        _, sums = jax.lax.scan(body, x0, None, length=iters)
        return jnp.sum(sums)

    float(fwd_many(variables, x))
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        assert np.isfinite(float(fwd_many(variables, x)))
        dt = min(dt, time.perf_counter() - t0)
    print(f"A {tag}: {batch * iters / dt:.1f} patches/sec", flush=True)


def leg(fn, *args, **kw):
    """Run one measurement leg; a failure (e.g. VMEM OOM) loses only
    that leg, not the session (r3r died whole on its first leg)."""
    try:
        fn(*args, **kw)
    except Exception:
        traceback.print_exc()
        print("LEG FAILED", flush=True)


def rep(tag, up, pts, n=6):
    up.upsample(pts)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = up.upsample(pts)
        ts.append((time.perf_counter() - t0) * 1000)
    ts = np.asarray(ts)
    print(f"B {tag}: min {ts.min():.1f}  median {np.median(ts):.1f} ms  "
          f"({np.asarray(out).shape})", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)

    # ---- P: on-chip parity for the paths this session may promote ----
    # (interpret-mode tests cannot prove on-chip behavior; these are the
    # guard conditions bench.parity_guard will assert once promoted)
    from dispu_tpu.ops.grouping import group_point
    from dispu_tpu.ops.knn import knn
    from dispu_tpu.ops.pallas_kernels import knn_group_pallas
    from dispu_tpu.ops.sampling import morton_codes, morton_rank

    pts = jnp.asarray(R.randn(4, 1024, 3), jnp.float32)
    feats = jnp.asarray(R.randn(4, 1024, 131), jnp.float32)
    d_c, i_c = jax.jit(lambda p: knn(16, p, p))(pts)
    gx_c = jax.jit(lambda p, i: group_point(p, i))(pts, i_c)
    gf_c = jax.jit(lambda f, i: group_point(f, i))(feats, i_c)
    d_f, i_f, gx_f, gf_f = jax.jit(
        lambda p, f: knn_group_pallas(16, p, p, f))(pts, feats)
    print("P fused exact parity: dist=%s idx=%s xyz=%s feat=%s" % tuple(
        "ok" if bool(jnp.array_equal(a, b)) else "MISMATCH"
        for a, b in ((d_c, d_f), (i_c, i_f), (gx_c, gx_f), (gf_c, gf_f))),
        flush=True)

    cloud = jnp.asarray(R.randn(100_000, 3), jnp.float32)
    codes4 = jax.jit(lambda c: morton_codes(c, bits=4))(cloud)
    pos = jax.jit(lambda c: morton_rank(c, 4096))(codes4)
    sigma = jnp.argsort(codes4, stable=True)
    print("P morton_rank == stable-argsort inverse:",
          "ok" if bool(jnp.array_equal(
              pos[sigma], jnp.arange(cloud.shape[0]))) else "MISMATCH",
          flush=True)

    # ---- K: r3r's lost kernel-level fused legs (r3r OOMed whole on the
    # (32,4096,c128) exact leg — the auto tile now fits a 12 MiB model;
    # these confirm the fix and give fused-vs-composed at both shapes)
    from scripts.harness import timed

    for (b, n, k, c) in ((32, 4096, 16, 128), (64, 1024, 16, 128)):
        kpts = jnp.asarray(R.randn(b, n, 3), jnp.float32)
        kfe = jnp.asarray(R.randn(b, n, c), jnp.float32)
        leg(timed, f"K fused exact ({b},{n},k{k},c{c})",
            lambda p, f, k=k: knn_group_pallas(k, p, p, f)[2:],
            (kpts, kfe), iters=8)
        leg(timed, f"K fused turbo ({b},{n},k{k},c{c})",
            lambda p, f, k=k: knn_group_pallas(k, p, p, f, exact=False)[2:],
            (kpts, kfe), iters=8)
        leg(timed, f"K composed knn+group ({b},{n},k{k},c{c})",
            lambda p, f, k=k: (lambda di: (
                group_point(p, di[1]), group_point(f, di[1])))(
                    knn(k, p, p)),
            (kpts, kfe), iters=8)

    gen_cfg = GeneratorConfig()
    tmpl = create_generator_state(
        jax.random.PRNGKey(0), gen_cfg, TrainConfig())
    state = restore_checkpoint("demo/log/model-280.msgpack", tmpl)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    # ---- A: bench headline, exact candidates then turbo candidates ----
    exact_grid = (
        ("exact anchor (r3: 2252)", {}),
        ("exact +fused", dict(fused_grouping=True)),
        ("exact +split", dict(dense_impl="split")),
        ("exact +fused+split",
         dict(fused_grouping=True, dense_impl="split")),
    )
    turbo_base = dict(fast_gather=True, fast_gather_backbone=True)
    turbo_grid = (
        ("turbo base (r3: 2441)", dict(turbo_base)),
        ("turbo +fused+split",
         dict(turbo_base, fused_grouping=True, dense_impl="split")),
        ("turbo +fused+split+fast_knn",
         dict(turbo_base, fused_grouping=True, dense_impl="split",
              fast_knn=True)),
    )
    for tag, kw in exact_grid + turbo_grid:
        cfg = dataclasses.replace(gen_cfg, **kw)
        leg(headline, tag, DisPUGenerator(cfg=cfg), variables)

    # ---- B: whole-cloud 4x/16x --------------------------------------
    pts = np.asarray(R.randn(5000, 3) * 0.5, np.float32)
    cloud_grid = (
        # exact path (reference-semantics merge) with the new exact knobs
        ("exact (r3: 4x 83.4 / 16x 307.6 was turbo)",
         dict(), dict(merge_fps="exact")),
        ("exact +fused+split",
         dict(fused_grouping=True, dense_impl="split"),
         dict(merge_fps="exact")),
        # turbo serving candidates
        ("turbo +fused+split bucketed/argsort",
         dict(fast_gather=True, fast_gather_backbone=True,
              fused_grouping=True, dense_impl="split"),
         dict(merge_fps="bucketed", merge_fps_rank="argsort")),
        ("turbo +fused+split bucketed/radix",
         dict(fast_gather=True, fast_gather_backbone=True,
              fused_grouping=True, dense_impl="split"),
         dict(merge_fps="bucketed", merge_fps_rank="radix")),
        ("turbo +fused+split+fast_knn bucketed/radix bf16",
         dict(fast_gather=True, fast_gather_backbone=True,
              fused_grouping=True, dense_impl="split", fast_knn=True),
         dict(merge_fps="bucketed", merge_fps_rank="radix",
              compute_dtype="bfloat16")),
    )
    for ratio in (4, 16):
        for tag, gkw, ikw in cloud_grid:
            up = PatchUpsampler(
                variables,
                gen_cfg=dataclasses.replace(gen_cfg, **gkw),
                inf_cfg=InferenceConfig(final_ratio=ratio, **ikw),
            )
            leg(rep, f"{ratio}x {tag}", up, pts)

    # ---- C: train steps with the trainable new knobs ------------------
    from dispu_tpu.train.steps import make_train_step

    gt = jnp.asarray(R.randn(28, 1024, 3) * 0.3, jnp.float32)
    rad = jnp.ones((28,), jnp.float32)
    def cd_leg(tag, gkw):
        cfg = ExperimentConfig(
            generator=dataclasses.replace(GeneratorConfig(), **gkw),
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
        print(f"C CD step b=28 {tag}: {ms:.2f} ms/step", flush=True)

    for tag, gkw in (
        ("baseline (r3: 36.23)", {}),
        ("+split", dict(dense_impl="split")),
        ("+fused", dict(fused_grouping=True)),
        ("+fused+split", dict(fused_grouping=True, dense_impl="split")),
    ):
        leg(cd_leg, tag, gkw)

    # GAN step with the winning generator knobs + fused critic grouping
    from dispu_tpu.train.gan_steps import create_gan_state, make_gan_train_step

    def gan_leg(tag, gkw, dkw):
        cfg = ExperimentConfig(
            generator=dataclasses.replace(GeneratorConfig(), **gkw),
            discriminator=dataclasses.replace(
                DiscriminatorConfig(), **dkw),
            train=TrainConfig(batch_size=28),
            use_gan=True)
        gstep = make_gan_train_step(cfg, mesh=None, donate=False)
        gan_state = create_gan_state(jax.random.PRNGKey(0), cfg)

        @jax.jit
        def gloop(s0):
            def body(s, _):
                s2, mtr = gstep(s, gt, rad,
                                jax.random.fold_in(jax.random.PRNGKey(2),
                                                   s.gen.step))
                return s2, mtr["total"]
            s, tot = jax.lax.scan(body, s0, None, length=20)
            return s, tot

        s2, tot = gloop(gan_state)
        float(jnp.sum(tot))
        t0 = time.perf_counter()
        s2, tot = gloop(gan_state)
        float(jnp.sum(tot))
        ms = (time.perf_counter() - t0) / 20 * 1000
        print(f"C GAN step b=28 {tag}: {ms:.2f} ms/step", flush=True)

    for tag, gkw, dkw in (
        ("baseline (r3: 47.45)", {}, {}),
        ("+fused+split G, fused D",
         dict(fused_grouping=True, dense_impl="split"),
         dict(fused_grouping=True)),
    ):
        leg(gan_leg, tag, gkw, dkw)

    print("done", flush=True)


if __name__ == "__main__":
    main()
