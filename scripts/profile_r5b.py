"""Round-5 perf session: refiner local-branch decomposition + batched merge.

VERDICT r4 item 5: the refiner is 33.6 of ~60 ms at b=64 with kNN and
gathers solved — profile where the remainder sits (local MLPs,
weight-net pooling, after_conv, skip, NL, aggregation) to aim the next
fusion.  VERDICT r4 item 6: the 16x exact pipeline's merge FPS (~45%,
latency-bound) cannot overlap patch compute on a single core — instead
the batch-fused chunked kernel advances B clouds per round; A/B it at
the real merge scale and through the streaming ``upsample_many`` API.

Run:  cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
        python -u scripts/profile_r5b.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.harness import timed  # noqa: E402

R = np.random.RandomState(0)


def refiner_decomposition():
    import jax
    import jax.numpy as jnp

    from dispu_tpu.nn.refine import PointShuffle2
    from dispu_tpu.ops.grouping import grouping

    b, n, c, k = 64, 1024, 128, 16
    xyz = jnp.asarray(R.randn(b, n, 3), jnp.float32)
    feat = jnp.asarray(R.randn(b, n, c), jnp.float32)

    mod = PointShuffle2(nsample=k, mlp=(128, 128, 256),
                        gather_impl="onehot_hp")
    variables = mod.init(jax.random.PRNGKey(0), xyz, feat, train=False)
    p = variables["params"]
    bs = variables.get("batch_stats", {})

    print("== refiner (b=64, n=1024, c=128, k=16) ==", flush=True)
    timed("refiner full", lambda x, f: mod.apply(
        {"params": p, "batch_stats": bs}, x, f, train=False,
    ), (xyz, feat))

    # -- stage inputs (computed once, reused as literals) -----------------
    def group(x, f):
        gx, gf, _ = grouping(f, k, x, x, use_xyz=True,
                             gather_impl="onehot_hp")
        centered = gx - x[:, :, None, :]
        return centered, jnp.concatenate([centered, gf], axis=-1)

    timed("grouping (kNN+gathers+concat)", group, (xyz, feat))
    centered, g = jax.jit(group)(xyz, feat)

    dense = lambda name: (p[name]["dense"]["kernel"], p[name]["dense"]["bias"])  # noqa: E731
    w0, b0 = dense("conv0")
    w1, b1 = dense("conv1")
    wsk, bsk = dense("skip")
    waf, baf = dense("after_conv")
    wn = p["weight_net"]["wconv0"]
    wn_bn = bs["weight_net"]["wconv0"]["bn"]

    relu = jax.nn.relu

    def conv0(gg):
        return relu(gg @ w0 + b0)

    h0 = jax.jit(conv0)(g)

    def conv1(h):
        return relu(h @ w1 + b1)

    h1 = jax.jit(conv1)(h0)

    def wnet(cen):
        y = cen @ wn["dense"]["kernel"] + wn["dense"]["bias"]
        sc = wn["bn"]["scale"] / jnp.sqrt(wn_bn["var"] + 1e-3)
        return relu(y * sc + (wn["bn"]["bias"] - wn_bn["mean"] * sc))

    w = jax.jit(wnet)(centered)

    def pool(wv, hv):
        return jnp.einsum("bnkt,bnkc->bntc", wv, hv).reshape(b, n, -1)

    pooled = jax.jit(pool)(w, h1)

    # after_conv consumes the t-major flatten through the permuted-row
    # kernel (see nn.layers._PermutedRowDense)
    kperm = (waf.reshape(128, k, 256).swapaxes(0, 1).reshape(k * 128, 256))

    def after(fl):
        return relu(fl @ kperm + baf)

    def skip(gg):
        return relu(jnp.max(gg, axis=2) @ wsk + bsk)

    timed("  conv0 (134->128, 1M rows)", conv0, (g,))
    timed("  conv1 (128->128)", conv1, (h0,))
    timed("  weight_net (3->16 +bn)", wnet, (centered,))
    timed("  pooling einsum bnkt,bnkc", pool, (w, h1))
    timed("  after_conv (2048->256)", after, (pooled,))
    timed("  skip (max+134->256)", skip, (g,))

    def local_branch(gg, cen):
        h = relu(relu(gg @ w0 + b0) @ w1 + b1)
        wv = wnet(cen)
        fl = jnp.einsum("bnkt,bnkc->bntc", wv, h).reshape(b, n, -1)
        return relu(fl @ kperm + baf) + skip(gg)

    timed("  local branch composed (conv0..after+skip)",
          local_branch, (g, centered))

    # context: HBM roofline of the branch (read g once, write out once)
    bytes_min = (g.size + b * n * 256) * 4
    print(f"  (roofline: {bytes_min/2**30:.2f} GiB minimal traffic "
          f"= {bytes_min/820e9*1e3:.2f} ms at 820 GB/s)", flush=True)

    # -- the fused local-branch kernel, isolated and in the module -------
    from dispu_tpu.ops.pallas_kernels import refine_local_pallas

    waf3 = waf.reshape(128, k, 256).swapaxes(0, 1)
    wn_sc = wn["bn"]["scale"] / jnp.sqrt(wn_bn["var"] + 1e-3)
    ww_f = wn["dense"]["kernel"] * wn_sc[None, :]
    bw_f = (wn["dense"]["bias"] - wn_bn["mean"]) * wn_sc + wn["bn"]["bias"]
    timed("  fused local+skip kernel", lambda gg: refine_local_pallas(
        gg, w0, b0, w1, b1, ww_f, bw_f, wsk, bsk, waf3, baf,
    ), (g,))
    # parity on chip
    want = jax.jit(local_branch)(g, centered)
    got = refine_local_pallas(
        g, w0, b0, w1, b1, ww_f, bw_f, wsk, bsk, waf3, baf
    )
    scale = float(jnp.abs(want).max())
    dev = float(jnp.abs(got - want).max())
    print(f"  fused kernel max|Δ| vs composed: {dev:.2e} "
          f"(scale {scale:.2f})", flush=True)

    mod_fused = PointShuffle2(nsample=k, mlp=(128, 128, 256),
                              gather_impl="onehot_hp", local_impl="fused")
    timed("refiner full (fused local branch)", lambda x, f: mod_fused.apply(
        {"params": p, "batch_stats": bs}, x, f, train=False,
    ), (xyz, feat))


def e2e_forward_ab():
    """Full generator forward b=64 (the bench headline's unit), exact
    config: composed vs fused local branch."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from dispu_tpu.config import GeneratorConfig, TrainConfig
    from dispu_tpu.models.generator import DisPUGenerator
    from dispu_tpu.train.state import create_generator_state

    print("== generator forward b=64 (exact config) ==", flush=True)
    state = create_generator_state(
        jax.random.PRNGKey(0), GeneratorConfig(), TrainConfig()
    )
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    x = jnp.asarray(R.randn(64, 256, 3), jnp.float32)
    for name, cfg in (
        ("composed (xla)", GeneratorConfig()),
        ("fused local", dataclasses.replace(
            GeneratorConfig(), refine_local_impl="fused")),
    ):
        model = DisPUGenerator(cfg=cfg)
        t = timed(f"forward {name}", lambda xx: model.apply(
            variables, xx, train=False), (x,), iters=10)
        print(f"  -> {64/(t/1e3):.0f} patches/s", flush=True)


def batched_merge_ab():
    import jax.numpy as jnp

    from dispu_tpu.ops.pallas_kernels import (
        fps_pallas_chunked,
        fps_pallas_chunked_batch,
    )

    print("== batched merge FPS (16x on 5k clouds: 80k from 237.5k) ==",
          flush=True)
    n, m = 237_568, 80_000
    pts = jnp.asarray(R.randn(3, n, 3), jnp.float32)

    t1 = timed("chunked FPS b=1", lambda x: fps_pallas_chunked(m, x),
               (pts[:1],), iters=3)
    for bsz in (2, 3):
        tb = timed(f"chunked FPS batch-fused b={bsz}",
                   lambda x: fps_pallas_chunked_batch(m, x),
                   (pts[:bsz],), iters=3)
        print(f"  -> per-cloud {tb/bsz:.1f} ms vs {t1:.1f} ms solo "
              f"({t1*bsz/tb:.2f}x)", flush=True)

    # parity on chip: batch-fused selections equal the XLA loop's
    from dispu_tpu.ops.sampling import _fps_xla

    small = jnp.asarray(R.randn(2, 4096, 3), jnp.float32)
    want = np.asarray(_fps_xla(512, small))
    got = np.asarray(fps_pallas_chunked_batch(512, small))
    print("  on-chip parity (2,4096)->512 vs XLA loop:",
          "BIT-EQUAL" if np.array_equal(want, got) else "MISMATCH",
          flush=True)


def streaming_e2e_ab():
    import jax

    from dispu_tpu.config import GeneratorConfig, InferenceConfig
    from dispu_tpu.inference import PatchUpsampler
    from dispu_tpu.train.state import create_generator_state
    from dispu_tpu.config import TrainConfig

    print("== 16x exact e2e: upsample() loop vs upsample_many ==",
          flush=True)
    state = create_generator_state(
        jax.random.PRNGKey(0), GeneratorConfig(), TrainConfig()
    )
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    up = PatchUpsampler(
        variables, gen_cfg=GeneratorConfig(),
        inf_cfg=InferenceConfig(final_ratio=16, merge_fps="exact"),
    )
    pcs = R.randn(3, 5000, 3).astype(np.float32)

    def run_solo(reps=2):
        t0 = None
        for r in range(reps + 1):
            if r == 1:
                t0 = time.perf_counter()
            for v in range(len(pcs)):
                out = up.upsample(pcs[v] + r * 1e-7)
        dt = (time.perf_counter() - t0) / reps / len(pcs)
        print(f"  solo loop: {dt*1e3:.0f} ms/cloud (checksum "
              f"{float(np.sum(out)):.3f})", flush=True)
        return dt

    def run_many(reps=2):
        t0 = None
        for r in range(reps + 1):
            if r == 1:
                t0 = time.perf_counter()
            out = up.upsample_many(pcs + r * 1e-7)
        dt = (time.perf_counter() - t0) / reps / len(pcs)
        print(f"  upsample_many B=3: {dt*1e3:.0f} ms/cloud (checksum "
              f"{float(np.sum(out)):.3f})", flush=True)
        return dt

    ts = run_solo()
    tm = run_many()
    print(f"  -> streaming speedup {ts/tm:.2f}x per cloud", flush=True)


def main():
    import jax

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    refiner_decomposition()
    e2e_forward_ab()
    batched_merge_ab()
    streaming_e2e_ab()


if __name__ == "__main__":
    main()
