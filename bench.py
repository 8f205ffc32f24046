"""Benchmark: 4× upsampling patches/sec on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The measured quantity matches BASELINE.json's headline metric — 4×
(256 → 1024) generator inference throughput in patches/sec on a single
chip.  The reference pipeline runs ONE patch per sess.run with a host
nanoflann kNN round-trip inside the graph (ref:DisPU/model.py:306-313,
ref:Common/ops.py:165); no published number exists (BASELINE.md), so
``vs_baseline`` is computed against a documented estimate of that
pipeline on a V100: ~50 patches/sec (≥ 20 ms/patch for batch-1 TF 1.x
session dispatch + 12 EdgeConv layers + CPU kNN sync).  Recorded in
BASELINE.md's protocol as the number to replace with a measured value
when the TF environment is available.
"""

import json
import time

import numpy as np

BASELINE_PATCHES_PER_SEC = 50.0  # estimated reference V100 batch-1 pipeline


def parity_guard():
    """On-chip correctness assertions recorded with every bench session:
    the Pallas kernels and the one-hot MXU gather must be bit-identical to
    their XLA-reference paths on the real hardware (interpret-mode tests
    in CI cannot prove on-chip behavior).  Prints a 'parity ...' line;
    raises on any mismatch (failing the bench run loudly)."""
    import jax
    import jax.numpy as jnp

    from dispu_tpu.ops.grouping import group_point, query_ball_point
    from dispu_tpu.ops.knn import knn
    from dispu_tpu.ops.pallas_kernels import (
        fps_bucketed_pallas,
        fps_pallas,
        fps_pallas_chunked,
        fps_pallas_chunked_batch,
        knn_group_pallas,
        knn_pallas,
        query_ball_pallas,
    )
    from dispu_tpu.ops.sampling import _fps_xla, morton_codes, morton_rank

    rng = np.random.RandomState(7)
    pts = jnp.asarray(rng.randn(4, 1024, 3), jnp.float32)

    # kNN: fused Pallas kernel vs XLA matmul+top_k (bit-equal indices)
    d_x, i_x = jax.jit(lambda p: knn(16, p, p, impl="xla"))(pts)
    d_p, i_p = jax.jit(lambda p: knn_pallas(16, p, p))(pts)
    knn_ok = bool(
        jnp.array_equal(i_x, i_p) and jnp.array_equal(d_x, d_p)
    )

    # packed turbo selection: contract guard.  Exact index equality does
    # NOT hold even on random clouds (seed 7 has 22 truncation-tie swaps
    # at lb=10 — measured, not hypothetical), so assert the documented
    # contract instead: (a) returned distances are BIT-EXACTLY the exact
    # path's with the low lane bits dropped, and (b) index deviations
    # occur only at truncation-tie positions (adjacent truncated
    # distances equal; the k=17 run exposes the boundary tie).
    d_t, i_t = jax.jit(lambda p: knn_pallas(16, p, p, variant="packed"))(pts)
    d_x17, i_x17 = jax.jit(lambda p: knn(17, p, p, impl="xla"))(pts)
    lb = (1024 - 1).bit_length()  # the kernel's lane bits at n_pad=1024

    def trunc(x):
        b = jax.lax.bitcast_convert_type(x, jnp.int32)
        return jax.lax.bitcast_convert_type(
            jnp.bitwise_and(b, jnp.int32(~((1 << lb) - 1))), jnp.float32)

    tx = trunc(d_x17)
    mism = i_t != i_x17[..., :16]
    tie = tx[..., :16] == tx[..., 1:]
    tie = tie.at[..., 1:].set(tie[..., 1:] | (tx[..., 1:16] == tx[..., :15]))
    packed_ok = bool(
        jnp.array_equal(d_t, tx[..., :16]) and jnp.all(~mism | tie)
    )

    # FPS: VMEM-resident Pallas kernel vs XLA loop (bit-equal indices)
    f_x = jax.jit(lambda p: _fps_xla(256, p))(pts)
    f_p = jax.jit(lambda p: fps_pallas(256, p))(pts)
    fps_ok = bool(jnp.array_equal(f_x, f_p))

    # chunked-sweep FPS (the above-wide-envelope merge kernel) vs the
    # same XLA loop (bit-equal indices)
    f_c = jax.jit(lambda p: fps_pallas_chunked(256, p))(pts)
    cfps_ok = bool(jnp.array_equal(f_x, f_c))

    # batch-fused chunked FPS (the streaming merge kernel, round 5):
    # every cloud's selection bit-equal to the XLA loop
    f_b = jax.jit(lambda p: fps_pallas_chunked_batch(256, p))(pts[:3])
    batch_fps_ok = bool(jnp.array_equal(f_x[:3], f_b))

    # bucketed FPS: every bucket row's selection bit-equal to the XLA
    # loop on that bucket (the merge turbo mode's kernel)
    bks = jnp.asarray(rng.randn(16, 256, 3), jnp.float32)
    bf_x = jax.jit(lambda p: _fps_xla(32, p))(bks)
    bf_p = jax.jit(lambda p: fps_bucketed_pallas(32, p))(bks)
    bfps_ok = bool(jnp.array_equal(bf_x, bf_p))

    # one-hot MXU gather at HIGHEST precision vs native gather (bit-equal
    # values) at the refiner's neighborhood scale
    feats = jnp.asarray(rng.randn(4, 1024, 131), jnp.float32)
    idx = jnp.asarray(rng.randint(0, 1024, (4, 1024, 16)), jnp.int32)
    g_ref = jax.jit(lambda f, i: group_point(f, i))(feats, idx)
    g_hp = jax.jit(lambda f, i: group_point(f, i, impl="onehot_hp"))(
        feats, idx
    )
    hp_ok = bool(jnp.array_equal(g_ref, g_hp))

    # 3-pass bf16-split gather (the n>2048 exact reroute) vs native
    # gather, bit-equal, AT the second-pass scale it dispatches for
    feats4k = jnp.asarray(rng.randn(2, 4096, 131), jnp.float32)
    idx4k = jnp.asarray(rng.randint(0, 4096, (2, 4096, 16)), jnp.int32)
    g3_ref = jax.jit(lambda f, i: group_point(f, i))(feats4k, idx4k)
    g3 = jax.jit(lambda f, i: group_point(f, i, impl="onehot3"))(
        feats4k, idx4k
    )
    oh3_ok = bool(jnp.array_equal(g3_ref, g3))

    # fused kNN+gather vs the composed path, at the three production
    # envelopes (PERFORMANCE.md round 4):
    #   unroll/exact (n ≤ 2048): dists/idx BIT-equal to knn_pallas;
    #     gathered values f32 round-off on real hardware (features
    #     measured 5.1e-6 rel — in-kernel MXU accumulation order; xyz
    #     rides the same in-kernel 3-term accumulation since round 4).
    #   loop/exact (2048 < n, n_pad·cf ≤ 4096·128): the VMEM-lean
    #     distance layout may deviate ~1 ulp and resolve exact
    #     near-ties differently (documented in knn_group_pallas), so
    #     assert dists ≤1e-5 rel, every idx swap a near-tie, and
    #     gathers f32-exact FOR THE RETURNED idx.
    #   loop/turbo (the 16x second-pass shape, cf 256): same, with
    #     features bf16-rounded (compare against the t1-term gather).
    # Bounds assert max AND mean deviation (ADVICE r3: a max-only
    # bound at the bf16 ceiling could not see a regression).
    fused_ok = True
    for n_shape, c_shape, exact_mode, sel_tag in (
            (1024, 131, True, "unroll/exact"),
            (4096, 96, True, "loop/exact"),
            (4096, 131, False, "loop/turbo")):
        pts_s = jnp.asarray(rng.randn(4, n_shape, 3), jnp.float32)
        feats_s = jnp.asarray(rng.randn(4, n_shape, c_shape), jnp.float32)
        df_c, if_c = jax.jit(lambda p: knn(16, p, p))(pts_s)
        df_f, if_f, gx_f, gf_f = jax.jit(
            lambda p, f: knn_group_pallas(16, p, p, f, exact=exact_mode)
        )(pts_s, feats_s)
        # gathers are checked against the fused op's OWN indices (the
        # loop form may legitimately swap ulp-tied neighbors)
        gx_c = jax.jit(lambda p, i: group_point(p, i))(pts_s, if_f)
        ftbl = feats_s if exact_mode else feats_s.astype(
            jnp.bfloat16).astype(jnp.float32)
        gf_c = jax.jit(lambda f, i: group_point(f, i))(ftbl, if_f)
        scale_x = float(jnp.max(jnp.abs(gx_c)))
        scale_f = float(jnp.max(jnp.abs(gf_c)))
        dev_x = float(jnp.max(jnp.abs(gx_c - gx_f))) / scale_x
        dev_f = float(jnp.max(jnp.abs(gf_c - gf_f))) / scale_f
        mean_x = float(jnp.mean(jnp.abs(gx_c - gx_f))) / scale_x
        scale_d = float(jnp.max(df_c))
        dev_d = float(jnp.max(jnp.abs(df_c - df_f))) / scale_d
        mism = if_c != if_f
        n_mism = int(jnp.sum(mism))
        tie_dev = (float(jnp.max(jnp.abs(jnp.where(mism, df_c - df_f,
                                                   0.0)))) / scale_d
                   if n_mism else 0.0)
        print(f"fused gather dev ({sel_tag} n={n_shape} c={c_shape}): "
              f"dist {dev_d:.2e}  idx swaps {n_mism} (tie dev "
              f"{tie_dev:.2e})  xyz {dev_x:.2e} (mean {mean_x:.2e})  "
              f"feat {dev_f:.2e} (rel to max)")
        if sel_tag == "unroll/exact":
            leg_ok = bool(jnp.array_equal(df_c, df_f)
                          and jnp.array_equal(if_c, if_f))
        else:
            leg_ok = dev_d <= 1e-5 and tie_dev <= 1e-5
        fused_ok = fused_ok and leg_ok and (
            dev_x <= 2e-5 and dev_f <= 2e-5 and mean_x <= 2e-6)

    # sort-free Morton counting rank (bucketed-merge 'radix' mode) vs the
    # stable argsort it replaces: exact inverse-permutation equality
    cloud = jnp.asarray(rng.randn(50_000, 3), jnp.float32)
    codes4 = jax.jit(lambda c: morton_codes(c, bits=4))(cloud)
    pos = jax.jit(lambda c: morton_rank(c, 4096))(codes4)
    sigma = jnp.argsort(codes4, stable=True)
    radix_ok = bool(
        jnp.array_equal(pos[sigma], jnp.arange(cloud.shape[0]))
    )

    # ball query: fused masked-min kernel vs the XLA top_k-over-keys path
    # (bit-equal indices AND counts — the repulsion/uniform losses and the
    # discriminator's SA grouping ride this op)
    i_x, c_x, s_x = jax.jit(
        lambda p: query_ball_point(0.3, 16, p, p, impl="xla",
                                   select_smallest=5))(pts)
    i_p, c_p, s_p = jax.jit(
        lambda p: query_ball_pallas(0.3, 16, p, p, select_smallest=5))(pts)
    ball_ok = bool(
        jnp.array_equal(i_x, i_p) and jnp.array_equal(c_x, c_p)
        and jnp.array_equal(s_x, s_p)  # in-kernel top-5 (repulsion path)
    )

    print(
        "parity knn_pallas=%s knn_packed_contract=%s fps_pallas=%s "
        "fps_chunked=%s fps_chunked_batch=%s fps_bucketed=%s "
        "onehot_hp_gather=%s onehot3_gather=%s ball_query=%s "
        "fused_knn_gather=%s morton_rank=%s"
        % tuple("ok" if b else "MISMATCH"
                for b in (knn_ok, packed_ok, fps_ok, cfps_ok, batch_fps_ok,
                          bfps_ok, hp_ok, oh3_ok, ball_ok, fused_ok,
                          radix_ok))
    )
    assert (knn_ok and packed_ok and fps_ok and cfps_ok and batch_fps_ok
            and bfps_ok and hp_ok and oh3_ok and ball_ok and fused_ok
            and radix_ok), \
        "on-chip kernel parity failed"


def _time_config(cfg, x, iters=20, legs=5):
    """Repeat-leg throughput for one generator config.

    The whole timing loop runs inside one jit: iterations are chained
    (each input slice depends on the previous output) so XLA cannot elide
    or overlap them, and per-dispatch host/tunnel latency — which is not
    part of on-chip throughput — is excluded.  A host fetch of a scalar
    checksum bounds every leg (block_until_ready alone does not guarantee
    completion on remote-dispatch platforms).  Returns (min, median)
    patches/sec over ``legs`` in-session repeats — the documented ~20%
    cross-session chip variance (PERFORMANCE.md) makes a single-leg
    number the noisiest possible headline, so both robust statistics are
    recorded (VERDICT r3 item 3).
    """
    import jax
    import jax.numpy as jnp

    from dispu_tpu.models.generator import DisPUGenerator

    model = DisPUGenerator(cfg=cfg)
    batch = x.shape[0]
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    @jax.jit
    def fwd_many(variables, x0):
        def body(carry, _):
            _, fine = model.apply(variables, carry, train=False)
            return fine[:, : cfg.num_points, :], jnp.sum(fine)
        final, sums = jax.lax.scan(body, x0, None, length=iters)
        return jnp.sum(sums)

    float(fwd_many(variables, x))  # warmup/compile
    pps = []
    for _ in range(legs):
        t0 = time.perf_counter()
        checksum = float(fwd_many(variables, x))  # fetch forces completion
        pps.append(batch * iters / (time.perf_counter() - t0))
        assert np.isfinite(checksum)
    return float(np.min(pps)), float(np.median(pps)), pps


def main():
    import jax
    import jax.numpy as jnp

    from dispu_tpu.config import GeneratorConfig

    parity_guard()

    batch = 64  # patches per device step; the TPU pipeline batches patches
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(batch, 256, 3), jnp.float32)

    # exact: the default configuration — bit-identical gathers, exact kNN;
    # the BASELINE.md north star is defined on this pipeline, so it is the
    # headline value.  turbo: the serving configuration (PERFORMANCE.md
    # "Round-3 turbo flags") — bf16 one-hot MXU gathers in
    # refiner+backbone (output dev ≤2e-4 / ~1e-2), packed-key kNN
    # selection (truncated-mantissa near-ties resolve by lane), the fused
    # kNN+gather kernel and the part-split dense EdgeConv.
    e_min, e_med, e_all = _time_config(GeneratorConfig(), x)
    print("exact-path legs: %s patches/sec"
          % " ".join(f"{v:.0f}" for v in e_all))
    t_min, t_med, t_all = _time_config(
        GeneratorConfig(fast_gather=True, fast_gather_backbone=True,
                        fast_knn=True, fused_grouping=True,
                        dense_impl="split"), x)
    print("turbo-path legs: %s patches/sec"
          % " ".join(f"{v:.0f}" for v in t_all))

    print(
        json.dumps(
            {
                "metric": "4x_upsample_patches_per_sec",
                "value": round(e_med, 2),  # exact-pipeline median
                "unit": "patches/sec (256->1024, 1 chip, exact median)",
                "vs_baseline": round(e_med / BASELINE_PATCHES_PER_SEC, 3),
                "exact": {"min": round(e_min, 2), "median": round(e_med, 2)},
                "turbo": {"min": round(t_min, 2), "median": round(t_med, 2)},
            }
        )
    )


if __name__ == "__main__":
    main()
