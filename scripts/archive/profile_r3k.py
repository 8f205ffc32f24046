"""Round-3 session K: second-pass (16x) cost decomposition at true shape.

Run on the TPU (one process — chip grants are slow):
    cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
        python -u scripts/profile_r3k.py

ROUND3.md lever 2, continued from session J (which measured the gather
micro path: native 17.3 ms at (32, 65536, 128) — NOT the 39.2 ms the r3
in-context note attributed to it).  This session decomposes the whole
132.6 ms pass-2 chunk at the real shapes (b=32: backbone n=1024, refiner
n=4096, k=16) to find where the time actually goes, and measures two
rewrite candidates:

  * the non-local attention at pass-2 scale materializes a
    (32, 4096, 4096) f32 map (2.1 GB) through HBM ~3x — candidate for a
    VMEM-resident Pallas attention kernel (K/V at bottleneck 64 fit VMEM
    whole, so no online softmax needed);
  * conv0 linearity rewrite: gather(feat) @ W_f == gather(feat @ W_f),
    so the first local conv's feature contraction can run on the n=4096
    table BEFORE the 16-way gather, removing the misaligned 134-channel
    concat materialization (the 6 xyz channels become fused
    multiply-adds).
"""

import numpy as np
import jax
import jax.numpy as jnp

from scripts.harness import timed

R = np.random.RandomState(0)

B, N, K, C = 32, 4096, 16, 128


def main():
    print("backend:", jax.default_backend(), flush=True)

    from dispu_tpu.ops.grouping import group_point
    from dispu_tpu.ops.knn import knn

    xyz = jnp.asarray(R.randn(B, N, 3), jnp.float32)
    feat = jnp.asarray(R.randn(B, N, C), jnp.float32)
    idx3 = jnp.asarray(R.randint(0, N, (B, N, K)), jnp.int32)

    # ---------------- A. refiner stand-ins at pass-2 shape --------------
    timed("A kNN (32,4096,3) k16 pallas",
          lambda p: knn(K, p, p, impl="pallas"), (xyz,), iters=10)
    timed("A gather native feat (32,4096,16,128)",
          lambda t, i: group_point(t, i), (feat, idx3), iters=10)
    timed("A gather native xyz (32,4096,16,3)",
          lambda t, i: group_point(t, i), (xyz, idx3), iters=10)

    w0 = jnp.asarray(R.randn(134, C) * 0.05, jnp.float32)
    w1 = jnp.asarray(R.randn(C, C) * 0.05, jnp.float32)

    def grouped_concat(f, i, p):
        gx = group_point(p, i)                      # (b,n,k,3)
        gf = group_point(f, i)                      # (b,n,k,128)
        centered = gx - p[:, :, None, :]
        return jnp.concatenate([centered, gx, gf], axis=-1)   # 134

    timed("A group+concat134 (materialized)",
          grouped_concat, (feat, idx3, xyz), iters=10)
    timed("A group+concat134+conv0+conv1",
          lambda f, i, p, a, b: jax.nn.relu(
              jax.nn.relu(grouped_concat(f, i, p) @ a) @ b),
          (feat, idx3, xyz, w0, w1), iters=10)

    x134 = jnp.asarray(R.randn(B, N, K, 134), jnp.float32)
    timed("A conv0+conv1 alone (134->128->128, 2M rows)",
          lambda x, a, b: jax.nn.relu(jax.nn.relu(x @ a) @ b),
          (x134, w0, w1), iters=10)

    y = jnp.asarray(R.randn(B, N, K, C), jnp.float32)
    w = jnp.asarray(R.randn(B, N, K, K), jnp.float32)
    wa = jnp.asarray(R.randn(2048, 256) * 0.02, jnp.float32)
    timed("A weight-pool einsum + flatten + dense",
          lambda y, w, a: (jnp.einsum("bnkt,bnkc->bntc", w, y)
                           .reshape(B, N, -1) @ a),
          (y, w, wa), iters=10)
    timed("A skip: max over k + dense 134->256",
          lambda x, a: jnp.max(x, axis=2) @ a,
          (x134, jnp.asarray(R.randn(134, 256) * 0.05, jnp.float32)),
          iters=10)

    # ---------------- B. non-local attention at 4096^2 ------------------
    kv_w = jnp.asarray(R.randn(C, C) * 0.05, jnp.float32)
    q_w = jnp.asarray(R.randn(C, 64) * 0.05, jnp.float32)
    bp_w = jnp.asarray(R.randn(64, 256) * 0.05, jnp.float32)

    def nl(f, kvw, qw, bpw):
        kv = f @ kvw
        q = f @ qw
        keys, values = kv[..., :64], kv[..., 64:]
        attn = jax.nn.softmax(
            jnp.einsum("bqc,bnc->bqn", q, keys) / 8.0, axis=-1)
        o = jnp.einsum("bqn,bnc->bqc", attn, values)
        return jax.nn.relu(o @ bpw)

    timed("B non-local attention (32,4096^2) XLA", nl,
          (feat, kv_w, q_w, bp_w), iters=10)

    q64 = jnp.asarray(R.randn(B, N, 64), jnp.float32)
    k64 = jnp.asarray(R.randn(B, N, 64), jnp.float32)
    v64 = jnp.asarray(R.randn(B, N, 64), jnp.float32)

    def attn_core(q, k, v):
        a = jax.nn.softmax(jnp.einsum("bqc,bnc->bqn", q, k) / 8.0, axis=-1)
        return jnp.einsum("bqn,bnc->bqc", a, v)

    timed("B   attn core alone (map 2.1 GB)", attn_core,
          (q64, k64, v64), iters=10)

    # ---------------- C. conv0 linearity rewrite ------------------------
    # gather(feat)@Wf == gather(feat@Wf): move the 128-ch contraction
    # before the gather; xyz terms (6 ch) become fused multiply-adds.
    wf = w0[6:]                                     # (128,128)
    wx = w0[:6]                                     # (6,128)

    def rewrite(f, i, p, a1):
        t = f @ wf                                  # (b,n,128) tiny matmul
        gt = group_point(t, i)                      # (b,n,k,128) aligned
        gx = group_point(p, i)
        centered = gx - p[:, :, None, :]
        # 6 xyz channels as fused MAs (elementwise, no matmul)
        pre = gt
        for j in range(3):
            pre = pre + centered[..., j, None] * wx[j]
            pre = pre + gx[..., j, None] * wx[3 + j]
        return jax.nn.relu(jax.nn.relu(pre) @ a1)

    def baseline(f, i, p, a1):
        return jax.nn.relu(
            jax.nn.relu(grouped_concat(f, i, p) @ w0) @ a1)

    o_rw = jax.jit(rewrite)(feat, idx3, xyz, w1)
    o_bl = jax.jit(baseline)(feat, idx3, xyz, w1)
    dev = float(jnp.max(jnp.abs(o_rw - o_bl)))
    rel = dev / float(jnp.max(jnp.abs(o_bl)))
    print(f"C rewrite vs baseline max|dev|={dev:.3e} (rel {rel:.2e})",
          flush=True)
    timed("C conv0-rewrite (pre-gather transform)",
          rewrite, (feat, idx3, xyz, w1), iters=10)
    timed("C conv0-baseline (concat134 form)",
          baseline, (feat, idx3, xyz, w1), iters=10)

    # ---------------- D. in-context (left over from session J) ----------
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
    timed("D gen pass1 b=64 256->1024 (default)",
          lambda x: model.apply(variables, x, train=False)[1],
          (patches1,), iters=8)
    timed("D gen pass2 b=32 1024->4096 (default)",
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
    print(f"D 16x e2e whole-cloud (5000->80000): {dt * 1000:.1f} ms "
          f"({np.asarray(out).shape})", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
