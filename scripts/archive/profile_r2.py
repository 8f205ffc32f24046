"""Round-2 on-chip profile: refiner decomposition + exact-gather variants.

Run on the TPU (one process — chip grants are slow):
    cd /root/repo && python -u scripts/profile_r2.py

Methodology (PERFORMANCE.md): every number comes from a timing loop
*inside* one jit (lax.scan with a data dependency between iterations),
bounded by a host fetch — per-dispatch tunnel latency on this platform is
~1.6 ms and `block_until_ready` does not guarantee completion.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

R = np.random.RandomState(0)


def timed(label, fn, args, iters=30):
    """ms/iter of fn(*args) via an in-jit scan with a data dependency."""
    args = tuple(jax.tree.map(jnp.asarray, a) for a in args)

    def perturb(a, c):
        done = [False]

        def go(x):
            if not done[0] and jnp.issubdtype(x.dtype, jnp.floating):
                done[0] = True
                return x + c.astype(x.dtype) * 1e-30
            return x

        return jax.tree.map(go, a)

    @jax.jit
    def loop(args):
        def body(c, _):
            out = fn(*tuple(perturb(a, c) for a in args))
            # checksum EVERY output element: a single-element carry lets
            # XLA slice the dot/DCE everything not feeding that element
            # (pallas calls are opaque and stay whole — XLA ops must too)
            tot = jnp.float32(0.0)
            for leaf in jax.tree_util.tree_leaves(out):
                tot = tot + jnp.sum(leaf).astype(jnp.float32)
            return tot * 1e-30, ()

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    float(loop(args))  # compile + warm
    t0 = time.perf_counter()
    float(loop(args))
    ms = (time.perf_counter() - t0) / iters * 1000
    print(f"{label:55s} {ms:8.2f} ms/iter", flush=True)
    return ms


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)

    # ---------------- A. pallas gather parity on-chip ----------------
    from dispu_tpu.ops.pallas_kernels import gather_rows_pallas

    tbl = jnp.asarray(R.randn(64, 1024, 128), jnp.float32)
    idx = jnp.asarray(R.randint(0, 1024, (64, 1024 * 16)), jnp.int32)
    ref = jax.jit(jax.vmap(lambda t, i: t[i]))(tbl, idx)
    try:
        out = jax.jit(gather_rows_pallas)(tbl, idx)
        ok = bool(jnp.array_equal(ref, out))
        print("gather_rows_pallas on-chip bit-identical:", ok, flush=True)
    except Exception as e:  # Mosaic lowering may reject the A^T B form
        print("gather_rows_pallas FAILED on-chip:", repr(e)[:500], flush=True)
        ok = False

    # ---------------- B. gather variants at refiner scale ----------------
    from dispu_tpu.ops.grouping import group_point

    idx3 = idx.reshape(64, 1024, 16)
    timed("gather native (64,1024,16,128)",
          lambda t, i: group_point(t, i), (tbl, idx3))
    timed("gather onehot_hp (HIGHEST, 6-pass)",
          lambda t, i: group_point(t, i, impl="onehot_hp"), (tbl, idx3))
    timed("gather onehot bf16 (1-pass, inexact)",
          lambda t, i: group_point(t, i, impl="onehot"), (tbl, idx3))

    def mixed(t, i):
        b, n, c = t.shape
        m, k = i.shape[1], i.shape[2]
        oh = jax.nn.one_hot(i.reshape(b, m * k), n, dtype=t.dtype)
        o = jnp.einsum("bqn,bnc->bqc", oh, t,
                       precision=(jax.lax.Precision.DEFAULT,
                                  jax.lax.Precision.HIGHEST))
        return o.reshape(b, m, k, c)

    try:
        o_mixed = jax.jit(mixed)(tbl, idx3)
        print("mixed-precision onehot bit-identical:",
              bool(jnp.array_equal(
                  ref.reshape(64, 1024, 16, 128), o_mixed)), flush=True)
        timed("gather onehot mixed (DEFAULT,HIGHEST)", mixed, (tbl, idx3))
    except Exception as e:
        print("mixed precision einsum failed:", repr(e)[:200], flush=True)

    def split3(t, i):
        b, n, c = t.shape
        m, k = i.shape[1], i.shape[2]
        oh = jax.nn.one_hot(i.reshape(b, m * k), n, dtype=jnp.bfloat16)
        t1 = t.astype(jnp.bfloat16)
        r1 = t - t1.astype(jnp.float32)
        t2 = r1.astype(jnp.bfloat16)
        t3 = (r1 - t2.astype(jnp.float32)).astype(jnp.bfloat16)
        dot = lambda a: jax.lax.dot_general(
            oh, a, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o = dot(t1) + dot(t2) + dot(t3)
        return o.reshape(b, m, k, c)

    o_s3 = jax.jit(split3)(tbl, idx3)
    print("split3 XLA bit-identical:",
          bool(jnp.array_equal(ref.reshape(64, 1024, 16, 128), o_s3)),
          flush=True)
    timed("gather split3 XLA (3-pass)", split3, (tbl, idx3))
    if ok:
        timed("gather pallas kernel (3-pass, VMEM, tq=512)",
              lambda t, i: group_point(t, i, impl="pallas"), (tbl, idx3))
        timed("gather pallas kernel tq=1024",
              lambda t, i: gather_rows_pallas(t, i, 1024), (tbl, idx))
        timed("gather pallas kernel tq=256",
              lambda t, i: gather_rows_pallas(t, i, 256), (tbl, idx))

    # gradient paths (training): d(sum sin(gather))/d(table)
    for impl in (["gather", "onehot_hp"] + (["pallas"] if ok else [])):
        timed(f"gather+grad [{impl}]",
              lambda t, i, im=impl: jax.grad(
                  lambda tt: jnp.sum(jnp.sin(group_point(tt, i, impl=im)))
              )(t),
              (tbl, idx3), iters=15)

    # scatter kernel parity on-chip (vs at[].add)
    from dispu_tpu.ops.pallas_kernels import scatter_rows_pallas

    gct = jnp.asarray(R.randn(64, 1024 * 16, 128), jnp.float32)
    try:
        sc = jax.jit(lambda g, i: scatter_rows_pallas(g, i, 1024))(gct, idx)
        sc_ref = jax.jit(jax.vmap(
            lambda z, i, u: z.at[i].add(u)
        ))(jnp.zeros((64, 1024, 128), jnp.float32), idx, gct)
        dev = float(jnp.max(jnp.abs(sc - sc_ref)))
        print(f"scatter_rows_pallas on-chip max|dev| vs at[].add: {dev:.3e}",
              flush=True)
    except Exception as e:
        print("scatter_rows_pallas FAILED on-chip:", repr(e)[:500],
              flush=True)

    # ---------------- C. kNN ----------------
    from dispu_tpu.ops.knn import knn

    xyz = jnp.asarray(R.randn(64, 1024, 3), jnp.float32)
    timed("knn xyz (64,1024,3) k16 pallas",
          lambda p: knn(16, p, p, impl="pallas"), (xyz,))
    timed("knn xyz (64,1024,3) k16 xla",
          lambda p: knn(16, p, p, impl="xla"), (xyz,))
    feats = jnp.asarray(R.randn(64, 256, 48), jnp.float32)
    timed("knn feat (64,256,48) k17 pallas",
          lambda p: knn(17, p, p, impl="pallas"), (feats,))
    timed("knn feat (64,256,48) k17 xla",
          lambda p: knn(17, p, p, impl="xla"), (feats,))

    # ---------------- D. refiner component stand-ins ----------------
    x134 = jnp.asarray(R.randn(64, 1024, 16, 134), jnp.float32)
    w0 = jnp.asarray(R.randn(134, 128) * 0.05, jnp.float32)
    w1 = jnp.asarray(R.randn(128, 128) * 0.05, jnp.float32)
    timed("local conv0+conv1 (1M rows, 134→128→128)",
          lambda x, a, b: jax.nn.relu(jax.nn.relu(x @ a) @ b),
          (x134, w0, w1))

    y = jnp.asarray(R.randn(64, 1024, 16, 128), jnp.float32)
    w = jnp.asarray(R.randn(64, 1024, 16, 16), jnp.float32)
    wa = jnp.asarray(R.randn(2048, 256) * 0.02, jnp.float32)
    timed("weight-pool einsum bnkc,bnkt + flatten + dense",
          lambda y, w, a: (jnp.einsum("bnkc,bnkt->bnct", y, w)
                           .reshape(64, 1024, -1) @ a),
          (y, w, wa))

    feat = jnp.asarray(R.randn(64, 1024, 128), jnp.float32)
    kv_w = jnp.asarray(R.randn(128, 128) * 0.05, jnp.float32)
    q_w = jnp.asarray(R.randn(128, 64) * 0.05, jnp.float32)
    bp_w = jnp.asarray(R.randn(64, 256) * 0.05, jnp.float32)

    def nl(f, kvw, qw, bpw):
        kv = f @ kvw
        q = f @ qw
        keys, values = kv[..., :64], kv[..., 64:]
        attn = jax.nn.softmax(
            jnp.einsum("bqc,bnc->bqn", q, keys) / 8.0, axis=-1)
        o = jnp.einsum("bqn,bnc->bqc", attn, values)
        return jax.nn.relu(o @ bpw)

    timed("non-local attention (1024x1024)", nl, (feat, kv_w, q_w, bp_w))

    timed("skip: max over k + dense 134→256",
          lambda x, a: jnp.max(x, axis=2) @ a,
          (x134, jnp.asarray(R.randn(134, 256) * 0.05, jnp.float32)))

    # ---------------- E. end-to-end generator ----------------
    from dispu_tpu.config import GeneratorConfig
    from dispu_tpu.models.generator import DisPUGenerator

    inp = jnp.asarray(R.randn(64, 256, 3), jnp.float32)

    def e2e(tag, cfg):
        model = DisPUGenerator(cfg=cfg)
        vs = jax.jit(lambda: model.init(
            jax.random.PRNGKey(0), inp, train=False))()
        ms = timed(f"e2e fwd b=64 [{tag}]",
                   lambda v, x: model.apply(v, x, train=False), (vs, inp),
                   iters=20)
        print(f"   -> {64 / (ms / 1000):.0f} patches/sec", flush=True)

    e2e("onehot_hp (default)", GeneratorConfig())
    if ok:
        e2e("pallas gather", GeneratorConfig(gather_impl="pallas"))
    e2e("native gather", GeneratorConfig(gather_impl="gather"))
    e2e("turbo fast_gather_backbone",
        GeneratorConfig(fast_gather=True, fast_gather_backbone=True))

    print("done", flush=True)


if __name__ == "__main__":
    main()
