"""Speed-of-light table: algorithmic FLOPs per stage vs measured chip time.

Counts each hot stage's FLOPs with XLA's own cost model
(``compiled.cost_analysis()`` of the CPU-lowered program — matmul/conv
math is platform-independent) and divides by the v5e peaks to get the
compute-bound floor, next to the measured on-chip times from
PERFORMANCE.md.  Caveats, stated in the output:

* Pallas kernels are opaque custom calls (0 flops in the cost model);
  stages that dispatch to them on TPU are counted via their XLA
  fallback-path math, which is the same algorithm (the kNN/FPS loops are
  selection- i.e. VPU-bound, so an MXU-flop floor understates them by
  design — the table marks those).
* "bytes accessed" from a CPU compile reflects CPU fusion, not TPU HBM
  traffic; only flops are used.

Run on CPU:
    cd /root/repo && env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        PYTHONPATH=/root/repo python -u scripts/sol_r3.py
"""

import numpy as np
import jax
import jax.numpy as jnp

# one v5e chip
PEAK_BF16 = 197e12   # MXU, bf16 multiply / f32 accumulate
PEAK_F32 = 49e12     # ≈ bf16/4: HIGHEST-style multi-pass f32 emulation
HBM_GBPS = 819e9

R = np.random.RandomState(0)


def flops_of(fn, *args):
    c = jax.jit(fn).lower(*args).compile()
    ca = c.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    return float(ca.get("flops", 0.0))


def row(name, measured_ms, fl, note=""):
    t_bf16 = fl / PEAK_BF16 * 1e3
    t_f32 = fl / PEAK_F32 * 1e3
    sol = (t_bf16 / measured_ms * 100) if measured_ms else 0.0
    print(f"{name:<46} {fl/1e9:>9.2f} GF  {t_bf16:>7.2f} / {t_f32:>7.2f} ms"
          f"  {measured_ms:>8.2f} ms  {sol:>5.1f}%  {note}")


def main():
    from dispu_tpu.config import ExperimentConfig, GeneratorConfig, TrainConfig
    from dispu_tpu.models.generator import DisPUGenerator
    from dispu_tpu.train.state import create_generator_state
    from dispu_tpu.train.steps import make_train_step

    print(f"{'stage':<46} {'flops':>12}  {'bf16 /   f32 floor':>18}"
          f"  {'measured':>10}  {'SOL':>5}")

    gen_cfg = GeneratorConfig()
    model = DisPUGenerator(cfg=gen_cfg)
    x1 = jnp.asarray(R.randn(64, 256, 3), jnp.float32)
    x2 = jnp.asarray(R.randn(32, 1024, 3), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x1, train=False)

    fl1 = flops_of(lambda v, x: model.apply(v, x, train=False)[1], v, x1)
    row("gen pass1 b=64 256->1024 (fwd)", 31.25, fl1,
        "kNN selection VPU-bound on top")
    v2 = model.init(jax.random.PRNGKey(0), x2, train=False)
    fl2 = flops_of(lambda v, x: model.apply(v, x, train=False)[1], v2, x2)
    row("gen pass2 b=32 1024->4096 (fwd)", 104.33, fl2,
        "kNN 22.9 + gather ~17 ms are not MXU work")

    cfg = ExperimentConfig(train=TrainConfig(batch_size=28))
    step = make_train_step(cfg, mesh=None, donate=False)
    state = create_generator_state(
        jax.random.PRNGKey(0), cfg.generator, cfg.train)
    gt = jnp.asarray(R.randn(28, cfg.generator.num_out_points, 3), jnp.float32)
    rad = jnp.ones((28,), jnp.float32)
    key = jax.random.PRNGKey(1)
    fl_step = flops_of(lambda s, g, r, k: step(s, g, r, k)[1]["total"],
                       state, gt, rad, key)
    row("CD train step b=28 (fwd+bwd+adam)", 36.23, fl_step,
        "incl. chamfer/repulsion selection (VPU)")

    # isolated cores
    q = jnp.asarray(R.randn(32, 4096, 64), jnp.float32)
    kv = jnp.asarray(R.randn(32, 4096, 64), jnp.float32)

    def attn(q, k, vv):
        s = jnp.einsum("bqc,bnc->bqn", q, k) * 0.125
        return jnp.einsum("bqn,bnc->bqc", jax.nn.softmax(s, -1), vv)

    row("NL attention core (32, 4096^2, c64)", 5.65,
        flops_of(attn, q, kv, kv), "pallas kernel; same math")

    tbl = jnp.asarray(R.randn(32, 4096, 131), jnp.float32)
    idx = jnp.asarray(R.randint(0, 4096, (32, 65536)), jnp.int32)
    row("pass2 combined gather (native, mem-bound)", 17.0,
        flops_of(lambda t, i: jax.vmap(lambda a, b: a[b])(t, i), tbl, idx),
        f"HBM floor {32*65536*131*4*2/HBM_GBPS*1e3:.1f} ms (read+write)")

    pts = jnp.asarray(R.randn(32, 4096, 3), jnp.float32)
    d_fl = flops_of(
        lambda p: jnp.sum(p * p, -1)[:, :, None]
        - 2 * jnp.einsum("bnc,bmc->bnm", p, p,
                         precision=jax.lax.Precision.HIGHEST)
        + jnp.sum(p * p, -1)[:, None, :], pts)
    row("refiner kNN (32,4096,k16): distance part", 22.90, d_fl,
        "selection rounds (VPU) dominate, not the MXU")

    print("""
peaks: one v5e chip, 197 TFLOP/s bf16 MXU (f32-emulation ~49), HBM 819 GB/s.
SOL%% = bf16 compute floor / measured.  Stages marked VPU-bound have their
real floor set by selection-pass count (see PERFORMANCE.md kNN sections),
not MXU flops — their SOL%% against the MXU floor is structurally low.""")


if __name__ == "__main__":
    main()
