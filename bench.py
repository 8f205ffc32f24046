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


def main():
    import jax
    import jax.numpy as jnp

    from dispu_tpu.config import GeneratorConfig
    from dispu_tpu.models.generator import DisPUGenerator

    # 4x: 256 -> 1024, in the turbo inference configuration: one-hot MXU
    # neighborhood gathers in the refiner (output dev ≤2e-4) and backbone
    # (dev ~1e-2) — see PERFORMANCE.md.  Training/parity runs use the
    # default exact gathers.
    cfg = GeneratorConfig(fast_gather=True, fast_gather_backbone=True)
    model = DisPUGenerator(cfg=cfg)
    batch = 64  # patches per device step; the TPU pipeline batches patches
    iters = 20

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(batch, cfg.num_points, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    # The whole timing loop runs inside one jit: iterations are chained
    # (each input slice depends on the previous output) so XLA cannot elide
    # or overlap them, and per-dispatch host/tunnel latency — which is not
    # part of on-chip throughput — is excluded.  A host fetch of a scalar
    # checksum bounds the measurement (block_until_ready alone does not
    # guarantee completion on remote-dispatch platforms).
    @jax.jit
    def fwd_many(variables, x0):
        def body(carry, _):
            _, fine = model.apply(variables, carry, train=False)
            return fine[:, : cfg.num_points, :], jnp.sum(fine)
        final, sums = jax.lax.scan(body, x0, None, length=iters)
        return jnp.sum(sums)

    float(fwd_many(variables, x))  # warmup/compile

    t0 = time.perf_counter()
    checksum = float(fwd_many(variables, x))  # fetch forces completion
    dt = time.perf_counter() - t0
    assert np.isfinite(checksum)

    patches_per_sec = batch * iters / dt
    print(
        json.dumps(
            {
                "metric": "4x_upsample_patches_per_sec",
                "value": round(patches_per_sec, 2),
                "unit": "patches/sec (256->1024, 1 chip)",
                "vs_baseline": round(patches_per_sec / BASELINE_PATCHES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
