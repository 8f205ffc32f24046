"""Round-3 session C: 16x whole-cloud stage breakdown.

Run: cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
        python -u scripts/profile_r3c.py

Where do the 390 ms of the bucketed-merge 16x pipeline go?  Times each
stage of PatchUpsampler._pipeline_impl in isolation (in-jit scan, full
checksums) at the 5000-point cloud scale: patch prep (seed FPS + kNN +
normalize), generator pass 1 (b patches 256->1024), generator pass 2
(1024->4096), merges at both scales, and the big-n model components
(refiner kNN at 4096, NL attention) to find the second-pass hotspot.
"""

import numpy as np
import jax
import jax.numpy as jnp

from scripts.harness import timed

R = np.random.RandomState(0)


def main():
    print("backend:", jax.default_backend(), flush=True)

    from dispu_tpu.config import GeneratorConfig, InferenceConfig, TrainConfig
    from dispu_tpu.inference import PatchUpsampler
    from dispu_tpu.train.state import create_generator_state
    from dispu_tpu.utils.checkpoint import restore_checkpoint

    gen_cfg = GeneratorConfig()
    tmpl = create_generator_state(jax.random.PRNGKey(0), gen_cfg, TrainConfig())
    state = restore_checkpoint("demo/log/model-280.msgpack", tmpl)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    up = PatchUpsampler(
        variables, gen_cfg=gen_cfg,
        inf_cfg=InferenceConfig(final_ratio=16, merge_fps="bucketed"),
    )

    pc = jnp.asarray(R.randn(5000, 3) * 0.5, jnp.float32)
    seed_num = int(5000 / 256 * 3)  # 58

    timed("prepare: seed FPS(58) + kNN(256) + normalize",
          lambda p: up._prepare_impl(p, seed_num), (pc,), iters=8)

    model = up.model
    patches1 = jnp.asarray(R.randn(64, 256, 3) * 0.3, jnp.float32)
    patches2 = jnp.asarray(R.randn(32, 1024, 3) * 0.3, jnp.float32)

    timed("gen pass1 b=64 256->1024",
          lambda x: model.apply(variables, x, train=False)[1],
          (patches1,), iters=8)
    timed("gen pass2 b=32 1024->4096",
          lambda x: model.apply(variables, x, train=False)[1],
          (patches2,), iters=4)

    # second-pass component suspects
    from dispu_tpu.ops.knn import knn
    from dispu_tpu.ops.grouping import group_point

    big = jnp.asarray(R.randn(32, 4096, 3), jnp.float32)
    timed("  refiner xyz kNN k=16 @ (32, 4096)",
          lambda p: knn(16, p, p)[1], (big,), iters=4)
    feats = jnp.asarray(R.randn(32, 4096, 131), jnp.float32)
    idxb = jnp.asarray(R.randint(0, 4096, (32, 4096, 16)), jnp.int32)
    timed("  refiner gather (32,4096,16,131) onehot_hp",
          lambda f, i: group_point(f, i, impl="onehot_hp"), (feats, idxb),
          iters=4)
    # backbone kNN at 1024 inputs (pass-2 backbone)
    small = jnp.asarray(R.randn(32, 1024, 27), jnp.float32)
    timed("  backbone feat kNN k=17 @ (32, 1024, 27)",
          lambda p: knn(17, p, p)[1], (small,), iters=8)

    # NL attention scale: 4096 queries x 1024 keys, C=64
    q = jnp.asarray(R.randn(32, 4096, 64), jnp.float32)
    kv = jnp.asarray(R.randn(32, 1024, 64), jnp.float32)

    def attn(q, kv):
        a = jnp.einsum("bqc,bkc->bqk", q, kv)
        a = jax.nn.softmax(a, axis=-1)
        return jnp.einsum("bqk,bkc->bqc", a, kv)

    timed("  NL-attention-shaped matmuls (32,4096)x(32,1024)",
          attn, (q, kv), iters=8)

    from dispu_tpu.ops.sampling import (
        farthest_point_sample,
        farthest_point_sample_bucketed,
    )

    merged = jnp.asarray(R.randn(237_568, 3) * 0.5, jnp.float32)
    timed("merge bucketed K=64 (237568 -> 80000)",
          lambda p: farthest_point_sample_bucketed(80_000, p, 64),
          (merged,), iters=4)
    m4 = jnp.asarray(R.randn(59_392, 3) * 0.5, jnp.float32)
    timed("4x merge exact (59392 -> 20000)",
          lambda p: farthest_point_sample(20_000, p[None])[0], (m4,), iters=2)
    timed("4x merge bucketed K=64",
          lambda p: farthest_point_sample_bucketed(20_000, p, 64),
          (m4,), iters=4)


if __name__ == "__main__":
    main()
