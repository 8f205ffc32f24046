"""Round-3 session D: 16x after the size-aware gather dispatch.

Run: cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
        python -u scripts/profile_r3d.py
"""

import time

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

    model = PatchUpsampler(variables, gen_cfg=gen_cfg).model
    patches2 = jnp.asarray(R.randn(32, 1024, 3) * 0.3, jnp.float32)
    timed("gen pass2 b=32 1024->4096 (gather fix)",
          lambda x: model.apply(variables, x, train=False)[1],
          (patches2,), iters=4)

    pc5k = np.asarray(R.randn(5000, 3) * 0.5, np.float32)

    def e2e(tag, inf_cfg, pc):
        up = PatchUpsampler(variables, gen_cfg=gen_cfg, inf_cfg=inf_cfg)
        out = up.upsample(pc)
        assert np.isfinite(out).all()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = up.upsample(pc)
            float(np.sum(out))
            best = min(best, time.perf_counter() - t0)
        print(f"{tag:55s} {best*1000:8.1f} ms  ({len(pc)} -> {len(out)})",
              flush=True)

    e2e("whole-cloud 16x bucketed merge",
        InferenceConfig(final_ratio=16, merge_fps="bucketed"), pc5k)
    e2e("whole-cloud 16x exact merge",
        InferenceConfig(final_ratio=16), pc5k)
    e2e("whole-cloud 4x bucketed merge",
        InferenceConfig(final_ratio=4, merge_fps="bucketed"), pc5k)
    e2e("whole-cloud 4x exact merge",
        InferenceConfig(final_ratio=4), pc5k)


if __name__ == "__main__":
    main()
