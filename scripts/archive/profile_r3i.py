"""Round-3 session I: turbo serving config for the whole-cloud pipeline.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_r3i.py

The bf16 fast-gather turbo flags exist for patch serving (2 250 p/s);
measure them end-to-end on the whole-cloud pipeline combined with the
bucketed merge — the maximum-throughput serving configuration.
"""

import time

import numpy as np
import jax


def main():
    print("backend:", jax.default_backend(), flush=True)

    from dispu_tpu.config import GeneratorConfig, InferenceConfig, TrainConfig
    from dispu_tpu.inference import PatchUpsampler
    from dispu_tpu.train.state import create_generator_state
    from dispu_tpu.utils.checkpoint import restore_checkpoint

    tmpl = create_generator_state(
        jax.random.PRNGKey(0), GeneratorConfig(), TrainConfig()
    )
    state = restore_checkpoint("demo/log/model-280.msgpack", tmpl)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    R = np.random.RandomState(0)
    pc5k = np.asarray(R.randn(5000, 3) * 0.5, np.float32)

    def e2e(tag, gen_cfg, inf_cfg):
        up = PatchUpsampler(variables, gen_cfg=gen_cfg, inf_cfg=inf_cfg)
        out = up.upsample(pc5k)
        assert np.isfinite(out).all()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = up.upsample(pc5k)
            float(np.sum(out))
            best = min(best, time.perf_counter() - t0)
        print(f"{tag:55s} {best*1000:8.1f} ms  (5000 -> {len(out)})",
              flush=True)

    turbo = GeneratorConfig(fast_gather=True, fast_gather_backbone=True)
    e2e("4x  turbo gathers + bucketed merge", turbo,
        InferenceConfig(final_ratio=4, merge_fps="bucketed"))
    e2e("16x turbo gathers + bucketed merge", turbo,
        InferenceConfig(final_ratio=16, merge_fps="bucketed"))
    e2e("16x turbo gathers + exact merge", turbo,
        InferenceConfig(final_ratio=16))


if __name__ == "__main__":
    main()
