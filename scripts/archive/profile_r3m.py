"""Round-3 session M: 4x/16x e2e variance check after the NL-attention
kernel + combined gather landed (session L saw 4x at 95.6 ms vs the 75.9
record — one-shot measurements; quantify variance with 6 reps each).

Run on the TPU:
    cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
        python -u scripts/profile_r3m.py
"""

import time

import numpy as np
import jax.numpy as jnp
import jax.random

from dispu_tpu.config import GeneratorConfig, InferenceConfig, TrainConfig
from dispu_tpu.inference import PatchUpsampler
from dispu_tpu.train.state import create_generator_state
from dispu_tpu.utils.checkpoint import restore_checkpoint

R = np.random.RandomState(0)


def rep(tag, up, pts, n=6):
    up.upsample(pts)  # warm/compile
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = up.upsample(pts)
        ts.append((time.perf_counter() - t0) * 1000)
    ts = np.asarray(ts)
    print(f"{tag}: min {ts.min():.1f}  median {np.median(ts):.1f}  "
          f"max {ts.max():.1f} ms  ({np.asarray(out).shape})", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    gen_cfg = GeneratorConfig()
    tmpl = create_generator_state(
        jax.random.PRNGKey(0), gen_cfg, TrainConfig())
    state = restore_checkpoint("demo/log/model-280.msgpack", tmpl)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    pts = np.asarray(R.randn(5000, 3) * 0.5, np.float32)

    for ratio, note in ((4, "r3 record 75.9"), (16, "r3 record 347.2")):
        up = PatchUpsampler(
            variables, gen_cfg=gen_cfg,
            inf_cfg=InferenceConfig(final_ratio=ratio,
                                    merge_fps="bucketed"),
        )
        rep(f"{ratio}x e2e ({note})", up, pts)
    print("done", flush=True)


if __name__ == "__main__":
    main()
