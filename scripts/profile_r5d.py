"""Round-5 closing leg: 16x exact streaming e2e at the width-256 merge.

profile_r5b measured upsample()-loop 564 ms/cloud vs upsample_many(B=3)
514 ms/cloud with the width-128 batch merge; profile_r5c's sweep then
made width 256 the batch kernel's default (merge 283 -> 136 ms/cloud at
b=3).  This leg re-measures the honest end-to-end number the derived
~417 ms/cloud claim rests on.

Run:  cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
        python -u scripts/profile_r5d.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

R = np.random.RandomState(0)


def main():
    import jax

    from dispu_tpu.config import GeneratorConfig, InferenceConfig, TrainConfig
    from dispu_tpu.inference import PatchUpsampler
    from dispu_tpu.train.state import create_generator_state

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    state = create_generator_state(
        jax.random.PRNGKey(0), GeneratorConfig(), TrainConfig()
    )
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    up = PatchUpsampler(
        variables, gen_cfg=GeneratorConfig(),
        inf_cfg=InferenceConfig(final_ratio=16, merge_fps="exact"),
    )
    pcs = R.randn(3, 5000, 3).astype(np.float32)

    for name, fn in (
        ("solo loop", lambda r: [up.upsample(pcs[v] + r * 1e-7)
                                 for v in range(3)][-1]),
        ("upsample_many B=3 (width-256 merge)",
         lambda r: up.upsample_many(pcs + r * 1e-7)),
    ):
        out = fn(0)  # compile + warm
        t0 = time.perf_counter()
        reps = 2
        for r in range(1, reps + 1):
            out = fn(r)
        dt = (time.perf_counter() - t0) / reps / 3
        print(f"{name}: {dt*1e3:.0f} ms/cloud "
              f"(checksum {float(np.sum(out)):.3f})", flush=True)


if __name__ == "__main__":
    main()
