"""Round-3 session A: bucketed merge FPS + shared-forward GAN step, on chip.

Run: cd /root/repo && python -u scripts/profile_r3a.py

Measures (methodology per PERFORMANCE.md: in-jit scan timing for ops;
sequential state-chained steps + final host fetch for train steps):
  1. kernel parity (incl. the new bucketed-FPS guard),
  2. merge-scale FPS: exact kernel vs bucketed (K = 32/64/128),
  3. 16x whole-cloud 5000 -> 80000: exact vs bucketed merge,
  4. Icosahedron 4x/16x outputs for offline quality eval (both modes),
  5. CD train step + GAN step (b=28) after the shared-forward restructure.
"""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from scripts.harness import timed

R = np.random.RandomState(0)
OUT = "/tmp/r3_outputs"


def main():
    print("backend:", jax.default_backend(), flush=True)
    os.makedirs(OUT, exist_ok=True)

    import bench

    bench.parity_guard()

    # ---- 2. merge-scale FPS --------------------------------------------
    from dispu_tpu.ops.sampling import (
        farthest_point_sample,
        farthest_point_sample_bucketed,
    )

    n, m = 237_568, 80_000
    cloud = jnp.asarray(R.randn(n, 3) * 0.5, jnp.float32)

    timed("merge FPS exact (n=237568, m=80000)",
          lambda p: farthest_point_sample(m, p[None])[0], (cloud,), iters=2)
    for K in (32, 64, 128):
        timed(f"merge FPS bucketed K={K}",
              lambda p, K=K: farthest_point_sample_bucketed(m, p, K),
              (cloud,), iters=4)
    # the partition alone (morton + argsort + gather), to see its share
    from dispu_tpu.ops.sampling import morton_codes

    timed("  morton+argsort+gather only",
          lambda p: p[jnp.argsort(morton_codes(p))], (cloud,), iters=4)

    # ---- 3./4. whole-cloud e2e -----------------------------------------
    from dispu_tpu.config import GeneratorConfig, InferenceConfig
    from dispu_tpu.inference import PatchUpsampler
    from dispu_tpu.train.state import create_generator_state
    from dispu_tpu.utils.checkpoint import restore_checkpoint
    from dispu_tpu.config import TrainConfig

    gen_cfg = GeneratorConfig()
    tmpl = create_generator_state(jax.random.PRNGKey(0), gen_cfg, TrainConfig())
    state = restore_checkpoint("demo/log/model-280.msgpack", tmpl)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    pc5k = np.asarray(R.randn(5000, 3) * 0.5, np.float32)

    def e2e(tag, inf_cfg, pc):
        up = PatchUpsampler(variables, gen_cfg=gen_cfg, inf_cfg=inf_cfg)
        out = up.upsample(pc)  # compile + warm
        assert np.isfinite(out).all()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = up.upsample(pc)
            float(np.sum(out))
            best = min(best, time.perf_counter() - t0)
        print(f"{tag:55s} {best*1000:8.1f} ms  ({len(pc)} -> {len(out)})",
              flush=True)
        return out

    e2e("whole-cloud 16x exact merge",
        InferenceConfig(final_ratio=16), pc5k)
    e2e("whole-cloud 16x bucketed merge K=64",
        InferenceConfig(final_ratio=16, merge_fps="bucketed"), pc5k)
    e2e("whole-cloud 4x exact merge",
        InferenceConfig(final_ratio=4), pc5k)
    e2e("whole-cloud 4x bucketed merge K=64",
        InferenceConfig(final_ratio=4, merge_fps="bucketed"), pc5k)

    # quality outputs: the reference test clouds, both modes
    from dispu_tpu.evaluation.meshio import read_xyz, write_xyz

    for name in ("Icosahedron", "fandisk"):
        pc = read_xyz(f"/root/reference/data/test/{name}.xyz")[:, :3]
        for ratio in (4, 16):
            for mode in ("exact", "bucketed"):
                up = PatchUpsampler(
                    variables, gen_cfg=gen_cfg,
                    inf_cfg=InferenceConfig(final_ratio=ratio, merge_fps=mode),
                )
                out = up.upsample(pc)
                write_xyz(f"{OUT}/{name}_X{ratio}_{mode}.xyz", out)
    print("quality outputs written to", OUT, flush=True)

    # ---- 5. train steps -------------------------------------------------
    from dispu_tpu.config import (DataConfig, ExperimentConfig, LossConfig)
    from dispu_tpu.train.gan_steps import create_gan_state, make_gan_train_step
    from dispu_tpu.train.steps import make_train_step

    cfg = ExperimentConfig(
        generator=gen_cfg, train=TrainConfig(batch_size=28),
        data=DataConfig(), loss=LossConfig(), use_gan=False,
    )
    gt = jnp.asarray(R.randn(28, 1024, 3) * 0.5, jnp.float32)
    radius = jnp.ones((28,), jnp.float32)

    def steps_ms(tag, step, state0):
        key = jax.random.PRNGKey(0)
        state, metrics = step(state0, gt, radius, key)  # compile
        float(metrics["total"])
        t0 = time.perf_counter()
        for i in range(20):
            key, sub = jax.random.split(key)
            state, metrics = step(state, gt, radius, sub)
        float(metrics["total"])  # bound the chain
        ms = (time.perf_counter() - t0) / 20 * 1000
        print(f"{tag:55s} {ms:8.2f} ms/step", flush=True)

    cd_state = create_generator_state(
        jax.random.PRNGKey(1), gen_cfg, cfg.train
    )
    steps_ms("CD train step b=28", make_train_step(cfg, donate=False),
             cd_state)

    gan_state = create_gan_state(jax.random.PRNGKey(2), cfg)
    steps_ms("GAN step b=28 (shared forward, ref clip)",
             make_gan_train_step(cfg, donate=False), gan_state)

    import dataclasses

    cfg_noclip = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, d_clip=0.0)
    )
    gan_state2 = create_gan_state(jax.random.PRNGKey(2), cfg_noclip)
    steps_ms("GAN step b=28 (shared forward, d_clip=0)",
             make_gan_train_step(cfg_noclip, donate=False), gan_state2)


if __name__ == "__main__":
    main()
