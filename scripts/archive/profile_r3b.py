"""Round-3 session B: scan-method step timings + GAN demo regeneration.

Run: cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
        python -u scripts/profile_r3b.py

1. CD/GAN step times with the house methodology (scan inside one jit,
   host-fetch bound) — comparable to round 2's 40.6 / 49.9 ms.
2. Regenerates demo/gan_log with the documented deviating config
   (d_clip=0): 150 epochs on 1280 procedural patches, then --phase test
   over Icosahedron into demo/gan_outputs (same flow as round 2's demo,
   driven through the dispu.py CLI functions).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def step_scan_ms(label, step, state0, gt, rad, iters=20):
    @jax.jit
    def loop(state):
        def body(s, _):
            s2, m = step(
                s, gt, rad, jax.random.fold_in(jax.random.PRNGKey(1),
                                               _state_step(s))
            )
            return s2, m["total"]
        return jax.lax.scan(body, state, None, length=iters)

    def _state_step(s):
        return s.step if hasattr(s, "step") else s.gen.step

    s2, tot = loop(state0)
    float(jnp.sum(tot))
    t0 = time.perf_counter()
    s2, tot = loop(state0)
    float(jnp.sum(tot))
    ms = (time.perf_counter() - t0) / iters * 1000
    print(f"{label:55s} {ms:8.2f} ms/step", flush=True)
    return ms


def main():
    print("backend:", jax.default_backend(), flush=True)
    R = np.random.RandomState(0)

    import dataclasses

    from dispu_tpu.config import ExperimentConfig, TrainConfig
    from dispu_tpu.train.gan_steps import create_gan_state, make_gan_train_step
    from dispu_tpu.train.state import create_generator_state
    from dispu_tpu.train.steps import make_train_step

    cfg = ExperimentConfig(train=TrainConfig(batch_size=28))
    gt = jnp.asarray(R.randn(28, cfg.generator.num_out_points, 3), jnp.float32)
    rad = jnp.ones((28,), jnp.float32)

    state = create_generator_state(
        jax.random.PRNGKey(0), cfg.generator, cfg.train
    )
    step_scan_ms("CD train step b=28 [scan method]",
                 make_train_step(cfg, donate=False), state, gt, rad)

    gstate = create_gan_state(jax.random.PRNGKey(2), cfg)
    step_scan_ms("GAN step b=28 shared-fwd, ref clip [scan]",
                 make_gan_train_step(cfg, donate=False), gstate, gt, rad)

    cfg0 = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, d_clip=0.0)
    )
    gstate0 = create_gan_state(jax.random.PRNGKey(2), cfg0)
    step_scan_ms("GAN step b=28 shared-fwd, d_clip=0 [scan]",
                 make_gan_train_step(cfg0, donate=False), gstate0, gt, rad)

    # ---- GAN demo regeneration (deviating config, live critic) ---------
    import shutil, os

    for path in ("demo/gan_log", "demo/gan_outputs"):
        if os.path.isdir(path):
            shutil.rmtree(path)

    import dispu

    sys.argv = [
        "dispu.py", "--phase", "train", "--use_gan", "true",
        "--synthetic", "1280", "--batch_size", "32", "--epochs", "150",
        "--d_clip", "0", "--log_dir", "demo/gan_log", "--seed", "0",
    ]
    args = dispu.parse_args()
    dcfg = dispu.build_config(args)
    t0 = time.perf_counter()
    dispu.run_train(args, dcfg)
    print(f"gan demo train: {time.perf_counter() - t0:.1f}s", flush=True)

    sys.argv = [
        "dispu.py", "--phase", "test", "--log_dir", "demo/gan_log",
        "--test_data", "/root/reference/data/test/Icosahedron.xyz",
        "--out_folder", "demo/gan_outputs", "--final_ratio", "4",
    ]
    args = dispu.parse_args()
    dcfg = dispu.build_config(args)
    dispu.run_test(args, dcfg)
    print("gan demo outputs written", flush=True)


if __name__ == "__main__":
    main()
