"""Round-4 session B: the GAN step residual (VERDICT r3 item 5).

Round 3 left the fused shared-geometry GAN step at 54.1 ms wall vs
52.6 ms in-context compute at b=28, with the critic stages costing
~7 ms over the CD step (ROUND3.md lever 4).  This session breaks the
critic cost down on chip and A/Bs the available cuts:

  A. CD step b=28 anchor (r3 session-2 ref: 36.23 ms).
  B. GAN step, default critic (r3 ref: 47.45 ms at this protocol).
  C. GAN step with the critic's 3-scale grouping on the fused
     kNN+gather kernel (DiscriminatorConfig.fused_grouping=True —
     wired in round 3, measured only at the kernel level).
  D. critic stages in isolation: the parameter-free paired
     neighborhoods (FPS seeds + 3-scale kNN + gathers), one
     discriminator apply, and the pred re-gather — identifies which
     stage owns the ~7 ms.

Run on the TPU (one process — chip grants are slow):
    cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
        python -u scripts/profile_r4b.py
"""

import dataclasses
import time

import numpy as np
import jax
import jax.numpy as jnp

from scripts.harness import timed

R = np.random.RandomState(0)


def scan_step(tag, step, state, args_fn, get_epochish, iters=20):
    @jax.jit
    def loop(s0):
        def body(s, _):
            s2, m = step(s, *args_fn(s))
            return s2, m["total"]
        s, tot = jax.lax.scan(body, s0, None, length=iters)
        return s, tot

    s2, tot = loop(state)
    float(jnp.sum(tot))
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        s2, tot = loop(state)
        assert np.isfinite(float(jnp.sum(tot)))
        dt = min(dt, time.perf_counter() - t0)
    print(f"{tag}: {dt / iters * 1000:.2f} ms/step", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)

    from dispu_tpu.config import (DiscriminatorConfig, ExperimentConfig,
                                  TrainConfig)
    from dispu_tpu.models.discriminator import (
        PatchDiscriminator, paired_neighborhoods_with_pred_indices,
        regather_pred)
    from dispu_tpu.train.gan_steps import create_gan_state, make_gan_train_step
    from dispu_tpu.train.state import create_generator_state
    from dispu_tpu.train.steps import make_train_step

    cfg = ExperimentConfig(train=TrainConfig(batch_size=28))
    gt = jnp.asarray(
        R.randn(28, cfg.generator.num_out_points, 3), jnp.float32)
    rad = jnp.ones((28,), jnp.float32)
    key = jax.random.PRNGKey(1)

    # ---- A: CD anchor --------------------------------------------------
    tstate = create_generator_state(
        jax.random.PRNGKey(0), cfg.generator, cfg.train)
    step = make_train_step(cfg, mesh=None, donate=False)
    scan_step("A CD step b=28 (r3 ref 36.23)", step, tstate,
              lambda s: (gt, rad, jax.random.fold_in(key, s.step)),
              None)

    # ---- B/C: GAN step, critic default vs fused grouping ---------------
    for tag, dcfg in (
        ("B GAN step b=28 critic default (r3 ref 47.45)",
         DiscriminatorConfig()),
        ("C GAN step b=28 critic fused",
         DiscriminatorConfig(fused_grouping=True)),
    ):
        cfg_d = dataclasses.replace(cfg, discriminator=dcfg)
        gstate = create_gan_state(jax.random.PRNGKey(0), cfg_d)
        gstep = make_gan_train_step(cfg_d, mesh=None, donate=False)
        scan_step(tag, gstep, gstate,
                  lambda s: (gt, rad, jax.random.fold_in(key, s.gen.step)),
                  None)

    # ---- D: critic stages in isolation ---------------------------------
    fake = jnp.asarray(
        R.randn(28, cfg.generator.num_out_points, 3), jnp.float32)
    for tag, dcfg in (("default", DiscriminatorConfig()),
                      ("fused", DiscriminatorConfig(fused_grouping=True))):
        disc = PatchDiscriminator(cfg=dcfg)
        d_vars = disc.init(jax.random.PRNGKey(3), fake, gt)

        timed(f"D paired neighborhoods ({tag})",
              lambda g, f, d=dcfg: paired_neighborhoods_with_pred_indices(
                  d, g, f),
              (gt, fake), iters=10)
        timed(f"D critic apply ({tag})",
              lambda g, f, dv=d_vars, m=disc: m.apply(dv, f, g),
              (gt, fake), iters=10)
    groups, pred_idx = paired_neighborhoods_with_pred_indices(
        DiscriminatorConfig(), gt, fake)
    timed("D regather_pred",
          lambda f, g=groups, i=pred_idx: regather_pred(g, i, f),
          (fake,), iters=10)


if __name__ == "__main__":
    main()
