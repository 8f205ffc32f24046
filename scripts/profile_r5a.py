"""Round-5 pre-training sweep (one chip grant): GAN balance + cluster-aug.
(See profile_r5b.py for the perf session.)

Two decisions gate the round-5 401-epoch retrains (VERDICT r4 items 1-3),
both cheap to resolve at 60 epochs on a 4.9k-pair subset of the new v2
corpus (the round-4 GAN run's critic saturated by epoch ~50 at the same
steps/epoch scale, so 60 epochs shows the trajectory):

  A. GAN balance (VERDICT item 2): which deviating d_clip=0 config keeps
     d_gap in a mid-band instead of the round-4 saturation (0.9997,
     g_gan pinned at 1.0)?
       a1: gen_update=2, lr_d=1e-4   (the newly-wired schedule knob)
       a2: gen_update=1, lr_d=2e-5   (lr-based balancing)
       a3: gen_update=4, lr_d=1e-4   (stronger schedule)
  B. cluster-aug (VERDICT item 3): does cluster_prob=0.3 hurt X4 while
     helping X16?  60-epoch CD models with prob 0.0 vs 0.3, then a quick
     X4/X16 upsample of one held-out cloud each, CD vs its gt cloud.

Run:  cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
        python -u scripts/profile_r5a.py
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SUBSET = "/tmp/r5_sweep/subset.h5"
FULL = "data/PUGAN_poisson_256_poisson_1024.h5"
EPOCHS = 60


def build_subset():
    """First 40 patches of each mesh (patches are stored mesh-contiguous,
    170 per mesh) — every shape family represented at round-4 epoch cost."""
    import h5py

    os.makedirs(os.path.dirname(SUBSET), exist_ok=True)
    if os.path.exists(SUBSET):
        return
    with h5py.File(FULL, "r") as f:
        pin = f["poisson_256"][:]
        pgt = f["poisson_1024"][:]
    per, take = 170, 40
    sel = np.concatenate([
        np.arange(k * per, k * per + take) for k in range(len(pin) // per)
    ])
    with h5py.File(SUBSET, "w") as f:
        f.create_dataset("poisson_256", data=pin[sel])
        f.create_dataset("poisson_1024", data=pgt[sel])
    print(f"subset: {len(sel)} pairs -> {SUBSET}", flush=True)


def make_cfg(log_dir, use_gan=False, gen_update=2, lr_d=1e-4,
             cluster_prob=0.0):
    from dispu_tpu.config import (
        DataConfig, ExperimentConfig, TrainConfig,
    )

    return ExperimentConfig(
        train=TrainConfig(
            d_clip=0.0 if use_gan else 0.01,
            gen_update=gen_update,
            base_lr_d=lr_d,
            backup_sources=False,
        ),
        data=DataConfig(cluster_prob=cluster_prob),
        use_gan=use_gan,
        log_dir=log_dir,
    )


def train_leg(name, cfg):
    from dispu_tpu.data.dataset import PatchDataset
    from dispu_tpu.train.gan_trainer import GANTrainer
    from dispu_tpu.train.trainer import Trainer

    t0 = time.time()
    ds = PatchDataset(h5_path=SUBSET, random_input=True)
    cls = GANTrainer if cfg.use_gan else Trainer
    trainer = cls(cfg, dataset=ds)
    state = trainer.train(epochs=EPOCHS)
    print(f"[{name}] {EPOCHS} epochs in {(time.time()-t0)/60:.1f} min",
          flush=True)
    return trainer, state


def tail_metrics(log_dir, keys):
    """Mean of the last 10 epochs' log-line values for each key."""
    rows = []
    with open(os.path.join(log_dir, "log_train.txt")) as f:
        for line in f:
            if not line.startswith("epoch"):
                continue
            d = {}
            for tok in line.split()[1:]:
                if "=" in tok:
                    k, v = tok.split("=")
                    d[k] = float(v)
            rows.append(d)
    out = {}
    for k in keys:
        vals = [r[k] for r in rows[-10:] if k in r]
        out[k] = float(np.mean(vals)) if vals else float("nan")
    return out


def quick_eval(name, variables):
    """X4 + X16 upsample of one held-out cloud; CD vs its gt cloud."""
    import jax.numpy as jnp

    from dispu_tpu.config import GeneratorConfig, InferenceConfig
    from dispu_tpu.evaluation.meshio import read_xyz
    from dispu_tpu.evaluation.metrics import cd_hd
    from dispu_tpu.inference import PatchUpsampler

    pc = read_xyz("data/heldout/input/ho_box_03.xyz")[:, :3]
    gt = jnp.asarray(read_xyz("data/heldout/gt/ho_box_03.xyz")[:, :3])
    out = {}
    for ratio in (4, 16):
        up = PatchUpsampler(
            variables, gen_cfg=GeneratorConfig(),
            inf_cfg=InferenceConfig(final_ratio=ratio),
        )
        pred = up.upsample(pc)
        cd, hd = cd_hd(jnp.asarray(pred), gt)
        out[ratio] = (float(cd), float(hd))
        print(f"[{name}] X{ratio}: CD={float(cd):.6f} HD={float(hd):.6f}",
              flush=True)
    print(f"[{name}] X16/X4 CD ratio: {out[16][0]/out[4][0]:.3f}", flush=True)
    return out


def main():
    import jax

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    build_subset()

    results = {}

    # ---- B. cluster-aug CD legs (also serve as schedule sanity) --------
    for name, prob in (("cd_p0", 0.0), ("cd_p3", 0.3)):
        cfg = make_cfg(f"/tmp/r5_sweep/{name}", cluster_prob=prob)
        trainer, state = train_leg(name, cfg)
        m = tail_metrics(cfg.log_dir, ["fine_cd", "coarse_cd"])
        print(f"[{name}] tail: {m}", flush=True)
        ev = quick_eval(name, {
            "params": state.params, "batch_stats": state.batch_stats,
        })
        results[name] = (m, ev)

    # ---- A. GAN balance legs -------------------------------------------
    for name, gu, lrd in (("gan_gu2", 2, 1e-4),
                          ("gan_gu1_lrd2e5", 1, 2e-5),
                          ("gan_gu4", 4, 1e-4)):
        cfg = make_cfg(f"/tmp/r5_sweep/{name}", use_gan=True,
                       gen_update=gu, lr_d=lrd)
        trainer, state = train_leg(name, cfg)
        m = tail_metrics(cfg.log_dir,
                         ["fine_cd", "d_gap", "g_gan", "d_loss", "d_var"])
        print(f"[{name}] tail: {m}", flush=True)
        results[name] = (m, None)

    print("==== sweep summary ====", flush=True)
    for name, (m, ev) in results.items():
        print(name, m, ev, flush=True)


if __name__ == "__main__":
    main()
