"""Round-3 session F: chunked-scan training wall-clock on chip.

Run: PYTHONPATH=/root/repo:/root/.axon_site \
        python -u scripts/profile_r3f.py

Measures REAL Trainer wall time per step (dispatch overhead included)
with the chunked-scan loop vs the stepwise loop, CD and GAN paths.
"""

import dataclasses
import time

import numpy as np


def run(use_gan, scan_steps, epochs=3):
    import jax

    from dispu_tpu.config import ExperimentConfig, TrainConfig
    from dispu_tpu.data.dataset import PatchDataset

    cfg = ExperimentConfig(
        train=dataclasses.replace(
            TrainConfig(batch_size=28),
            scan_steps=scan_steps,
            steps_per_print=20,
            backup_sources=False,
        ),
        use_gan=use_gan,
        log_dir=f"/tmp/r3f_{use_gan}_{scan_steps}",
    )
    ds = PatchDataset(h5_path="/nonexistent", synthetic_patches_count=560,
                      num_point=256, seed=0)
    if use_gan:
        from dispu_tpu.train.gan_trainer import GANTrainer as T
    else:
        from dispu_tpu.train.trainer import Trainer as T
    tr = T(cfg, dataset=ds, use_mesh=False)
    state = tr.train(epochs=1)  # compile + warm epoch
    t0 = time.perf_counter()
    state = tr._train_loop(state, 1, epochs)
    dt = time.perf_counter() - t0
    nsteps = (epochs - 1) * (560 // 28)
    name = ("GAN" if use_gan else "CD")
    mode = "chunked" if scan_steps else "stepwise"
    print(f"{name:3s} {mode:8s}: {dt / nsteps * 1000:7.2f} ms/step wall "
          f"({nsteps} steps)", flush=True)


def main():
    import jax

    print("backend:", jax.default_backend(), flush=True)
    run(False, False)
    run(False, True)
    run(True, False)
    run(True, True)


if __name__ == "__main__":
    main()
