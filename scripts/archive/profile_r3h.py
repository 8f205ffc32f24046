"""Round-3 session H2: instrument the real Trainer chunk loop (donation-safe)."""

import dataclasses
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    print("backend:", jax.default_backend(), flush=True)

    from dispu_tpu.config import ExperimentConfig, TrainConfig
    from dispu_tpu.data.dataset import PatchDataset
    from dispu_tpu.train.trainer import Trainer

    cfg = ExperimentConfig(
        train=dataclasses.replace(
            TrainConfig(batch_size=28), scan_steps=True,
            steps_per_print=20, backup_sources=False,
        ),
        log_dir="/tmp/r3h",
    )
    ds = PatchDataset(h5_path="/nonexistent", synthetic_patches_count=560,
                      num_point=256, seed=0)
    tr = Trainer(cfg, dataset=ds, use_mesh=False)
    s = tr.train(epochs=1)  # warm: compiles chunk fn

    idx = jnp.asarray(np.stack(list(ds.epoch_indices(28))))
    key = jax.random.PRNGKey(9)

    t0 = time.perf_counter()
    for i in range(2):
        s, sums, last = tr._chunk_fn(s, idx, jax.random.fold_in(key, i))
        float(last["total"])
    print(f"A chunk_fn + total fetch:     "
          f"{(time.perf_counter()-t0)/40*1000:7.2f} ms/step", flush=True)

    t0 = time.perf_counter()
    for i in range(2):
        s, sums, last = tr._chunk_fn(s, idx, jax.random.fold_in(key, 10+i))
        host = {k: float(v) for k, v in last.items()}
    print(f"B chunk_fn + 12-metric fetch: "
          f"{(time.perf_counter()-t0)/40*1000:7.2f} ms/step", flush=True)

    t0 = time.perf_counter()
    for i in range(2):
        s, sums, last = tr._chunk_fn(s, idx, jax.random.fold_in(key, 20+i))
        host = jax.device_get(last)
    print(f"C chunk_fn + device_get(last):"
          f"{(time.perf_counter()-t0)/40*1000:7.2f} ms/step", flush=True)

    t0 = time.perf_counter()
    h = jax.device_get(sums)
    print(f"D device_get(sums) tree:      "
          f"{(time.perf_counter()-t0)*1000:7.2f} ms once", flush=True)

    t0 = time.perf_counter()
    s = tr._train_loop(s, 1, 3)
    print(f"E full _train_loop 2 epochs:  "
          f"{(time.perf_counter()-t0)/40*1000:7.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
