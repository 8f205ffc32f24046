"""HDF5 patch dataset + synthetic fallback.

Parity: ref:DisPU/dataset.py — loads ``poisson_{n}`` keys from
``PUGAN_poisson_256_poisson_1024.h5``; in ``random`` mode the input equals
the dense gt patch (the sparse input is re-sampled per step, on device in
this framework — see ``dispu_tpu.data.augment``); gt is unit-sphere
normalized and the input shares the same normalization; radius is 1.

Differences from the reference (deliberate fixes, documented):
  * the reference's ``next_batch`` pre-increments ``batch_idx`` so batch 0
    is silently skipped and the last partial batch is dropped
    (ref:DisPU/dataset.py:113-119); this loader iterates every full batch.
  * the reference's ``Fetcher`` subclasses threading.Thread but never
    starts it — loading was synchronous.  Here batches are assembled on
    host and shipped once; augmentation runs on device inside the step.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional, Tuple

import numpy as np


def normalize_point_cloud_np(pc: np.ndarray):
    """Numpy twin of ops.normalize_point_cloud (ref:DisPU/dataset.py:26-40)."""
    centroid = np.mean(pc, axis=1, keepdims=True)
    centered = pc - centroid
    furthest = np.amax(
        np.sqrt(np.sum(centered**2, axis=-1, keepdims=True)), axis=1,
        keepdims=True,
    )
    return centered / furthest, centroid, furthest


def load_h5_data(
    h5_filename: str,
    in_num: int,
    out_num: int,
    random: bool = True,
    normalized: bool = True,
):
    """Load (input, gt, radius) arrays.

    Parity: ref:DisPU/dataset.py:52-75 — ``random`` mode reads the dense
    cloud for both input and gt; gt is normalized and the input re-uses
    gt's centroid/scale; radius is all-ones.
    """
    import h5py

    with h5py.File(h5_filename, "r") as f:
        if random:
            inputs = f["poisson_%d" % out_num][:]
            gt = f["poisson_%d" % out_num][:]
        else:
            inputs = f["poisson_%d" % in_num][:]
            gt = f["poisson_%d" % out_num][:]
    assert len(inputs) == len(gt)
    radius = np.ones(len(inputs), np.float32)
    if normalized:
        gt, centroid, furthest = normalize_point_cloud_np(gt)
        inputs = (inputs - centroid) / furthest
    return (
        inputs.astype(np.float32),
        gt.astype(np.float32),
        radius,
    )


def synthetic_patches(
    n_patches: int, n_points: int, seed: int = 0
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Procedural patch set for tests/benchmarks when no h5 is present.

    Patches are sampled from random parametric height fields: a quadric
    base plus a sharp crease (|u| ridge at a random angle) and a mid-
    frequency sinusoidal relief, normalized to the unit sphere like the
    real data.  The crease/relief terms keep the surfaces hard enough that
    a coarse-only generator underfits — leaving residual error for the
    spatial refiner to fix, which is the behavior Dis-PU's disentangled
    design exists to exhibit (ref:DisPU/generator.py:59-88).  This is a
    framework utility, not a reference feature.
    """
    rng = np.random.RandomState(seed)
    gt = np.empty((n_patches, n_points, 3), np.float32)
    for i in range(n_patches):
        uv = rng.rand(n_points, 2) * 2.0 - 1.0
        a, b, c = rng.randn(3) * 0.5
        z = a * uv[:, 0] ** 2 + b * uv[:, 1] ** 2 + c * uv[:, 0] * uv[:, 1]
        # sharp crease along a random direction
        theta = rng.rand() * np.pi
        t = uv[:, 0] * np.cos(theta) + uv[:, 1] * np.sin(theta)
        z += rng.uniform(0.2, 0.6) * np.abs(t)
        # mid-frequency relief
        fu, fv = rng.uniform(2.0, 4.0, size=2)
        phase = rng.rand(2) * 2 * np.pi
        z += rng.uniform(0.05, 0.15) * np.sin(
            fu * np.pi * uv[:, 0] + phase[0]
        ) * np.sin(fv * np.pi * uv[:, 1] + phase[1])
        pts = np.stack([uv[:, 0], uv[:, 1], z], axis=-1)
        gt[i] = pts
    gt, _, _ = normalize_point_cloud_np(gt)
    radius = np.ones(n_patches, np.float32)
    return gt.copy(), gt, radius


class PatchDataset:
    """In-memory patch dataset with shuffled full-batch iteration."""

    def __init__(
        self,
        data_dir: str = "data",
        num_point: int = 256,
        up_ratio: int = 4,
        random_input: bool = True,
        h5_path: Optional[str] = None,
        synthetic_patches_count: int = 0,
        seed: int = 0,
    ):
        self.num_point = num_point
        self.up_ratio = up_ratio
        self.random_input = random_input
        out_num = num_point * up_ratio
        path = h5_path or os.path.join(
            data_dir, "PUGAN_poisson_%d_poisson_%d.h5" % (num_point, out_num)
        )
        if os.path.exists(path):
            self.inputs, self.gt, self.radius = load_h5_data(
                path, num_point, out_num, random=random_input
            )
        elif synthetic_patches_count:
            self.inputs, self.gt, self.radius = synthetic_patches(
                synthetic_patches_count, out_num, seed=seed
            )
        else:
            raise FileNotFoundError(
                f"no dataset at {path}; pass synthetic_patches_count for a "
                "procedural fallback"
            )
        self._rng = np.random.RandomState(seed)

    def __len__(self) -> int:
        return len(self.gt)

    def num_batches(self, batch_size: int) -> int:
        return len(self.gt) // batch_size

    def epoch_indices(
        self, batch_size: int, shuffle: bool = True
    ) -> Iterator[np.ndarray]:
        """Yield per-batch index arrays (for device-resident data: the host
        ships ~batch_size ints per step instead of the point tensors)."""
        order = np.arange(len(self.gt))
        if shuffle:
            self._rng.shuffle(order)
        for b in range(self.num_batches(batch_size)):
            yield order[b * batch_size : (b + 1) * batch_size]

    def epoch(
        self, batch_size: int, shuffle: bool = True
    ) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        """Yield (gt_dense, input_raw, radius) full batches.

        In ``random_input`` mode the caller derives the sparse input from
        ``gt_dense`` on device (nonuniform re-sampling per step); the
        ``input_raw`` here is the h5 input column for non-random mode.
        """
        order = np.arange(len(self.gt))
        if shuffle:
            self._rng.shuffle(order)
        for b in range(self.num_batches(batch_size)):
            sl = order[b * batch_size : (b + 1) * batch_size]
            yield self.gt[sl], self.inputs[sl], self.radius[sl]
