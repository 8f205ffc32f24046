"""Data pipeline: HDF5 patch dataset + device-side augmentation."""

from dispu_tpu.data.augment import augment_batch, sample_nonuniform_inputs
from dispu_tpu.data.dataset import PatchDataset, load_h5_data, synthetic_patches

__all__ = [
    "augment_batch",
    "sample_nonuniform_inputs",
    "PatchDataset",
    "load_h5_data",
    "synthetic_patches",
]
