"""dispu_tpu — a TPU-native (JAX/XLA/Pallas) point-cloud upsampling framework.

A ground-up rebuild of the capabilities of liruihui/Dis-PU ("Point Cloud
Upsampling via Disentangled Refinement", CVPR 2021) designed for TPU:

- ``dispu_tpu.ops``      — fixed-shape, jit-friendly point-cloud kernels
  (FPS, kNN, ball query, grouping, Chamfer/nn-distance, approximate EMD,
  3-NN interpolation), each with a pure-XLA implementation and, for the hot
  ones, a Pallas TPU kernel.
- ``dispu_tpu.nn``       — neural building blocks (point MLPs, EdgeConv
  dense blocks, non-local / local attention cells) as flax.linen modules.
- ``dispu_tpu.models``   — the Dis-PU generator (dense generator + spatial
  refiner) and the PointNet++-MSG patch discriminator.
- ``dispu_tpu.losses``   — Chamfer / Hausdorff / repulsion / uniformity /
  EMD / LSGAN losses.
- ``dispu_tpu.train``    — jit/pjit train steps, optimizer + schedules,
  checkpointing, the training loop (CD and GAN variants).
- ``dispu_tpu.parallel`` — device-mesh construction and sharding rules
  (data-parallel over a TPU slice; XLA collectives over ICI).
- ``dispu_tpu.data``     — HDF5 patch dataset + device-side augmentation.
- ``dispu_tpu.inference``— whole-cloud patch-based upsampling pipeline.
- ``dispu_tpu.evaluation`` — CD/HD/P2F/uniformity metrics + CSV report.

Reference parity notes cite ``/root/reference`` as ``ref:<path>:<line>``.
"""

__version__ = "0.1.0"
