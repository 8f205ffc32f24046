"""Mesh + sharding layer.

The reference trains one process / one GPU / one tf.Session
(ref:dis-pu.py:45, ref:DisPU/model.py:99-103) with zero distributed
machinery.  The TPU-native replacement follows the standard JAX recipe:

  * one ``jax.sharding.Mesh`` over the slice with a ``data`` axis (patch
    training is embarrassingly data-parallel: batch of independent patches),
  * parameters/optimizer state replicated, batches sharded on ``data``,
  * ``jax.jit`` with explicit in/out shardings — XLA inserts the gradient
    ``psum`` (and the cross-device reductions inside BatchNorm and the
    batch-mean losses) over ICI automatically.

A ``model`` axis is carried in the mesh shape for forward-compatibility
(e.g. sharding the non-local attention over points), but the Dis-PU model
is ~1M params — replication is the right layout; tensor-parallel sharding
would only add collective latency.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_devices: int = 0,
    data_axis: str = "data",
    model_axis: str = "model",
    devices=None,
) -> Mesh:
    """1D (data) × 1 (model) mesh over the available devices.

    Within a TPU slice the data axis maps onto ICI neighbors; across hosts
    JAX orders devices so DCN only carries the (small) gradient psum.
    """
    devs = list(devices if devices is not None else jax.devices())
    if num_devices:
        devs = devs[:num_devices]
    arr = np.asarray(devs).reshape(len(devs), 1)
    return Mesh(arr, (data_axis, model_axis))


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P(data_axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated (params, optimizer state, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays, data_axis: str = "data"):
    """Device-put host arrays with the batch axis sharded."""
    sh = batch_sharding(mesh, data_axis)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]
