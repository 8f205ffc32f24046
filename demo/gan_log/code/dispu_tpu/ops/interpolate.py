"""3-NN inverse-distance feature interpolation (PointNet++ FP).

TPU-native replacement for ref:tf_ops/interpolation/tf_interpolate.cpp —
which was CPU-only in the reference (no .cu file,
ref:tf_ops/compile_ops.sh:8).  Here it is ~10 lines of fused XLA: one
pairwise-distance matmul, a top-3, and a weighted gather.  Gradients come
from autodiff (the reference hand-wrote them, ref:tf_interpolate.cpp:230-262).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dispu_tpu.ops.geometry import pairwise_sq_dist


def three_nn(xyz1: jnp.ndarray, xyz2: jnp.ndarray):
    """Three nearest neighbors of each query in a dataset cloud.

    Args:
      xyz1: (b, n, 3) query points.
      xyz2: (b, m, 3) dataset points.

    Returns:
      (dist, idx): (b, n, 3) squared distances (ascending) and int32 indices.

    Parity: ref:tf_ops/interpolation/tf_interpolate.cpp:60-103 (squared
    distances, sorted ascending).
    """
    m = xyz2.shape[-2]
    d = pairwise_sq_dist(xyz1, xyz2)
    k = min(3, m)
    neg, idx = jax.lax.top_k(-d, k)
    if k < 3:
        # fewer than 3 source points: repeat the nearest (the reference's
        # CPU scan degenerates similarly; inverse-distance weights then
        # split the mass across the duplicates)
        reps = 3 - k
        neg = jnp.concatenate([neg, jnp.repeat(neg[..., :1], reps, -1)], -1)
        idx = jnp.concatenate([idx, jnp.repeat(idx[..., :1], reps, -1)], -1)
    return -neg, idx.astype(jnp.int32)


def three_interpolate(
    points: jnp.ndarray, idx: jnp.ndarray, weight: jnp.ndarray
) -> jnp.ndarray:
    """Weighted 3-point feature gather.

    Args:
      points: (b, m, c) source features.
      idx: (b, n, 3) int32 indices into the m axis.
      weight: (b, n, 3) interpolation weights.

    Returns:
      (b, n, c) interpolated features.

    Parity: ref:tf_ops/interpolation/tf_interpolate.cpp:107-130.
    """
    gathered = jax.vmap(lambda p, i: p[i])(points, idx)  # (b, n, 3, c)
    return jnp.sum(gathered * weight[..., None], axis=2)


def inverse_distance_weights(dist: jnp.ndarray, eps: float = 1e-10):
    """Normalized 1/d weights as used by the FP module.

    Parity: ref:Common/pointnet_util.py:204-208.
    """
    dist = jnp.maximum(dist, eps)
    inv = 1.0 / dist
    return inv / jnp.sum(inv, axis=-1, keepdims=True)
