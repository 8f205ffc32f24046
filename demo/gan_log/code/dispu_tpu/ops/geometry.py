"""Basic point-cloud geometry helpers.

TPU notes: pairwise distances are expressed through a single batched matmul
(``x @ y^T``) so the FLOPs land on the MXU; the rank-1 norm terms fuse into
the surrounding elementwise ops.
"""

from __future__ import annotations

import math

import jax

import jax.numpy as jnp


def pairwise_sq_dist(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Squared euclidean distance matrix between two point sets.

    Args:
      x: (..., n, c) query points.
      y: (..., m, c) dataset points.

    Returns:
      (..., n, m) squared distances.

    Parity: ref:tf_ops/grouping/tf_grouping.py:61-66
    (``batch_distance_matrix_general``): ``|x|^2 - 2 x.y + |y|^2``.
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)  # (..., n, 1)
    y2 = jnp.sum(y * y, axis=-1, keepdims=True)  # (..., m, 1)
    # HIGHEST precision: distances feed argmin/top_k, so bf16 matmul passes
    # would perturb neighbor selection. The contraction dim is tiny (3..48),
    # so full-precision MXU passes cost nothing at these shapes.
    xy = jnp.matmul(
        x,
        jnp.swapaxes(y, -1, -2),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # (..., n, m) on the MXU
    # Clamp at 0: the expansion can go slightly negative for near-identical
    # points by float cancellation; true squared distances are non-negative
    # (the CUDA reference computes (p-q)^2 directly and never sees this).
    return jnp.maximum(x2 - 2.0 * xy + jnp.swapaxes(y2, -1, -2), 0.0)


def normalize_point_cloud(pc: jnp.ndarray):
    """Center to the centroid and scale by the furthest point distance.

    Args:
      pc: (b, n, 3) or (n, 3) point cloud.

    Returns:
      (normalized, centroid, furthest_distance) with broadcastable shapes.

    Parity: ref:Common/ops.py:1954-1963 / ref:DisPU/dataset.py:26-40.
    """
    squeeze = pc.ndim == 2
    if squeeze:
        pc = pc[None]
    centroid = jnp.mean(pc, axis=1, keepdims=True)
    centered = pc - centroid
    furthest = jnp.max(
        jnp.sqrt(jnp.sum(centered**2, axis=-1, keepdims=True)),
        axis=1,
        keepdims=True,
    )
    # guard degenerate clouds (all points identical → furthest = 0); the
    # reference divides unguarded (ref:Common/ops.py:1962) and NaNs there
    out = centered / jnp.maximum(furthest, 1e-12)
    if squeeze:
        return out[0], centroid[0], furthest[0]
    return out, centroid, furthest


def _grid_hw(up_ratio: int) -> tuple[int, int]:
    """Factor ``up_ratio`` into the most-square (num_x, num_y) grid.

    Parity: ref:Common/ops.py:60-70 picks the largest divisor
    ``i <= floor(sqrt(r)) + 1`` as num_x.
    """
    sqrted = int(math.sqrt(up_ratio)) + 1
    for i in reversed(range(1, sqrted + 1)):
        if up_ratio % i == 0:
            return i, up_ratio // i
    return 1, up_ratio


def gen_grid(up_ratio: int) -> jnp.ndarray:
    """2D code grid attached to duplicated features during upsampling.

    Returns (up_ratio, 2) float32 points in [-0.2, 0.2]^2.

    Parity: ref:Common/ops.py:60-76 — ``meshgrid(linspace(-.2,.2,nx),
    linspace(-.2,.2,ny))`` stacked and flattened.  Note tf.meshgrid defaults
    to 'xy' indexing, matching jnp.meshgrid's default.
    """
    num_x, num_y = _grid_hw(up_ratio)
    grid_x = jnp.linspace(-0.2, 0.2, num_x)
    grid_y = jnp.linspace(-0.2, 0.2, num_y)
    x, y = jnp.meshgrid(grid_x, grid_y)
    return jnp.reshape(jnp.stack([x, y], axis=-1), (-1, 2)).astype(jnp.float32)


def gen_2d_grid(num_grid_point: int) -> jnp.ndarray:
    """(num²,2) square grid in [-0.2, 0.2]² (ref:Common/ops.py:93-100)."""
    x = jnp.linspace(-0.2, 0.2, num_grid_point)
    gx, gy = jnp.meshgrid(x, x)
    return jnp.reshape(jnp.stack([gx, gy], axis=-1), (-1, 2)).astype(
        jnp.float32
    )


def gen_1d_grid(num_grid_point: int) -> jnp.ndarray:
    """(1, num) line code in [-0.02, 0.02] (ref:Common/ops.py:102-108)."""
    return jnp.linspace(-0.02, 0.02, num_grid_point, dtype=jnp.float32)[
        None, :
    ]


def covariance_matrix(pc: jnp.ndarray):
    """Per-neighborhood barycenter + 3×3 covariance.

    Parity: ref:Common/model_utils.py:17-29 — pc (b, p, k, 3) →
    barycenter (b, p, 1, 3), covariance = centeredᵀ·centered (b, p, 3, 3).
    """
    barycenter = jnp.mean(pc, axis=2, keepdims=True)
    centered = pc - barycenter
    cov = jnp.einsum("bpki,bpkj->bpij", centered, centered)
    return barycenter, cov


def exponential_distance(query: jnp.ndarray, points: jnp.ndarray):
    """Squared distances + a self-calibrated RBF affinity.

    Parity: ref:Common/model_utils.py:31-45 — query/points (b, p, k, 3)
    broadcastable; h = mean over p of the per-row min distance; returns
    (distance, exp(−d / (h/2))), both (b, p, k, 1).
    """
    distance = jnp.sum((query - points) ** 2, axis=-1, keepdims=True)
    h = jnp.mean(
        jnp.min(distance, axis=2, keepdims=True), axis=1, keepdims=True
    )
    return distance, jnp.exp(-distance / (h / 2.0))
