"""On-device k-nearest-neighbor search.

Replaces two reference components at once:

* the pure-TF ``knn_point`` / ``knn_point_2`` helpers
  (ref:tf_ops/grouping/tf_grouping.py:95-141), and
* the host-side nanoflann KD-tree kNN that the reference calls through
  ``tf.py_func`` in the middle of the GPU graph
  (ref:libs/nearest_neighbors/knn_.cxx, ref:Common/ops.py:110-118,165).

On TPU the O(n·m) distance matrix is a single MXU matmul and ``lax.top_k``
runs on-device, so exact kNN needs no host round-trip and no tree — this
removes the reference's per-step CPU synchronization point entirely.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dispu_tpu.ops.geometry import pairwise_sq_dist


def mask_duplicate_rows(points: jnp.ndarray) -> jnp.ndarray:
    """Flag rows that are exact duplicates of an earlier row.

    Args:
      points: (..., n, c).

    Returns:
      (..., n) bool — True where an identical row exists at a smaller index.

    Parity: ref:tf_ops/grouping/tf_grouping.py:78-91
    (``find_duplicate_columns`` via np.unique keeps the first occurrence and
    flags the rest; used to push duplicates out of the top-k window).

    The (..., n, n, c) broadcast equality is the fastest form at the
    shipping shapes (XLA fuses compare+reduce), but its logical operands
    scale as n²·c — at (32, 4096, 24) the compiler materializes the
    broadcast operands (~24 GB) and rejects the program (measured,
    scripts/profile_r3t.py round 3; every n ≤ 1024 shipping shape
    compiles fused and fast).  Above n = 2048 the equality accumulates
    over the coordinate axis instead: a fori_loop carrying one
    (..., n, n) bool plane, identical result, O(n²) live memory.
    """
    if points.shape[-2] <= 2048:
        return _mask_dup_broadcast(points)
    return _mask_dup_loop(points)


def _mask_dup_broadcast(points: jnp.ndarray) -> jnp.ndarray:
    """Single fused (..., n, n, c) broadcast-equality formulation."""
    n = points.shape[-2]
    earlier = jnp.tril(jnp.ones((n, n), dtype=bool), k=-1)
    eq = jnp.all(
        points[..., :, None, :] == points[..., None, :, :], axis=-1
    )
    return jnp.any(eq & earlier, axis=-1)


def _mask_dup_loop(points: jnp.ndarray) -> jnp.ndarray:
    """fori_loop-over-coordinates formulation: one live (..., n, n) plane.

    Identical result to :func:`_mask_dup_broadcast` (pinned by
    tests/test_ops.py::test_mask_duplicate_rows_loop_branch); selected
    above n = 2048 where the broadcast operands would materialize.
    """
    n = points.shape[-2]
    c = points.shape[-1]
    earlier = jnp.tril(jnp.ones((n, n), dtype=bool), k=-1)

    def body(j, acc):
        col = jax.lax.dynamic_index_in_dim(points, j, axis=-1,
                                           keepdims=False)
        return acc & (col[..., :, None] == col[..., None, :])

    eq = jax.lax.fori_loop(
        0, c, body, jnp.ones((*points.shape[:-1], n), dtype=bool)
    )
    return jnp.any(eq & earlier, axis=-1)


def _use_pallas(impl: str, points: jnp.ndarray, k: int) -> bool:
    if impl == "pallas":
        return True
    if impl == "xla":
        return False
    # auto: the fused kernel needs the (n, c) dataset + a query tile in
    # VMEM; exact bounds checked conservatively.  Below ~64 points the
    # pairwise problem is trivial and the kernel's per-grid-step launch
    # overhead dominates (e.g. the uniform loss runs kNN over thousands of
    # ≤12-point disks) — XLA's fused matmul+top_k wins there.
    return (
        jax.default_backend() not in ("cpu", "gpu")
        and points.ndim == 3
        and 64 <= points.shape[-2] <= 4096
        and points.shape[-1] <= 128
        and k <= 128
    )


def knn(
    k: int,
    points: jnp.ndarray,
    queries: jnp.ndarray,
    impl: str = "auto",
    variant: str = "auto",
):
    """Exact kNN by squared euclidean distance.

    Args:
      k: number of neighbors.
      points: (..., m, c) dataset points.
      queries: (..., n, c) query points.
      impl: 'auto' (fused Pallas kernel on TPU when shapes fit, XLA top_k
        otherwise), 'xla', or 'pallas'.
      variant: Pallas selection variant — 'auto' (exact) or 'packed' (the
        TURBO selection: near-ties whose distances agree in the top
        32−lane_bits bits resolve by index, distances truncated; see
        ``pallas_kernels.knn_pallas``).  Ignored on the XLA path (exact).

    Returns:
      (sq_dists, idx): (..., n, k) float32 squared distances (ascending) and
      (..., n, k) int32 indices into ``points``.

    Parity: ref:tf_ops/grouping/tf_grouping.py:116-141 (``knn_point``) and
    the nanoflann path — both return exact neighbors sorted ascending; ties
    may order differently, which the reference itself does not pin down
    (KD-tree vs top_k tie order already differ in the reference).  The
    Pallas path is bit-identical to the XLA path (tested on-chip).
    """
    if _use_pallas(impl, points, k):
        from dispu_tpu.ops.pallas_kernels import knn_pallas_diff

        zero_bias = jnp.zeros(points.shape[:-1], jnp.float32)
        return knn_pallas_diff(
            k, points, queries, zero_bias, variant=variant
        )
    d = pairwise_sq_dist(queries, points)
    neg, idx = jax.lax.top_k(-d, k)
    return -neg, idx


def knn_indices(
    k: int,
    points: jnp.ndarray,
    queries: jnp.ndarray,
    impl: str = "auto",
    variant: str = "auto",
) -> jnp.ndarray:
    """Neighbor indices only, with input tangents stopped.

    For callers that consume just the selection (grouping, edge convs, SA
    modules): without this, reverse-mode still materializes the *zero*
    cotangent of the discarded distance output and runs the kNN backward
    scatter-add on it — multi-ms per step at model scale.  TF prunes the
    same path (unused ``top_k`` values output); gradients still flow
    through whatever the caller gathers with these indices.
    """
    _, idx = knn(
        k,
        jax.lax.stop_gradient(points),
        jax.lax.stop_gradient(queries),
        impl,
        variant,
    )
    return idx


def knn_unique_indices(
    k: int,
    points: jnp.ndarray,
    queries: jnp.ndarray,
    impl: str = "auto",
    variant: str = "auto",
) -> jnp.ndarray:
    """`knn_unique` indices only, input tangents stopped (see knn_indices)."""
    _, idx = knn_unique(
        k,
        jax.lax.stop_gradient(points),
        jax.lax.stop_gradient(queries),
        impl,
        variant,
    )
    return idx


def knn_unique(
    k: int,
    points: jnp.ndarray,
    queries: jnp.ndarray,
    impl: str = "auto",
    variant: str = "auto",
):
    """kNN where duplicated dataset rows are pushed to the end of the order.

    Biases columns whose point is an exact duplicate of an earlier one
    before taking top-k, so each distinct point is returned at most once
    while output shapes stay static.

    Parity: ref:tf_ops/grouping/tf_grouping.py:88-114
    (``knn_point_2(..., unique=True, sort=True)``).
    """
    dup = mask_duplicate_rows(points)  # (..., m)
    if _use_pallas(impl, points, k):
        from dispu_tpu.ops.pallas_kernels import knn_pallas_diff

        # constant large bias: selection below k never reaches biased
        # columns unless fewer than k distinct points exist
        return knn_pallas_diff(
            k, points, queries, dup.astype(jnp.float32) * 1e30,
            variant=variant,
        )
    d = pairwise_sq_dist(queries, points)
    bias = jnp.max(d, axis=(-1, -2), keepdims=True)
    # NOTE: the reference adds the *global* max over the whole batch tensor
    # (tf.reduce_max with no axis, ref line 91); per-batch max is equivalent
    # for ordering purposes and shards cleanly, so we use it here.
    d = d + bias * dup[..., None, :].astype(d.dtype)
    neg, idx = jax.lax.top_k(-d, k)
    return -neg, idx
