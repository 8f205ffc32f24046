"""Bidirectional nearest-neighbor distance (the Chamfer kernel).

TPU-native replacement for ref:tf_ops/nn_distance/ (CUDA).  The forward is
one pairwise-distance matmul per direction followed by a row min/argmin —
MXU + VPU work that XLA fuses.  A custom VJP reproduces the reference's
analytic gradient (±2·g·(p−q*) scattered to both clouds,
ref:tf_ops/nn_distance/tf_nndistance_g.cu:132-151) without materializing the
(n, m) cotangent and with deterministic scatter-adds instead of atomics.

For patch sizes used here (≤ 4096 points) the full distance matrix fits
comfortably; a streaming Pallas variant for large clouds lives in
``dispu_tpu.ops.pallas_kernels``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dispu_tpu.ops.geometry import pairwise_sq_dist


def _directed_min(a: jnp.ndarray, b: jnp.ndarray):
    # The matmul-expansion distance matrix picks the argmin on the MXU, then
    # the returned distance is recomputed exactly from the matched pair —
    # the |x|^2-2xy+|y|^2 form has ~1e-6 absolute cancellation error while
    # the CUDA reference's direct (p-q)^2 is exact; this hybrid gets both
    # MXU throughput and exact forward values.
    #
    # On TPU the argmin runs inside the fused kNN kernel (k=1: one
    # threshold-walk round over the VMEM-resident tile; the (n, m) matrix
    # never reaches HBM) — same expansion distances, same first-occurrence
    # tie-break, bit-identical indices to the XLA argmin.
    # same lower bound as knn._use_pallas: below ~64 dataset points the
    # kernel's per-grid-step launch overhead dominates and XLA's fused
    # matmul+argmin wins (tiny-cloud chamfer calls, e.g. tests/metrics)
    if (jax.default_backend() not in ("cpu", "gpu")
            and a.ndim == 3 and 64 <= b.shape[-2] <= 4096):
        from dispu_tpu.ops.pallas_kernels import knn_pallas

        _, idx = knn_pallas(1, jax.lax.stop_gradient(b),
                            jax.lax.stop_gradient(a))
        idx = idx[..., 0]
    else:
        d = pairwise_sq_dist(a, b)
        idx = jnp.argmin(d, axis=-1).astype(jnp.int32)
    nearest = jnp.take_along_axis(b, idx[..., None], axis=-2)
    dist = jnp.sum((a - nearest) ** 2, axis=-1)
    return dist, idx


@jax.custom_vjp
def nn_distance(xyz1: jnp.ndarray, xyz2: jnp.ndarray):
    """For each point, the squared distance to (and index of) its nearest
    neighbor in the other cloud.

    Args:
      xyz1: (b, n, 3).
      xyz2: (b, m, 3).

    Returns:
      (dist1, idx1, dist2, idx2): (b, n), (b, n) int32, (b, m), (b, m) int32
      — squared distances, matching ref:tf_ops/nn_distance/tf_nndistance.py
      semantics (the launcher runs the one-directional kernel twice,
      ref:tf_nndistance_g.cu:128-131).
    """
    dist1, idx1 = _directed_min(xyz1, xyz2)
    dist2, idx2 = _directed_min(xyz2, xyz1)
    return dist1, idx1, dist2, idx2


def _nn_distance_fwd(xyz1, xyz2):
    out = nn_distance(xyz1, xyz2)
    dist1, idx1, dist2, idx2 = out
    return out, (xyz1, xyz2, idx1, idx2)


def _nn_distance_bwd(res, g):
    xyz1, xyz2, idx1, idx2 = res
    g1, _, g2, _ = g
    nearest21 = jnp.take_along_axis(xyz2, idx1[..., None], axis=1)  # (b,n,3)
    nearest12 = jnp.take_along_axis(xyz1, idx2[..., None], axis=1)  # (b,m,3)
    # d/dp |p - q*|^2 = 2 (p - q*); the matched q* receives the negation.
    d1 = 2.0 * g1[..., None] * (xyz1 - nearest21)
    d2 = 2.0 * g2[..., None] * (xyz2 - nearest12)

    def scatter(base_shape_like, idx, updates):
        zeros = jnp.zeros_like(base_shape_like)
        return jax.vmap(lambda z, i, u: z.at[i].add(u))(zeros, idx, updates)

    grad1 = d1 + scatter(xyz1, idx2, -d2)
    grad2 = d2 + scatter(xyz2, idx1, -d1)
    return grad1, grad2


nn_distance.defvjp(_nn_distance_fwd, _nn_distance_bwd)


def chamfer_distance(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    radius=1.0,
) -> jnp.ndarray:
    """Symmetric mean Chamfer distance normalized by patch radius.

    Parity: ref:Common/loss_utils.py:45-64 with default weights — mean over
    points in each direction, sum, divide by radius, mean over batch.
    (The full loss wrapper with thresholds lives in ``dispu_tpu.losses``.)
    """
    dist_f, _, dist_b, _ = nn_distance(gt, pred)
    cd = jnp.mean(dist_f, axis=1) + jnp.mean(dist_b, axis=1)
    return jnp.mean(cd / radius)
