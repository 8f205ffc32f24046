"""Approximate Earth Mover's Distance (auction/Sinkhorn-style matching).

TPU-native replacement for ref:tf_ops/approxmatch/ (CUDA).  The reference
kernel (ref:tf_approxmatch_g.cu:1-182) runs 10 temperature rounds
(j = 7 .. -2, level = -4^j, final round level = 0), alternating row/column
normalization of a soft assignment against remaining row/column capacity.
Every step is a dense (n, m) kernel-matrix contraction — ideal MXU work —
so the TPU version is plain batched matmuls inside an unrolled 10-round
loop; no shared-memory tiling is needed because XLA tiles the matmuls.

Numerics follow the CUDA op: float32, ``exp`` underflow to 0 at the coldest
temperatures, the same 1e-9 guards, and capacity clamping in the same
order.

Verified against the reference's OWN C++ CPU kernels (compiled from
ref:tf_ops/approxmatch/tf_approxmatch.cpp and loaded as a real TF op by
scripts/tf_parity.py): match cost rel ≤ 1.6e-5, transport-plan quality
rel ≤ 2e-6, cost gradients rel ≤ 3e-5, square and non-square.  Two
latent reference CPU-kernel defects surfaced in the process (neither
affects its CUDA training path): ApproxMatch fills its (b, m, n)-declared
output in (n, m) row-major order (its own MatchCost consumes the same
layout, masking the bug for square clouds), and MatchCostGrad only
zero-initializes grad1's x components, returning uninitialized memory in
y/z.  This implementation uses the properly-labeled layout and a correct
analytic gradient throughout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dispu_tpu.ops.geometry import pairwise_sq_dist

_LEVELS = tuple(float(-(4.0**j)) for j in range(7, -2, -1)) + (0.0,)


def approx_match(xyz1: jnp.ndarray, xyz2: jnp.ndarray) -> jnp.ndarray:
    """Soft bipartite match matrix between two clouds.

    Args:
      xyz1: (b, n, 3).
      xyz2: (b, m, 3).

    Returns:
      match: (b, m, n) — entry [l, k] is the mass moved between xyz2[l] and
      xyz1[k]; rows/cols approximately satisfy the capacity constraints
      (multiplicities ``max(1, m//n)`` / ``max(1, n//m)``,
      ref:tf_approxmatch_g.cu:4-10, integer division as in C).

    The match itself carries no gradient (ref:tf_approxmatch.py:41-43);
    callers should treat it as constant, which ``earth_mover_cost`` does via
    ``stop_gradient``.
    """
    xyz1 = jnp.asarray(xyz1, jnp.float32)
    xyz2 = jnp.asarray(xyz2, jnp.float32)
    b, n, _ = xyz1.shape
    m = xyz2.shape[1]
    mult_l = 1.0 if n >= m else float(m // n)
    mult_r = float(n // m) if n >= m else 1.0

    d = pairwise_sq_dist(xyz1, xyz2)  # (b, n, m)

    remain_l = jnp.full((b, n), mult_l, jnp.float32)
    remain_r = jnp.full((b, m), mult_r, jnp.float32)
    match = jnp.zeros((b, m, n), jnp.float32)

    for level in _LEVELS:
        kern = jnp.exp(level * d)  # (b, n, m); underflows to 0 when cold
        # (a) row normalization against remaining right capacity.
        suml = 1e-9 + jnp.einsum("bnm,bm->bn", kern, remain_r)
        ratio_l = remain_l / suml
        # (b) column consumption, clamped to remaining capacity.
        sumr = jnp.einsum("bnm,bn->bm", kern, ratio_l) * remain_r
        consumption = jnp.minimum(remain_r / (sumr + 1e-9), 1.0)
        ratio_r = consumption * remain_r
        remain_r = jnp.maximum(0.0, remain_r - sumr)
        # (c) commit mass, deplete left capacity.
        w = kern * ratio_l[:, :, None] * ratio_r[:, None, :]  # (b, n, m)
        match = match + jnp.swapaxes(w, 1, 2)
        remain_l = jnp.maximum(0.0, remain_l - jnp.sum(w, axis=2))

    return jax.lax.stop_gradient(match)


def match_cost(
    xyz1: jnp.ndarray, xyz2: jnp.ndarray, match: jnp.ndarray
) -> jnp.ndarray:
    """Transport cost of a match: sum of euclidean distance × moved mass.

    Args:
      xyz1: (b, n, 3); xyz2: (b, m, 3); match: (b, m, n).

    Returns:
      (b,) cost per cloud.

    Parity: ref:tf_approxmatch_g.cu:183-228.  Gradients w.r.t. both clouds
    flow through the distances with the match held fixed
    (ref:tf_approxmatch.py:45-51); the sqrt is guarded at 1e-20 so the
    gradient stays finite at coincident points, matching the CUDA grad
    kernel's behavior of emitting 0 there.
    """
    d = pairwise_sq_dist(xyz1, xyz2)  # (b, n, m)
    dist = jnp.sqrt(jnp.maximum(d, 1e-20))
    return jnp.einsum("bnm,bmn->b", dist, jax.lax.stop_gradient(match))


def earth_mover_cost(
    pcd1: jnp.ndarray, pcd2: jnp.ndarray, radius=1.0
) -> jnp.ndarray:
    """Mean per-point approximate EMD, radius-normalized.

    Parity: ref:Common/loss_utils.py:170-176.
    """
    assert pcd1.shape[1] == pcd2.shape[1], "EMD expects equal point counts"
    num_points = float(pcd1.shape[1])
    match = approx_match(pcd1, pcd2)
    cost = match_cost(pcd1, pcd2, match) / radius
    return jnp.mean(cost / num_points)
