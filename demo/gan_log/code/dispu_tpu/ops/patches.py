"""Patch extraction from whole clouds (train- and test-time).

Parity: ref:Common/model_utils.py:46-103 (``extract_patches``) — the
GPU-side patcher used by PU-GAN-lineage training loops: pick seed points
(FPS, or one random seed), take the k nearest points around each seed,
and fold the patch axis into the batch axis.  The reference's test branch
additionally drops outlier points whose nearest-neighbor distance exceeds
5× the cloud mean before seeding.

TPU design: the train path is one jittable function (static ``patch_num``
and ``k``; seeds + kNN + gather are all on-device).  The test path's
outlier filter produces a data-dependent point count, which cannot live
under jit with static shapes — it runs on host (numpy) like the
reference's session-feed preprocessing effectively did, then the gather
still happens with fixed shapes.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dispu_tpu.ops.knn import knn
from dispu_tpu.ops.sampling import farthest_point_sample, gather_point


def extract_patches_train(
    batch_xyz: jnp.ndarray,
    k: int,
    patch_num: int = 1,
    batch_features: Optional[jnp.ndarray] = None,
    gt_xyz: Optional[jnp.ndarray] = None,
    gt_k: Optional[int] = None,
    key: Optional[jax.Array] = None,
):
    """Seed + kNN patch extraction, patches folded into the batch axis.

    Parity: ref:Common/model_utils.py:46-66,88-103 (is_training branch):
    ``patch_num > 1`` seeds by FPS; ``patch_num == 1`` picks one uniform
    random seed per cloud (requires ``key``).  Returns
    (patches (b·patch_num, k, 3), feature patches or None, gt patches or
    None); the fold order is patch-major within each cloud, matching the
    reference's ``tf.concat(tf.unstack(x, axis=1), axis=0)``.
    """
    b, n, _ = batch_xyz.shape
    if patch_num > 1:
        seeds = gather_point(
            batch_xyz, farthest_point_sample(patch_num, batch_xyz)
        )
    else:
        if key is None:
            raise ValueError("patch_num == 1 requires a PRNG key")
        idx = jax.random.randint(key, (b, 1), 0, n)
        seeds = gather_point(batch_xyz, idx)

    _, patch_idx = knn(k, batch_xyz, seeds)  # (b, patch_num, k)
    patches = jax.vmap(lambda p, i: p[i])(batch_xyz, patch_idx)

    def fold(x):
        # (b, patch_num, k, c) → (patch_num·b? no: reference unstacks the
        # patch axis and concats onto batch: [p0 of all b, p1 of all b, …])
        return jnp.concatenate(
            [x[:, j] for j in range(x.shape[1])], axis=0
        )

    out_feats = None
    if batch_features is not None:
        out_feats = fold(
            jax.vmap(lambda f, i: f[i])(batch_features, patch_idx)
        )
    out_gt = None
    if gt_xyz is not None and gt_k is not None:
        _, gt_idx = knn(gt_k, gt_xyz, seeds)
        out_gt = fold(jax.vmap(lambda g, i: g[i])(gt_xyz, gt_idx))
    return fold(patches), out_feats, out_gt


def extract_patches_test(
    xyz: np.ndarray, k: int, seed_factor: int = 5
) -> Tuple[np.ndarray, np.ndarray]:
    """Outlier-filtered FPS-seeded patch extraction for inference.

    Parity: ref:Common/model_utils.py:67-92 (else branch): drop points
    whose non-self NN distance is ≥ 5× the cloud mean, seed
    ``patch_num = n/k·seed_factor`` FPS points on the filtered cloud,
    gather the k nearest per seed.  Host/numpy because the filtered count
    is data-dependent.  Returns (patches (patch_num, k', 3), seeds), with
    k' = min(k, filtered_count).
    """
    xyz = np.asarray(xyz, np.float32)
    n = xyz.shape[0]
    d2, _ = knn(2, jnp.asarray(xyz)[None], jnp.asarray(xyz)[None])
    closest = np.asarray(d2)[0, :, 1]
    mask = closest < 5.0 * closest.mean()
    filtered = xyz[mask]
    patch_num = int(n / k * seed_factor)
    seed_idx = np.asarray(
        farthest_point_sample(patch_num, jnp.asarray(filtered)[None])
    )[0]
    seeds = filtered[seed_idx]
    k_eff = min(k, filtered.shape[0])
    _, idx = knn(k_eff, jnp.asarray(filtered)[None], jnp.asarray(seeds)[None])
    return filtered[np.asarray(idx)[0]], seeds
