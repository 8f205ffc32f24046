"""Loss library: Chamfer / Hausdorff / EMD / repulsion / uniformity / LSGAN.

Parity: ref:Common/loss_utils.py.  All losses are pure jittable functions of
(pred, gt, ...) with static shapes; radius normalization follows the
reference (the dataset supplies radius = 1 after unit-sphere normalization,
ref:DisPU/dataset.py:68).
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from dispu_tpu.ops.chamfer import nn_distance
from dispu_tpu.ops.emd import earth_mover_cost
from dispu_tpu.ops.grouping import group_point, query_ball_point
from dispu_tpu.ops.knn import knn, knn_indices
from dispu_tpu.ops.sampling import farthest_point_sample, gather_point

earth_mover = earth_mover_cost  # ref:Common/loss_utils.py:170-176


def chamfer(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    radius=1.0,
    forward_weight: float = 1.0,
    threshold: float | None = None,
) -> jnp.ndarray:
    """Mean symmetric Chamfer loss with optional outlier suppression.

    Parity: ref:Common/loss_utils.py:45-64 — forward = per-gt-point nearest
    squared distance into pred; distances above ``mean·threshold`` zeroed
    when a threshold is given; per-direction means summed, radius-normalized,
    batch-averaged.
    """
    dists_forward, _, dists_backward, _ = nn_distance(gt, pred)
    if threshold is not None:
        fwd_thresh = jnp.mean(dists_forward, axis=1, keepdims=True) * threshold
        bwd_thresh = jnp.mean(dists_backward, axis=1, keepdims=True) * threshold
        dists_forward = jnp.where(
            dists_forward < fwd_thresh, dists_forward, 0.0
        )
        dists_backward = jnp.where(
            dists_backward < bwd_thresh, dists_backward, 0.0
        )
    cd = forward_weight * jnp.mean(dists_forward, axis=1) + jnp.mean(
        dists_backward, axis=1
    )
    return jnp.mean(cd / radius)


def hausdorff(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    radius=1.0,
    forward_weight: float = 1.0,
    threshold: float | None = None,
) -> jnp.ndarray:
    """Hausdorff-style max-NN loss.

    Parity: ref:Common/loss_utils.py:67-84 — per-direction max, summed,
    radius-normalized, then **max over the batch** (not mean).
    """
    dists_forward, _, dists_backward, _ = nn_distance(gt, pred)
    if threshold is not None:
        dists_forward = jnp.where(dists_forward < threshold, dists_forward, 0.0)
        dists_backward = jnp.where(dists_backward < threshold, dists_backward, 0.0)
    hd = forward_weight * jnp.max(dists_forward, axis=1) + jnp.max(
        dists_backward, axis=1
    )
    return jnp.max(hd / radius)


def repulsion(
    pred: jnp.ndarray,
    nsample: int = 20,
    radius: float = 0.07,
    use_knn: bool = False,
    use_l1: bool = False,
    h: float = 0.001,
) -> jnp.ndarray:
    """Push points apart when closer than ``sqrt(h)``.

    Parity: ref:Common/loss_utils.py:271-298 — ball-query ``nsample``
    neighbors (padding repeats the first hit, exactly as the CUDA op), take
    the 5 nearest, drop the self column, penalize ``max(0, h − d²)``.  With
    ``use_l1`` the neighbor distances are L1 (``Σ|Δ|``) and the bandwidth
    becomes ``h = 2·√h`` (ref:Common/loss_utils.py:283-293).

    TPU note: the L2 ball path selects the 5 nearest hits *inside* the
    ball kernel (``select_smallest=5`` — the kernel ranks its own
    selection-grade distances, replacing an XLA sort) and only then
    gathers those 5 winners' coordinates for the exact, differentiable
    re-evaluation — the TPU gather costs ~8 ns per indexed row regardless
    of width, so gathering 5 rows instead of ``nsample`` is a 4× cut on
    the loss's dominant op.  The re-evaluated values are exact ``|p−q|²``
    as in the reference; only sub-round-off near-ties at the 5th-place
    boundary can pick a different (equidistant) neighbor than ranking by
    exact values would — the same selection-vs-value split the chamfer
    argmin uses (tie behavior pinned by
    tests/test_losses.py::test_repulsion_tie_boundary).  The L1 path
    cannot reuse the kernel's L2 ranking, so it gathers all ``nsample``
    neighbors and ranks by exact L1 distance like the reference.
    """
    if use_knn:
        idx = knn_indices(nsample, pred, pred)
        grouped = group_point(pred, idx) - pred[:, :, None, :]
        dists = (
            jnp.sum(jnp.abs(grouped), axis=-1)
            if use_l1
            else jnp.sum(grouped**2, axis=-1)
        )
        neg_top, _ = jax.lax.top_k(-dists, 5)
        val = neg_top[:, :, 1:]  # drop the nearest (self)
    elif use_l1:
        idx, _ = query_ball_point(radius, nsample, pred, pred)
        grouped = group_point(pred, idx) - pred[:, :, None, :]
        dists = jnp.sum(jnp.abs(grouped), axis=-1)
        neg_top, _ = jax.lax.top_k(-dists, 5)
        val = neg_top[:, :, 1:]
    else:
        _, _, idx5 = query_ball_point(
            radius, nsample, pred, pred, select_smallest=5
        )
        grouped = group_point(pred, idx5) - pred[:, :, None, :]
        dists5 = jnp.sum(grouped**2, axis=-1)          # exact, differentiable
        val = -dists5[:, :, 1:]  # drop the nearest (self)
    if use_l1:
        h = math.sqrt(h) * 2  # ref:Common/loss_utils.py:292
    val = jnp.maximum(0.0, h + val)  # h - d (sq or L1), clipped
    return jnp.mean(val)


def uniform(
    pcd: jnp.ndarray,
    percentages: Sequence[float] = (0.004, 0.006, 0.008, 0.010, 0.012),
    radius: float = 1.0,
) -> jnp.ndarray:
    """NN-spacing uniformity statistic inside euclidean disks.

    Parity: ref:Common/loss_utils.py:238-267 (the 'simplified, faster'
    version the reference actually wires up): FPS 5% seeds, ball-query a
    disk of area-fraction p, compare each in-disk point's NN spacing to the
    ideal square-packing spacing, χ²-style normalize, scale by (100p)².
    """
    _, n, _ = pcd.shape
    npoint = int(n * 0.05)
    seeds = gather_point(pcd, farthest_point_sample(npoint, pcd))
    loss = []
    for p in percentages:
        # guard: the reference assumes n·p >= 4 (n=1024 in training); the
        # clamp keeps tiny clouds from dividing by zero / top_k(2)-of-1
        nsample = max(int(n * p), 2)
        r = math.sqrt(p * radius)
        disk_area = math.pi * (radius**2) * p / nsample
        expect_len = math.sqrt(disk_area)
        idx, _ = query_ball_point(r, nsample, pcd, seeds)
        disks = group_point(pcd, idx)  # (b, npoint, nsample, 3)
        b = disks.shape[0]
        flat = disks.reshape(b * npoint, nsample, 3)
        # selection/value split (policy shared with chamfer/repulsion):
        # the kNN ranks by expansion-form distances, the VALUE is the
        # exact |p−q|² of the matched neighbor — the reference's knn_point
        # computes direct-form distances (ref:tf_grouping.py:117-141) and
        # the expansion form's ~1e-6 cancellation error is magnified by
        # the sqrt of tiny spacings (rel ~3e-4 in the loss, measured by
        # scripts/tf_parity.py before this re-evaluation)
        _, nn_idx = knn(2, flat, flat)
        nbr = jnp.take_along_axis(flat, nn_idx[:, :, 1][..., None], axis=1)
        d_exact = jnp.sum((flat - nbr) ** 2, axis=-1)  # (b·np, ns)
        spacing = jnp.sqrt(jnp.abs(d_exact + 1e-8))
        dev = (spacing - expect_len) ** 2 / (expect_len + 1e-8)
        mean = jnp.mean(dev) * (p * 100) ** 2
        loss.append(mean)
    return sum(loss) / len(percentages)


def uniform_exact(
    pcd,
    percentages: Sequence[float] = (0.002, 0.004, 0.006, 0.008, 0.010, 0.012, 0.015),
    radius: float = 1.0,
    cap_counts: bool = False,
):
    """Exact disk-uniformity statistic (host/numpy; the 'whole, slower'
    variant).

    Parity: ref:Common/loss_utils.py:178-231 (``py_uniform_loss`` +
    ``get_uniform_loss2``): per disk, coverage = (count − nsample)²/nsample;
    below 5 members only coverage counts; otherwise multiply by the
    χ²-normalized NN-spacing deviation from the hexagon ideal.  A metric,
    not a training loss (no gradient).

    By default disk membership is counted *exactly* — every point strictly
    inside the radius — so overdense disks (count > nsample) are penalized.
    The reference's py variant inherits a silent count cap at ``nsample``
    from the CUDA ball query it feeds on (ref:tf_ops/grouping/
    tf_grouping_g.cu:16-17 breaks at ``cnt == nsample``), so its coverage
    term can never see density above nsample; pass ``cap_counts=True`` to
    reproduce that op-faithful behavior.
    """
    import numpy as np

    pcd = np.asarray(pcd)
    b, n, _ = pcd.shape
    npoint = int(n * 0.05)
    seeds_idx = np.asarray(farthest_point_sample(npoint, jnp.asarray(pcd)))
    total = []
    for p in percentages:
        nsample = max(int(n * p), 1)
        r = math.sqrt(p * radius)
        vals = []
        for i in range(b):
            pts = pcd[i]
            seeds = pts[seeds_idx[i]]
            # exact membership: strict d < r with the CUDA op's 1e-20 floor
            d = np.sqrt(
                np.maximum(
                    np.sum((seeds[:, None] - pts[None]) ** 2, -1), 1e-40
                )
            )
            inside = d < r  # (npoint, n)
            for j in range(npoint):
                members = np.nonzero(inside[j])[0]
                number = len(members)
                if cap_counts and number > nsample:
                    members = members[:nsample]
                    number = nsample
                coverage = (number - nsample) ** 2 / nsample
                if number < 5:
                    vals.append(coverage)
                    continue
                disk = pts[members]
                dd = np.sum((disk[:, None] - disk[None]) ** 2, -1)
                np.fill_diagonal(dd, np.inf)
                shortest = np.sqrt(dd.min(axis=1))
                disk_area = math.pi * (r**2) / disk.shape[0]
                expect_d = math.sqrt(2 * disk_area / 1.732)  # hexagon
                dis = (shortest - expect_d) ** 2 / expect_d
                vals.append(coverage * float(np.mean(dis)))
        total.append(float(np.mean(vals)) * math.sqrt(p * 100))
    return sum(total) / len(percentages)


def geometric_losses(pred: jnp.ndarray, gt: jnp.ndarray, nnk: int = 8):
    """Shape / density / direction triplet.

    Parity: ref:Common/loss_utils.py:86-130 (``get_Geometric_Loss`` —
    unused by the default model, kept for capability parity): shape =
    symmetric mean min euclidean distance; density = mean |kNN-distance
    spectrum difference|; direction = normalized kNN-spectrum correlation.
    """
    from dispu_tpu.ops.geometry import pairwise_sq_dist

    d = jnp.sqrt(jnp.maximum(pairwise_sq_dist(gt, pred), 1e-12))
    shape = jnp.mean(jnp.min(d, axis=2)) + jnp.mean(jnp.min(d, axis=1))

    d2 = jnp.sqrt(jnp.maximum(pairwise_sq_dist(gt, gt), 1e-12))
    k1, _ = jax.lax.top_k(-d, nnk)
    k2, _ = jax.lax.top_k(-d2, nnk)
    density = jnp.mean(jnp.abs(k1 - k2))

    gt_off = k2 / (jnp.sum(k2**2, keepdims=True) + 1e-8)
    pt_off = k1 / (jnp.sum(k1**2, keepdims=True) + 1e-8)
    direction = jnp.sum(gt_off * pt_off)
    return shape, density, direction


def l1_loss(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Parity: ref:Common/loss_utils.py:333-336."""
    return jnp.mean(jnp.abs(x - y))


def classify_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Sparse softmax cross entropy (ref:Common/loss_utils.py:40-43)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return -jnp.mean(picked)


# ---------------------------------------------------------------- GAN (LSGAN)


def discriminator_loss(d_real: jnp.ndarray, d_fake: jnp.ndarray) -> jnp.ndarray:
    """Parity: ref:Common/loss_utils.py:304-310."""
    real_loss = jnp.mean((d_real - 1.0) ** 2)
    fake_loss = jnp.mean(d_fake**2)
    return 0.5 * (real_loss + fake_loss)


def generator_loss(d_fake: jnp.ndarray) -> jnp.ndarray:
    """Parity: ref:Common/loss_utils.py:312-314."""
    return jnp.mean((d_fake - 1.0) ** 2)


# ------------------------------------------------------------------ schedules


def weight_fine_schedule(
    epoch,
    boundaries: Sequence[float] = (10.0, 20.0, 30.0),
    values: Sequence[float] = (0.01, 0.1, 0.5, 1.0),
) -> jnp.ndarray:
    """Piecewise-constant fine-loss weight.

    Parity: ref:DisPU/model.py:52-54 (tf.train.piecewise_constant:
    value[i] on boundaries[i-1] < epoch <= boundaries[i]).
    """
    idx = jnp.searchsorted(
        jnp.asarray(boundaries, jnp.float32),
        jnp.asarray(epoch, jnp.float32),
        side="left",
    )
    return jnp.asarray(values, jnp.float32)[idx]


def lr_schedule(
    epoch,
    base_lr: float = 1e-3,
    decay_step_epochs: int = 30,
    decay_rate: float = 0.7,
    clip: float = 1e-6,
) -> jnp.ndarray:
    """Staircase exponential decay over epochs, clipped below.

    Parity: ref:DisPU/model.py:158-170.
    """
    factor = decay_rate ** jnp.floor(
        jnp.asarray(epoch, jnp.float32) / decay_step_epochs
    )
    return jnp.maximum(base_lr * factor, clip)


# -------------------------------------------------- composite training losses


def pu_losses(
    coarse: jnp.ndarray,
    fine: jnp.ndarray,
    gt: jnp.ndarray,
    radius: jnp.ndarray,
    weight_fine,
    loss_cfg,
) -> Tuple[jnp.ndarray, dict]:
    """The CD-path total generator loss + metric dict.

    Parity: ref:DisPU/model.py:74-89 — 1000·CD(coarse) + w_fine·1000·CD(fine)
    + repulsion; the HD terms are tracked as metrics only.  The reference
    also adds ``tf.losses.get_regularization_loss()`` which is zero in the
    default configuration (no weight decay on the tf_util conv path).
    """
    coarse_cd = loss_cfg.coarse_cd_w * chamfer(coarse, gt, radius=radius)
    fine_cd = loss_cfg.fine_cd_w * chamfer(fine, gt, radius=radius)
    coarse_hd = loss_cfg.hd_w * hausdorff(coarse, gt, radius=radius)
    fine_hd = loss_cfg.hd_w * hausdorff(fine, gt, radius=radius)
    rep = (
        loss_cfg.repulsion_w
        * repulsion(
            fine,
            nsample=loss_cfg.repulsion_nsample,
            radius=loss_cfg.repulsion_radius,
            h=loss_cfg.repulsion_h,
        )
        if loss_cfg.use_repulsion
        else 0.0
    )
    total = coarse_cd + weight_fine * fine_cd + rep
    # refinement-offset magnitude: |fine − coarse| per point.  Dis-PU's
    # thesis is that the refiner moves points (ref:DisPU/generator.py:59-88);
    # offset_mean ≈ 0 means the refinement head has collapsed and fine
    # degenerates to coarse — track it so that failure mode is visible.
    off = jnp.sqrt(jnp.sum((fine - coarse) ** 2, axis=-1) + 1e-20)
    metrics = {
        "coarse_cd": coarse_cd,
        "fine_cd": fine_cd,
        "coarse_hd": coarse_hd,
        "fine_hd": fine_hd,
        "repulsion": rep,
        "weight_fine": weight_fine,
        "offset_mean": jnp.mean(off),
        "offset_max": jnp.max(off),
    }
    return total, metrics


def repulsion4(
    pred: jnp.ndarray, nsample: int = 20, radius: float = 0.07
) -> jnp.ndarray:
    """RBF-weighted spacing penalty (the PU-Net-style 'uniform loss').

    Parity: ref:Common/model_utils.py:189-207 (``get_repulsion_loss4``) —
    ball-query ``nsample`` neighbors, 5 nearest squared distances minus the
    self column, h = 0.03, loss = mean(radius − d·exp(−d²/h²)).
    """
    idx, _ = query_ball_point(radius, nsample, pred, pred)
    grouped = group_point(pred, idx) - pred[:, :, None, :]
    d2 = jnp.sum(grouped**2, axis=-1)
    neg_top, _ = jax.lax.top_k(-d2, 5)
    d2 = jnp.maximum(-neg_top[:, :, 1:], 1e-12)
    d = jnp.sqrt(d2)
    h = 0.03
    weight = jnp.exp(-d2 / h**2)
    return jnp.mean(radius - d * weight)


def perulsion_loss(
    pred: jnp.ndarray,
    nsample: int = 15,
    radius: float = 0.07,
    use_knn: bool = False,
    use_l1: bool = False,
) -> jnp.ndarray:
    """Repulsion with an L1/L2 switch and matching bandwidths.

    Parity: ref:Common/model_utils.py:210-237 (``get_perulsion_loss``,
    the reference's spelling) — kNN or ball neighborhoods, the 4 nearest
    non-self (squared or L1) distances, h = 2√0.001 (L1) or 0.01 (L2),
    loss = mean(max(0, h − d)).
    """
    if use_knn:
        idx = knn_indices(nsample, pred, pred)
    else:
        idx, _ = query_ball_point(radius, nsample, pred, pred)
    grouped = group_point(pred, idx) - pred[:, :, None, :]
    dists = jnp.sum(grouped**2, axis=-1)
    if use_l1:
        dists = jnp.sqrt(dists + 1e-12)
    neg_top, _ = jax.lax.top_k(-dists, 5)
    val = neg_top[:, :, 1:]
    h = math.sqrt(0.001) * 2 if use_l1 else 0.01
    return jnp.mean(jnp.maximum(0.0, h + val))


get_perulsion_loss = perulsion_loss  # the reference's spelling


def cd_loss2(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    forward_weight: float = 1.0,
    threshold: float | None = 100.0,
) -> jnp.ndarray:
    """Chamfer without radius normalization.

    Parity: ref:Common/model_utils.py:239-266 (``get_cd_loss2``) —
    identical to :func:`chamfer` with radius = 1 and a default outlier
    threshold of 100× the per-cloud mean.
    """
    return chamfer(
        pred, gt, radius=1.0, forward_weight=forward_weight,
        threshold=threshold,
    )


def uniform_knn(pred: jnp.ndarray) -> jnp.ndarray:
    """Variance-of-kNN-spacing uniformity statistic.

    Parity: ref:Common/model_utils.py:325-333 (``get_uniform_loss_knn``) —
    6-NN squared distances; variance over points of the per-point mean
    spacing, plus the summed per-point variance over the 6 neighbors.
    """
    d, _ = knn(6, pred, pred)
    mean = jnp.mean(d, axis=2)            # (b, n)
    variance1 = jnp.sum(jnp.var(mean, axis=1))
    variance2 = jnp.sum(jnp.var(d, axis=2))
    return variance1 + variance2
