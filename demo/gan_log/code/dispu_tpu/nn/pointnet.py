"""PointNet++ set-abstraction / feature-propagation modules.

Capability parity with ref:Common/pointnet_util.py (used by the optional
hierarchical extractors, ref:Common/ops.py:503-622, and kept for model-zoo
completeness).  All modules are static-shape flax layers over the on-device
ops (FPS / ball query / kNN / 3-NN interpolation).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from dispu_tpu.nn.layers import PointConv
from dispu_tpu.ops.grouping import group_point, query_ball_point
from dispu_tpu.ops.interpolate import (
    inverse_distance_weights,
    three_interpolate,
    three_nn,
)
from dispu_tpu.ops.knn import knn_indices
from dispu_tpu.ops.sampling import farthest_point_sample, gather_point


def sample_and_group(
    npoint: int,
    radius: float,
    nsample: int,
    xyz: jnp.ndarray,
    points: Optional[jnp.ndarray],
    use_knn: bool = False,
    use_xyz: bool = True,
):
    """FPS seeds + neighborhood grouping with translation normalization.

    Parity: ref:Common/pointnet_util.py:22-62.

    Returns (new_xyz, new_points, idx, grouped_xyz).
    """
    new_xyz = gather_point(xyz, farthest_point_sample(npoint, xyz))
    if use_knn:
        idx = knn_indices(nsample, xyz, new_xyz)
    else:
        idx, _ = query_ball_point(radius, nsample, xyz, new_xyz)
    grouped_xyz = group_point(xyz, idx) - new_xyz[:, :, None, :]
    if points is not None:
        grouped_points = group_point(points, idx)
        if use_xyz:
            new_points = jnp.concatenate([grouped_xyz, grouped_points], -1)
        else:
            new_points = grouped_points
    else:
        new_points = grouped_xyz
    return new_xyz, new_points, idx, grouped_xyz


def sample_and_group_all(
    xyz: jnp.ndarray, points: Optional[jnp.ndarray], use_xyz: bool = True
):
    """Single group covering the whole cloud (global SA layer).

    Parity: ref:Common/pointnet_util.py:64-88.
    """
    b, n, _ = xyz.shape
    new_xyz = jnp.zeros((b, 1, 3), xyz.dtype)
    grouped_xyz = xyz[:, None, :, :]
    if points is not None:
        if use_xyz:
            new_points = jnp.concatenate([xyz, points], axis=-1)[:, None]
        else:
            new_points = points[:, None]
    else:
        new_points = grouped_xyz
    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, None], (b, 1, n))
    return new_xyz, new_points, idx, grouped_xyz


class PointNetSAModule(nn.Module):
    """Set abstraction: sample, group, per-point MLP, pool.

    Parity: ref:Common/pointnet_util.py:91-150 (pooling='max' default; the
    reference also offers avg/weighted_avg/max_and_avg, reproduced here).
    """

    npoint: int
    radius: float
    nsample: int
    mlp: Sequence[int]
    mlp2: Optional[Sequence[int]] = None
    group_all: bool = False
    pooling: str = "max"
    use_knn: bool = False
    use_xyz: bool = True
    use_bn: bool = False
    bn_momentum: float = 0.95
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xyz, points, train: bool = False):
        if self.group_all:
            new_xyz, new_points, idx, grouped_xyz = sample_and_group_all(
                xyz, points, self.use_xyz
            )
        else:
            new_xyz, new_points, idx, grouped_xyz = sample_and_group(
                self.npoint, self.radius, self.nsample, xyz, points,
                self.use_knn, self.use_xyz,
            )
        kw = dict(use_bn=self.use_bn, bn_momentum=self.bn_momentum,
                  dtype=self.dtype)
        for i, c in enumerate(self.mlp):
            new_points = PointConv(c, name=f"conv{i}", **kw)(new_points, train)

        if self.pooling == "max":
            new_points = jnp.max(new_points, axis=2)
        elif self.pooling == "avg":
            new_points = jnp.mean(new_points, axis=2)
        elif self.pooling == "weighted_avg":
            dists = jnp.linalg.norm(grouped_xyz, axis=-1, keepdims=True)
            w = jnp.exp(-dists * 5.0)
            w = w / jnp.sum(w, axis=2, keepdims=True)
            new_points = jnp.sum(new_points * w, axis=2)
        elif self.pooling == "max_and_avg":
            new_points = jnp.concatenate(
                [jnp.max(new_points, axis=2), jnp.mean(new_points, axis=2)],
                axis=-1,
            )
        else:
            raise ValueError(f"unknown pooling {self.pooling}")

        if self.mlp2:
            for i, c in enumerate(self.mlp2):
                new_points = PointConv(c, name=f"conv_post_{i}", **kw)(
                    new_points, train
                )
        return new_xyz, new_points, idx


class PointNetSAModuleMSG(nn.Module):
    """Multi-scale grouping set abstraction.

    Parity: ref:Common/pointnet_util.py:152-190 / tf_util2.py:112-151.
    """

    npoint: int
    radius_list: Sequence[float]
    nsample_list: Sequence[int]
    mlp_list: Sequence[Sequence[int]]
    use_knn: bool = False
    use_xyz: bool = True
    use_bn: bool = False
    bn_momentum: float = 0.95
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xyz, points, train: bool = False):
        new_xyz = gather_point(xyz, farthest_point_sample(self.npoint, xyz))
        kw = dict(use_bn=self.use_bn, bn_momentum=self.bn_momentum,
                  dtype=self.dtype)
        outs = []
        for i, (radius, nsample, mlps) in enumerate(
            zip(self.radius_list, self.nsample_list, self.mlp_list)
        ):
            if self.use_knn:
                idx = knn_indices(nsample, xyz, new_xyz)
            else:
                idx, _ = query_ball_point(radius, nsample, xyz, new_xyz)
            grouped_xyz = group_point(xyz, idx) - new_xyz[:, :, None, :]
            if points is not None:
                grouped = group_point(points, idx)
                if self.use_xyz:
                    grouped = jnp.concatenate([grouped, grouped_xyz], -1)
            else:
                grouped = grouped_xyz
            for j, c in enumerate(mlps):
                grouped = PointConv(c, name=f"conv{i}_{j}", **kw)(grouped, train)
            outs.append(jnp.max(grouped, axis=2))
        return new_xyz, jnp.concatenate(outs, axis=-1)


class PointNetFPModule(nn.Module):
    """Feature propagation: 3-NN inverse-distance interpolation + unit MLP.

    Parity: ref:Common/pointnet_util.py:192-221.
    """

    mlp: Sequence[int]
    use_bn: bool = False
    bn_momentum: float = 0.95
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xyz1, xyz2, points1, points2, train: bool = False):
        dist, idx = three_nn(xyz1, xyz2)
        weight = inverse_distance_weights(dist)
        interpolated = three_interpolate(points2, idx, weight)
        if points1 is not None:
            interpolated = jnp.concatenate([interpolated, points1], axis=-1)
        kw = dict(use_bn=self.use_bn, bn_momentum=self.bn_momentum,
                  dtype=self.dtype)
        for i, c in enumerate(self.mlp):
            interpolated = PointConv(c, name=f"conv_{i}", **kw)(
                interpolated, train
            )
        return interpolated
