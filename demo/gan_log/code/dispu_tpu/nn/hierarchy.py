"""Hierarchical (PointNet++ U-Net) feature extractors.

Capability parity with the reference's optional backbones
(ref:Common/ops.py:505-622, ``hierachy_feature_extractor`` /
``hierachy_feature_extractor2`` — not in the default Dis-PU path, kept so
the model zoo covers every extractor the reference ships).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from dispu_tpu.nn.layers import PointConv
from dispu_tpu.nn.pointnet import PointNetFPModule, PointNetSAModule


class HierarchyFeatureExtractor(nn.Module):
    """4-level SA encoder + global layer + FP decoder → per-point features.

    Parity: ref:Common/ops.py:505-550 — SA npoints (1024, 384, 128) with
    mlps (32,32,64)/(64,64,128)/(128,128,256), a group_all (256,256,512)
    bottleneck, then FP back to full resolution with
    (512,512)/(512,256)/(256,128)/(128,128,128).
    """

    npoints: Sequence[int] = (1024, 384, 128)
    radius: Sequence[float] = (0.1, 0.2, 0.4)
    nsample: int = 64
    use_bn: bool = False
    bn_momentum: float = 0.95
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kw = dict(use_bn=self.use_bn, bn_momentum=self.bn_momentum,
                  dtype=self.dtype)
        l0_xyz, l0_points = inputs, None
        l1_xyz, l1_points, _ = PointNetSAModule(
            npoint=self.npoints[0], radius=self.radius[0],
            nsample=self.nsample, mlp=(32, 32, 64), name="layer1", **kw
        )(l0_xyz, l0_points, train)
        l2_xyz, l2_points, _ = PointNetSAModule(
            npoint=self.npoints[1], radius=self.radius[1],
            nsample=self.nsample, mlp=(64, 64, 128), name="layer2", **kw
        )(l1_xyz, l1_points, train)
        l3_xyz, l3_points, _ = PointNetSAModule(
            npoint=self.npoints[2], radius=self.radius[2],
            nsample=self.nsample, mlp=(128, 128, 256), name="layer3", **kw
        )(l2_xyz, l2_points, train)
        l4_xyz, l4_points, _ = PointNetSAModule(
            npoint=1, radius=0.0, nsample=1, mlp=(256, 256, 512),
            group_all=True, name="layer4", **kw
        )(l3_xyz, l3_points, train)

        l3_points = PointNetFPModule(mlp=(512, 512), name="fa_layer1", **kw)(
            l3_xyz, l4_xyz, l3_points, l4_points, train
        )
        l2_points = PointNetFPModule(mlp=(512, 256), name="fa_layer2", **kw)(
            l2_xyz, l3_xyz, l2_points, l3_points, train
        )
        l1_points = PointNetFPModule(mlp=(256, 128), name="fa_layer3", **kw)(
            l1_xyz, l2_xyz, l1_points, l2_points, train
        )
        l0_points = PointNetFPModule(
            mlp=(128, 128, 128), name="fa_layer4", **kw
        )(l0_xyz, l1_xyz, l0_points, l1_points, train)
        return l0_points


class HierarchyUpsampler(nn.Module):
    """PU-Net-style multi-branch upsampler over an SA/FP pyramid.

    Parity: ref:Common/ops.py:553-622 (``hierachy_feature_extractor2``):
    4-level SA pyramid at full/half/quarter/eighth resolution, FP all levels
    back to the input points, then ``up_ratio`` independent conv branches
    over the concatenated feature, concatenated along the point axis and
    regressed to xyz.
    """

    up_ratio: int = 4
    bradius: float = 1.0
    use_bn: bool = False
    bn_momentum: float = 0.95
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kw = dict(use_bn=self.use_bn, bn_momentum=self.bn_momentum,
                  dtype=self.dtype)
        n = inputs.shape[1]
        l0_xyz, l0_points = inputs, None
        l1_xyz, l1_points, _ = PointNetSAModule(
            npoint=n, radius=self.bradius * 0.05, nsample=32,
            mlp=(32, 32, 64), name="layer1", **kw
        )(l0_xyz, l0_points, train)
        l2_xyz, l2_points, _ = PointNetSAModule(
            npoint=n // 2, radius=self.bradius * 0.1, nsample=32,
            mlp=(64, 64, 128), name="layer2", **kw
        )(l1_xyz, l1_points, train)
        l3_xyz, l3_points, _ = PointNetSAModule(
            npoint=n // 4, radius=self.bradius * 0.2, nsample=32,
            mlp=(128, 128, 256), name="layer3", **kw
        )(l2_xyz, l2_points, train)
        l4_xyz, l4_points, _ = PointNetSAModule(
            npoint=n // 8, radius=self.bradius * 0.3, nsample=32,
            mlp=(256, 256, 512), name="layer4", **kw
        )(l3_xyz, l3_points, train)

        up_l4 = PointNetFPModule(mlp=(64,), name="fa_layer1", **kw)(
            l0_xyz, l4_xyz, None, l4_points, train
        )
        up_l3 = PointNetFPModule(mlp=(64,), name="fa_layer2", **kw)(
            l0_xyz, l3_xyz, None, l3_points, train
        )
        up_l2 = PointNetFPModule(mlp=(64,), name="fa_layer3", **kw)(
            l0_xyz, l2_xyz, None, l2_points, train
        )

        concat = jnp.concatenate(
            [up_l4, up_l3, up_l2, l1_points, l0_xyz], axis=-1
        )
        branches = []
        for i in range(self.up_ratio):
            f = PointConv(256, name=f"fc_layer0_{i}", dtype=self.dtype)(
                concat, train
            )
            f = PointConv(128, name=f"conv_{i}", **kw)(f, train)
            branches.append(f)
        net = jnp.concatenate(branches, axis=1)  # (b, r*n, 128)

        coord = PointConv(64, name="fc_layer1", dtype=self.dtype)(net, train)
        coord = PointConv(
            3, activation=None, name="fc_layer2", dtype=self.dtype
        )(coord, train)
        return coord
