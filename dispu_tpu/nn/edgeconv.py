"""EdgeConv / DenseGCN feature extraction.

The reference's backbone (ref:Common/ops.py:1437-1486 ``feature_extraction_GCN``)
is a DenseNet of EdgeConv blocks operating on *feature-space* kNN graphs.
TPU mapping: the kNN graph is one MXU matmul + top_k; each EdgeConv layer is
a Dense over the (B, N, K, C) edge tensor — XLA collapses (B·N·K) into one
big matmul; the max-pool over K is a VPU reduction that fuses with the
surrounding ops.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dispu_tpu.nn.layers import PointConv
from dispu_tpu.ops.grouping import group_point
from dispu_tpu.ops.knn import knn_unique_indices


def edge_feature(
    feature: jnp.ndarray,
    k: int,
    idx: Optional[jnp.ndarray] = None,
    gather_impl: str = "gather",
    knn_variant: str = "auto",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-edge tensor [center, neighbor − center].

    Args:
      feature: (b, n, c) per-point features (xyz or learned).
      k: neighbors per point (excluding self).
      idx: optional precomputed (b, n, k) neighbor indices.

    Returns:
      (edges, idx): (b, n, k, 2c) and (b, n, k).

    Parity: ref:Common/ops.py:1856-1877 — kNN with ``k+1`` in feature space,
    duplicates masked (unique=True), self/first column dropped.

    ``gather_impl='fused'``/``'fused_turbo'`` computes the kNN and the
    neighbor gather in one Pallas kernel (``drop_first`` mode — the self
    column is selected and knocked out but never gathered); exact mode is
    bit-identical to the composed path, turbo bf16-rounds the gathered
    values like ``impl='onehot'``.  Falls back to the composed path
    off-TPU, for precomputed ``idx``, or outside the kernel's envelope.
    """
    if idx is None and gather_impl in ("fused", "fused_turbo"):
        fits = (
            jax.default_backend() not in ("cpu", "gpu")
            and 64 <= feature.shape[-2] <= 4096
            and feature.shape[-1] <= 384
            and k + 1 <= 128
        )
        if fits:
            from dispu_tpu.ops.knn import mask_duplicate_rows
            from dispu_tpu.ops.pallas_kernels import knn_group_pallas_diff

            dup = mask_duplicate_rows(jax.lax.stop_gradient(feature))
            _, idx, _, neighbors = knn_group_pallas_diff(
                k, feature, feature, feature,
                dup.astype(jnp.float32) * 1e30,
                exact=(gather_impl == "fused"),
                with_xyz=False,
                drop_first=True,
            )
            center = jnp.broadcast_to(
                feature[:, :, None, :], neighbors.shape
            )
            return (jnp.concatenate([center, neighbors - center], axis=-1),
                    idx)
        gather_impl = "onehot_hp" if gather_impl == "fused" else "onehot"
    if idx is None:
        nbr = knn_unique_indices(k + 1, feature, feature, variant=knn_variant)
        idx = nbr[:, :, 1:]
    if gather_impl in ("fused", "fused_turbo"):  # precomputed idx path
        gather_impl = "onehot_hp" if gather_impl == "fused" else "onehot"
    neighbors = group_point(feature, idx, impl=gather_impl)
    center = jnp.broadcast_to(
        feature[:, :, None, :], neighbors.shape
    )
    return jnp.concatenate([center, neighbors - center], axis=-1), idx


class DenseEdgeBlock(nn.Module):
    """Densely-connected EdgeConv block with max aggregation.

    Parity: ref:Common/ops.py:1897-1915 (``dense_conv``): layer 0 concats
    the tiled center feature; intermediate layers concat their input; the
    last layer has no activation; aggregation is max over neighbors.
    Channel growth for (growth=g, n=3, c_in): output = 2g + g + c_in... the
    exact sequence is [conv(g)‖center, conv(g)‖prev, conv(g,no-act)‖prev]
    → g·3 + c_in channels after max-pool.

    ``variant`` selects the sibling graphs:
      * ``"default"`` — ``dense_conv`` (above).
      * ``"v0"`` — ``dense_conv0`` (ref:Common/ops.py:1879-1895): layer 0
        does NOT concat the center feature (output g·1 at i=0, then dense
        concats; final channels g·3 + g at n=3... precisely g + (n−1)·g
        accumulated = n·g after the chain, without the c_in term).
      * ``"v2"`` — ``dense_conv2`` (ref:Common/ops.py:1917-1930): center
        concat at layer 0 like default, but every layer keeps its ReLU
        (no linear last layer).
    """

    growth_rate: int
    n: int = 3
    k: int = 16
    use_bn: bool = False
    bn_momentum: float = 0.95
    gather_impl: str = "gather"  # see ops.grouping.group_point impls
    variant: str = "default"
    knn_variant: str = "auto"  # 'packed' = turbo selection (ops.knn.knn)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        feature: jnp.ndarray,
        train: bool = False,
        idx: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        y, idx = edge_feature(
            feature, self.k, idx, gather_impl=self.gather_impl,
            knn_variant=self.knn_variant,
        )
        for i in range(self.n):
            last_linear = self.variant != "v2" and i == self.n - 1
            conv = PointConv(
                self.growth_rate,
                activation=None if last_linear else nn.relu,
                use_bn=self.use_bn,
                bn_momentum=self.bn_momentum,
                dtype=self.dtype,
                name=f"l{i}",
            )
            if i == 0:
                if self.variant == "v0":
                    y = conv(y, train)
                else:
                    center = jnp.broadcast_to(
                        feature[:, :, None, :],
                        feature.shape[:2] + (y.shape[2], feature.shape[-1]),
                    )
                    y = jnp.concatenate([conv(y, train), center], axis=-1)
            else:
                y = jnp.concatenate([conv(y, train), y], axis=-1)
        return jnp.max(y, axis=-2), idx


class EdgeConv(nn.Module):
    """Single EdgeConv layer (DGCNN).

    Parity: ref:Common/ops.py:1934-1952.
    """

    features: int
    k: int = 16
    use_bn: bool = False
    bn_momentum: float = 0.95
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        edges, _ = edge_feature(x, self.k)
        out = PointConv(
            self.features,
            activation=nn.relu,
            use_bn=self.use_bn,
            bn_momentum=self.bn_momentum,
            dtype=self.dtype,
            name="conv",
        )(edges, train)
        return jnp.max(out, axis=-2)


class FeatureExtractorGCN(nn.Module):
    """DenseGCN backbone: 24 → 120 → 240 → 360 → 480 channels.

    Parity: ref:Common/ops.py:1437-1486 — an input lift to 24 channels
    (linear, no activation), then ``dense_block`` DenseEdgeBlocks, each
    preceded (from block 2 on) by a 1×1 compression to ``2·growth`` and
    followed by concatenation onto the running feature.
    """

    growth_rate: int = 24
    dense_block: int = 4
    dense_n: int = 3
    k: int = 16
    use_bn: bool = False
    bn_momentum: float = 0.95
    gather_impl: str = "gather"  # see ops.grouping.group_point impls
    knn_variant: str = "auto"  # 'packed' = turbo selection (ops.knn.knn)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xyz: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        comp = self.growth_rate * 2
        kw = dict(
            use_bn=self.use_bn, bn_momentum=self.bn_momentum, dtype=self.dtype
        )
        bkw = dict(
            gather_impl=self.gather_impl, knn_variant=self.knn_variant, **kw
        )
        feat = PointConv(24, activation=None, name="layer0", **kw)(xyz, train)
        out, _ = DenseEdgeBlock(
            self.growth_rate, self.dense_n, self.k, name="layer1", **bkw
        )(feat, train)
        out = jnp.concatenate([out, feat], axis=-1)
        for b in range(2, self.dense_block + 1):
            prep = PointConv(comp, name=f"layer{b}_prep", **kw)(out, train)
            block, _ = DenseEdgeBlock(
                self.growth_rate, self.dense_n, self.k, name=f"layer{b}", **bkw
            )(prep, train)
            out = jnp.concatenate([block, out], axis=-1)
        return out
