"""DeepGCN building blocks (graph convolutions over point kNN graphs).

Capability parity with ref:gcn_lib/ — vertex layers (tf_vertex.py: edge
conv, max-relative conv, GraphSAGE, GIN), edge layers (tf_edge.py: knn
graph + dilated/stochastic-dilated knn graph), and the builder helpers
(gcn_utils.py).  Consumed by the alternative GCN backbone
(ref:Common/ops.py:431-500); re-expressed as flax modules over the
on-device kNN.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from dispu_tpu.nn.layers import PointConv, PointMLP
from dispu_tpu.ops.grouping import group_point
from dispu_tpu.ops.knn import knn_indices


# --------------------------------------------------------------- edge layers


def knn_graph(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """(b, n, c) features → (b, n, k) neighbor indices (self included first).

    Parity: ref:gcn_lib/tf_edge.py:19-28.
    """
    idx = knn_indices(k, x, x)
    return idx


def dilated_knn_graph(
    x: jnp.ndarray,
    k: int,
    dilation: int = 1,
    stochastic: bool = False,
    epsilon: float = 0.0,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """kNN graph with (optionally stochastic) dilation.

    Finds k·dilation neighbors and keeps every ``dilation``-th; with
    ``stochastic`` and probability ``epsilon`` a random k-subset is kept
    instead (training-time regularization).

    Parity: ref:gcn_lib/tf_edge.py:30-79.
    """
    idx = knn_graph(x, k * dilation)
    if dilation == 1:
        return idx[..., :k]
    dilated = idx[..., ::dilation][..., :k]
    if stochastic and rng is not None and epsilon > 0.0:
        k_choice, k_gate = jax.random.split(rng)
        perm = jax.random.permutation(k_choice, k * dilation)[:k]
        random_sel = idx[..., perm]
        use_random = jax.random.uniform(k_gate) < epsilon
        return jnp.where(use_random, random_sel, dilated)
    return dilated


# ------------------------------------------------------------- vertex layers


class EdgeConvLayer(nn.Module):
    """EdgeConv: MLP([x_i, x_j − x_i]) max-pooled over neighbors.

    Parity: ref:gcn_lib/tf_vertex.py:81-101.
    """

    features: Sequence[int]
    use_bn: bool = False
    bn_momentum: float = 0.95
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, idx, train: bool = False):
        nbrs = group_point(x, idx)
        center = jnp.broadcast_to(x[:, :, None, :], nbrs.shape)
        edges = jnp.concatenate([center, nbrs - center], axis=-1)
        out = PointMLP(
            tuple(self.features), last_activation=nn.relu,
            use_bn=self.use_bn, bn_momentum=self.bn_momentum,
            dtype=self.dtype, name="mlp",
        )(edges, train)
        return jnp.max(out, axis=2)


class MaxRelativeConvLayer(nn.Module):
    """Max-relative GCN: MLP([x_i, max_j(x_j − x_i)]).

    Parity: ref:gcn_lib/tf_vertex.py:20-45.
    """

    features: Sequence[int]
    use_bn: bool = False
    bn_momentum: float = 0.95
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, idx, train: bool = False):
        nbrs = group_point(x, idx)
        rel = jnp.max(nbrs - x[:, :, None, :], axis=2)
        out = jnp.concatenate([x, rel], axis=-1)
        return PointMLP(
            tuple(self.features), last_activation=nn.relu,
            use_bn=self.use_bn, bn_momentum=self.bn_momentum,
            dtype=self.dtype, name="mlp",
        )(out, train)


class GraphSAGEConvLayer(nn.Module):
    """GraphSAGE: concat(x_i, maxpool(MLP(x_j))) → MLP, l2-normalized.

    Parity: ref:gcn_lib/tf_vertex.py:103-142.
    """

    features: Sequence[int]
    use_bn: bool = False
    bn_momentum: float = 0.95
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, idx, train: bool = False):
        kw = dict(use_bn=self.use_bn, bn_momentum=self.bn_momentum,
                  dtype=self.dtype)
        nbrs = group_point(x, idx)
        pooled = jnp.max(
            PointConv(self.features[0], name="pre", **kw)(nbrs, train), axis=2
        )
        out = jnp.concatenate([x, pooled], axis=-1)
        out = PointMLP(
            tuple(self.features), last_activation=nn.relu, name="mlp", **kw
        )(out, train)
        return out / jnp.maximum(
            jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12
        )


class GINConvLayer(nn.Module):
    """GIN: MLP((1 + eps) · x_i + sum_j x_j) with learnable eps.

    Parity: ref:gcn_lib/tf_vertex.py:179-208.
    """

    features: Sequence[int]
    init_eps: float = 0.0
    use_bn: bool = False
    bn_momentum: float = 0.95
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, idx, train: bool = False):
        eps = self.param(
            "eps", nn.initializers.constant(self.init_eps), (1,), self.dtype
        )
        agg = jnp.sum(group_point(x, idx), axis=2)
        out = (1.0 + eps) * x + agg
        return PointMLP(
            tuple(self.features), last_activation=nn.relu,
            use_bn=self.use_bn, bn_momentum=self.bn_momentum,
            dtype=self.dtype, name="mlp",
        )(out, train)


class GCNBackbone(nn.Module):
    """Stacked dilated-kNN GCN backbone (the alternative extractor).

    Parity: ref:Common/ops.py:431-500 (``build_gcn_backbone_block``): a
    configurable stack of vertex layers over (stochastically) dilated kNN
    graphs with dense or residual skips.
    """

    depth: int = 3
    growth_rate: int = 24
    k: int = 16
    conv: str = "edge"  # 'edge' | 'mr' | 'sage' | 'gin'
    dilation: bool = True
    stochastic: bool = False
    epsilon: float = 0.2
    use_bn: bool = False
    bn_momentum: float = 0.95
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, rng: Optional[jax.Array] = None):
        layer_cls = {
            "edge": EdgeConvLayer,
            "mr": MaxRelativeConvLayer,
            "sage": GraphSAGEConvLayer,
            "gin": GINConvLayer,
        }[self.conv]
        feats = [x]
        out = x
        for i in range(self.depth):
            d = (i + 1) if self.dilation else 1
            sub = None
            if rng is not None:
                rng, sub = jax.random.split(rng)
            idx = dilated_knn_graph(
                out, self.k, dilation=d, stochastic=self.stochastic and train,
                epsilon=self.epsilon, rng=sub,
            )
            out = layer_cls(
                (self.growth_rate,),
                use_bn=self.use_bn,
                bn_momentum=self.bn_momentum,
                dtype=self.dtype,
                name=f"layer{i}",
            )(out, idx, train)
            feats.append(out)
        return jnp.concatenate(feats, axis=-1)
