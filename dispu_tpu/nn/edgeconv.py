"""EdgeConv / DenseGCN feature extraction.

The reference's backbone (ref:Common/ops.py:1437-1486 ``feature_extraction_GCN``)
is a DenseNet of EdgeConv blocks operating on *feature-space* kNN graphs.
TPU mapping: the kNN graph is one MXU matmul + top_k; each EdgeConv layer is
a Dense over the (B, N, K, C) edge tensor — XLA collapses (B·N·K) into one
big matmul; the max-pool over K is a VPU reduction that fuses with the
surrounding ops.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dispu_tpu.nn.layers import PointConv
from dispu_tpu.ops.grouping import group_point
from dispu_tpu.ops.knn import knn_unique_indices


def edge_parts(
    feature: jnp.ndarray,
    k: int,
    idx: Optional[jnp.ndarray] = None,
    gather_impl: str = "gather",
    knn_variant: str = "auto",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """kNN neighborhood of each point, NOT yet assembled into edges.

    Returns ``(center, neighbors, idx)`` — (b, n, c), (b, n, k, c),
    (b, n, k).  ``edge_feature`` concatenates these into the reference's
    [center, neighbor − center] edge tensor; the ``dense_impl='split'``
    EdgeConv path consumes the raw parts instead so the wide edge tensor
    is never materialized.

    Parity: ref:Common/ops.py:1856-1877 — kNN with ``k+1`` in feature space,
    duplicates masked (unique=True), self/first column dropped.

    ``gather_impl='fused'``/``'fused_turbo'`` computes the kNN and the
    neighbor gather in one Pallas kernel (``drop_first`` mode — the self
    column is selected and knocked out but never gathered); idx is
    bit-identical to the composed path; gathered values agree to f32
    round-off on real hardware in exact mode (the in-kernel MXU
    accumulation order differs — see ``ops.grouping.grouping``), and
    turbo bf16-rounds them like ``impl='onehot'``.  Falls back to the
    composed path off-TPU, for precomputed ``idx``, or outside the
    kernel's envelope (n > 2048 pays the VMEM-forced small tile —
    measured in scripts/profile_r3u.py §K).
    """
    if idx is None and gather_impl in ("fused", "fused_turbo"):
        fits = (
            jax.default_backend() not in ("cpu", "gpu")
            and 64 <= feature.shape[-2] <= 2048
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
            return feature, neighbors, idx
        gather_impl = "onehot_hp" if gather_impl == "fused" else "onehot"
    if idx is None:
        nbr = knn_unique_indices(k + 1, feature, feature, variant=knn_variant)
        idx = nbr[:, :, 1:]
    if gather_impl in ("fused", "fused_turbo"):  # precomputed idx path
        gather_impl = "onehot_hp" if gather_impl == "fused" else "onehot"
    neighbors = group_point(feature, idx, impl=gather_impl)
    return feature, neighbors, idx


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

    See :func:`edge_parts` for the kNN/gather semantics and the fused
    kernel envelope.
    """
    center, neighbors, idx = edge_parts(
        feature, k, idx, gather_impl=gather_impl, knn_variant=knn_variant
    )
    center = jnp.broadcast_to(center[:, :, None, :], neighbors.shape)
    return jnp.concatenate([center, neighbors - center], axis=-1), idx


class _PartsDense(nn.Module):
    """``nn.Dense`` evaluated against a row-partitioned kernel.

    Parameter name, shape, and init are IDENTICAL to the
    ``nn.Dense(name='dense')`` inside :class:`~dispu_tpu.nn.layers.PointConv`
    (same flax param path → same initial values, checkpoint-compatible);
    only *apply* differs: instead of one matmul against a concatenated
    input, each ``part_rows[i]`` row block multiplies its own signed term
    list and the results broadcast-add.  ``concat([a, b]) @ W ==
    a @ W[:ra] + b @ W[ra:]`` exactly in real arithmetic; in f32 only the
    accumulation order changes (~1e-6 relative).  The win: k-independent
    terms (the tiled center feature) enter as (b, n, 1, c) and their
    matmul + HBM traffic drop by k×, and no concatenated (b, n, k, ·)
    tensor is ever materialized.
    """

    features: int
    part_rows: Tuple[int, ...]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, parts) -> jnp.ndarray:
        # parts: per row-block, a list of (array, sign) terms sharing that
        # block's kernel rows; e.g. the edge block [center | nbr − center]
        # becomes [[(center, +1)], [(nbr, +1), (center, -1)]].
        from dispu_tpu.nn.layers import _glorot

        total = sum(self.part_rows)
        kernel = self.param(
            "kernel", _glorot(), (total, self.features), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        arrays = [a for terms in parts for (a, _) in terms]
        *arrays, kernel, bias = nn.dtypes.promote_dtype(
            *arrays, kernel, bias, dtype=self.dtype
        )
        it = iter(arrays)
        out, off = None, 0
        for rows, terms in zip(self.part_rows, parts):
            w = jax.lax.slice_in_dim(kernel, off, off + rows, axis=0)
            off += rows
            for _, sign in terms:
                t = next(it) @ w
                t = -t if sign < 0 else t
                out = t if out is None else out + t
        return out + bias


class _SplitPointConv(nn.Module):
    """PointConv over partitioned inputs — same param tree as PointConv
    (``dense`` + optional ``bn``), split-matmul apply via _PartsDense."""

    features: int
    part_rows: Tuple[int, ...]
    activation: Optional[Callable] = nn.relu
    use_bn: bool = False
    bn_momentum: float = 0.95
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, parts, train: bool = False) -> jnp.ndarray:
        x = _PartsDense(
            self.features, self.part_rows, dtype=self.dtype, name="dense"
        )(parts)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=self.bn_momentum,
                epsilon=1e-3,  # match PointConv (ref:Common/tf_util.py:527)
                dtype=self.dtype,
                name="bn",
            )(x)
        if self.activation is not None:
            x = self.activation(x)
        return x


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

    ``dense_impl`` selects the evaluation strategy (same math, same param
    tree, checkpoint-compatible):
      * ``"concat"`` — the literal reference dataflow above: each layer's
        input is a concatenated (b, n, k, ·) tensor (up to 3g+c wide).
      * ``"split"`` — distributes every conv over its concat parts
        (``concat(a, b) @ W = a @ Wa + b @ Wb``) and the max-over-k over
        the output concat.  The center feature stays (b, n, 1, c) — its
        matmuls and HBM reads are k× cheaper — and only the narrow
        (b, n, k, g) per-layer conv outputs ever materialize, cutting the
        block's activation traffic ~3× (the pass-2 conv stack is
        HBM-streaming-bound, PERFORMANCE.md speed-of-light table).  f32
        accumulation order differs from 'concat' (~1e-6 relative).
    """

    growth_rate: int
    n: int = 3
    k: int = 16
    use_bn: bool = False
    bn_momentum: float = 0.95
    gather_impl: str = "gather"  # see ops.grouping.group_point impls
    variant: str = "default"
    knn_variant: str = "auto"  # 'packed' = turbo selection (ops.knn.knn)
    dense_impl: str = "concat"  # or 'split' (see class docstring)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        feature: jnp.ndarray,
        train: bool = False,
        idx: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self.dense_impl == "split":
            return self._split(feature, train, idx)
        if self.dense_impl != "concat":
            raise ValueError(f"unknown dense_impl {self.dense_impl!r}")
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

    def _split(
        self,
        feature: jnp.ndarray,
        train: bool,
        idx: Optional[jnp.ndarray],
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """dense_impl='split': part-distributed evaluation.

        Derivation from the 'concat' dataflow — layer inputs are
          l0: [center | nbr − center]          (both row blocks width c)
          l1: [out0 (| center)]                ('v0' drops the center)
          l2: [out1 | out0 (| center)]
        and the block output is max_k of [out_{n−1} | … | out_0 (| center)];
        max over k distributes over the channel concat, and the tiled
        center's max is the center itself.
        """
        center, nbr, idx = edge_parts(
            feature, self.k, idx, gather_impl=self.gather_impl,
            knn_variant=self.knn_variant,
        )
        c, g = feature.shape[-1], self.growth_rate
        c1 = center[:, :, None, :]  # (b, n, 1, c) — k-independent terms
        outs = []
        for i in range(self.n):
            last_linear = self.variant != "v2" and i == self.n - 1
            if i == 0:
                part_rows = (c, c)
                parts = [[(c1, +1)], [(nbr, +1), (c1, -1)]]
            else:
                prev = outs[::-1]  # out_{i-1} first, matching the concat
                part_rows = tuple(g for _ in prev)
                parts = [[(o, +1)] for o in prev]
                if self.variant != "v0":
                    part_rows += (c,)
                    parts.append([(c1, +1)])
            out_i = _SplitPointConv(
                g,
                part_rows,
                activation=None if last_linear else nn.relu,
                use_bn=self.use_bn,
                bn_momentum=self.bn_momentum,
                dtype=self.dtype,
                name=f"l{i}",
            )(parts, train)
            outs.append(out_i)
        pieces = [jnp.max(o, axis=-2) for o in outs[::-1]]
        if self.variant != "v0":
            pieces.append(center)
        return jnp.concatenate(pieces, axis=-1), idx


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
    dense_impl: str = "concat"  # or 'split' (see DenseEdgeBlock)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xyz: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        comp = self.growth_rate * 2
        kw = dict(
            use_bn=self.use_bn, bn_momentum=self.bn_momentum, dtype=self.dtype
        )
        bkw = dict(
            gather_impl=self.gather_impl, knn_variant=self.knn_variant,
            dense_impl=self.dense_impl, **kw
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
