"""The reference's experimental op families, one for one.

These are the research variants Dis-PU's authors kept in
``Common/ops.py`` but do not call from the default model: alternative
down/up-scalers, shuffle-based upsamplers, earlier refiner cores, and the
odd normalization/reconstruction helpers.  They are part of the
capability inventory (SURVEY.md §2.2 P6), so each gets a real TPU-native
implementation with the same data flow — static shapes, MXU-friendly
matmuls, no host callbacks — plus shape/numeric tests
(tests/test_experimental.py).

Several of these functions are latently broken as checked in (they have
zero callers, so the breakage never fired); each repair is documented on
the class it concerns:

  * ``PointASNLSetAbstraction`` references an undefined ``nl_channel``
    (ref:Common/ops.py:380) — every sibling defines it as ``mlp[-1]``, so
    we do too.
  * ``PointShuffle`` (v1) sizes its weight head from the *xyz* channel
    count, which only type-checks for 3-channel features
    (ref:Common/ops.py:1002-1008) — we size it from the feature channels,
    matching ``PointDownscale3``'s identical pattern.
  * ``weight_learning_unit`` contracts two tensors whose channel counts
    can never match (ref:Common/ops.py:1615) — we project the weights to
    the input dim so the contraction is well-defined.
  * ``instance_norm`` divides by ``(σ²+ε)²`` instead of ``sqrt(σ²+ε)``
    (ref:Common/ops.py:1688) — we implement standard instance norm and
    keep the reference formula behind ``faithful=True``.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dispu_tpu.nn.attention import PointNonLocalCell, SampleWeights
from dispu_tpu.nn.edgeconv import EdgeConv, FeatureExtractorGCN, edge_feature
from dispu_tpu.nn.layers import PointConv, PointMLP, WeightNetHidden
from dispu_tpu.ops.geometry import gen_grid
from dispu_tpu.ops.grouping import grouping
from dispu_tpu.ops.knn import knn
from dispu_tpu.ops.sampling import farthest_point_sample, gather_point


def _fps_with_features(
    npoint: int, xyz: jnp.ndarray, feature: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """FPS both xyz and aligned features (ref:Common/ops.py:120-137)."""
    idx = farthest_point_sample(npoint, xyz)
    return gather_point(xyz, idx), gather_point(feature, idx)


# --------------------------------------------------------------------------
# attention offsets
# --------------------------------------------------------------------------


class SampleOffset(nn.Module):
    """Neighborhood attention → pooled feature → bounded offset head.

    Parity: ref:Common/ops.py:235-281 — xyz re-centered on the first
    neighbor, QKV attention within the neighborhood (identical to
    ``SampleWeights`` up to the head), max-pool over neighbors, an MLP to
    ``mlps[-1]`` channels, then the ±0.5 sigmoid squash.

    Shapes: new_point (b, np, ns, c), grouped_xyz (b, np, ns, 3) →
    (b, np, mlps[-1]).
    """

    mlps: Sequence[int]
    use_bn: bool = True
    bn_momentum: float = 0.95
    scaled: bool = True
    offset_range: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        new_point: jnp.ndarray,
        grouped_xyz: jnp.ndarray,
        train: bool = False,
    ) -> jnp.ndarray:
        b, npoint, nsample, channel = new_point.shape
        bc = max(32, channel // 2)
        kw = dict(use_bn=self.use_bn, bn_momentum=self.bn_momentum,
                  dtype=self.dtype)
        normalized = grouped_xyz - grouped_xyz[:, :, :1, :]
        x = jnp.concatenate([normalized, new_point], axis=-1)
        kv = PointConv(2 * bc, activation=None, name="conv_kv_ds", **kw)(
            x, train
        )
        q = PointConv(bc, activation=None, name="conv_query_ds", **kw)(
            x, train
        )
        keys, values = kv[..., :bc], kv[..., bc:]
        attn = jnp.einsum("bnsc,bntc->bnst", q, keys)
        if self.scaled:
            attn = attn / jnp.sqrt(jnp.asarray(bc, attn.dtype))
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bnst,bntc->bnsc", attn, values)
        out = jnp.max(out, axis=-2)  # (b, np, bc)
        out = PointMLP(
            tuple(self.mlps), last_activation=None, name="mlp2",
            use_bn=self.use_bn, bn_momentum=self.bn_momentum,
            dtype=self.dtype,
        )(out, train)
        r = self.offset_range
        return nn.sigmoid(out) * (2.0 * r) - r


# --------------------------------------------------------------------------
# set abstraction / downscale family
# --------------------------------------------------------------------------


class PointASNLSetAbstraction(nn.Module):
    """ASNL set abstraction: FPS + adaptive sampling + local/non-local cells.

    Parity: ref:Common/ops.py:348-424.  Pipeline: FPS to ``npoint`` seeds
    (skipped when the cloud is already that size), kNN/ball grouping,
    adaptive re-positioning of the seeds from their neighborhoods,
    translation-normalized local cell (edge MLP → ``weight_net_hidden``
    matmul pooling → after_conv), max-pool skip, optional non-local cell,
    and a fusion conv.  The reference's undefined ``nl_channel`` (line 380)
    is resolved to ``mlp[-1]`` like every sibling function.
    """

    npoint: int
    nsample: int
    mlp: Sequence[int]
    use_bn: bool = True
    bn_momentum: float = 0.95
    use_knn: bool = True
    radius: Optional[float] = None
    as_neighbor: int = 8
    use_nonlocal: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, xyz: jnp.ndarray, feature: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b, n, c = feature.shape
        out_c = self.mlp[-1]
        kw = dict(use_bn=self.use_bn, bn_momentum=self.bn_momentum,
                  dtype=self.dtype)
        same_size = n == self.npoint
        if same_size:
            new_xyz, new_feature = xyz, feature
        else:
            new_xyz, new_feature = _fps_with_features(
                self.npoint, xyz, feature
            )
        grouped_xyz, new_point, _ = grouping(
            feature, self.nsample, xyz, new_xyz,
            use_knn=self.use_knn,
            radius=self.radius if self.radius is not None else 0.2,
        )
        if not same_size:
            # the grouped features carry the prepended neighbor xyz
            # (grouping use_xyz=True, ref:Common/ops.py:154), so the weight
            # head spans 1 (xyz) + 3 + c channels like the reference's
            # num_channel (ref:Common/ops.py:284,295)
            sw = SampleWeights(
                [32, 1 + new_point.shape[-1]], use_bn=self.use_bn,
                bn_momentum=self.bn_momentum, dtype=self.dtype,
                name="SampleWeights",
            )
            from dispu_tpu.nn.attention import adaptive_sampling

            new_xyz, new_feature = adaptive_sampling(
                sw, grouped_xyz, new_point, self.as_neighbor, train
            )
        grouped_xyz = grouped_xyz - new_xyz[:, :, None, :]
        new_point = jnp.concatenate([grouped_xyz, new_point], axis=-1)

        if self.use_nonlocal:
            nl = PointNonLocalCell(
                bottleneck=max(32, c // 2), out_features=out_c,
                name="nonlocal", **kw,
            )(feature, new_feature[:, None, :, :], train)[:, 0]

        skip = PointConv(out_c, name="skip", **kw)(
            jnp.max(new_point, axis=2), train
        )

        y = new_point
        for i, ch in enumerate(self.mlp[:-1]):
            y = PointConv(ch, name=f"conv{i}", **kw)(y, train)
        w = WeightNetHidden(
            (32,), bn_momentum=self.bn_momentum, dtype=self.dtype,
            name="weight_net",
        )(grouped_xyz, train)                  # (b, np, ns, 32)
        y = jnp.einsum("bnkc,bnkt->bnct", y, w)
        y = y.reshape(b, self.npoint, -1)
        y = PointConv(out_c, name="after_conv", **kw)(y, train)
        y = y + skip
        if self.use_nonlocal:
            y = y + nl
        return new_xyz, PointConv(out_c, name="aggregation", **kw)(y, train)


class PointDownscale(nn.Module):
    """FPS + attention-weighted xyz re-positioning.

    Parity: ref:Common/ops.py:624-657 — FPS seeds, group ``nsample``
    neighbors, a single-channel ``SampleWeights`` head over the first
    ``as_neighbor`` of them, and the weighted xyz sum as the output
    'offset' (it is an absolute position, the reference name
    notwithstanding).  Returns (new_xyz, new_offset), both (b, npoint, 3).
    """

    npoint: int
    nsample: int
    use_bn: bool = True
    bn_momentum: float = 0.95
    use_knn: bool = True
    radius: Optional[float] = None
    as_neighbor: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, xyz: jnp.ndarray, feature: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b, n, _ = feature.shape
        if n == self.npoint:
            new_xyz = xyz
        else:
            new_xyz, _ = _fps_with_features(self.npoint, xyz, feature)
        group_xyz, group_feature, _ = grouping(
            feature, self.nsample, xyz, new_xyz, use_knn=self.use_knn,
            radius=self.radius if self.radius is not None else 0.2,
        )
        sg_xyz = group_xyz[:, :, : self.as_neighbor, :]
        sg_pts = group_feature[:, :, : self.as_neighbor, :]
        w = SampleWeights(
            [32, 1], use_bn=self.use_bn, bn_momentum=self.bn_momentum,
            dtype=self.dtype, name="SampleWeights",
        )(sg_pts, sg_xyz, train)              # (b, np, as, 1)
        new_offset = jnp.sum(sg_xyz * w, axis=2)
        return new_xyz, new_offset


class PointDownscale2(nn.Module):
    """FPS + ``SampleOffset`` head → bounded per-seed offset.

    Parity: ref:Common/ops.py:853-883.
    """

    npoint: int
    nsample: int
    use_bn: bool = True
    bn_momentum: float = 0.95
    use_knn: bool = True
    radius: Optional[float] = None
    as_neighbor: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, xyz: jnp.ndarray, feature: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b, n, _ = feature.shape
        if n == self.npoint:
            new_xyz = xyz
        else:
            new_xyz, _ = _fps_with_features(self.npoint, xyz, feature)
        group_xyz, group_feature, _ = grouping(
            feature, self.nsample, xyz, new_xyz, use_knn=self.use_knn,
            radius=self.radius if self.radius is not None else 0.2,
        )
        sg_xyz = group_xyz[:, :, : self.as_neighbor, :]
        sg_pts = group_feature[:, :, : self.as_neighbor, :]
        offset = SampleOffset(
            [32, 3], use_bn=self.use_bn, bn_momentum=self.bn_momentum,
            dtype=self.dtype, name="SampleOffset",
        )(sg_pts, sg_xyz, train)
        return new_xyz, offset


class PointDownscale3(nn.Module):
    """FPS + attention feature pooling + MLP offset head.

    Parity: ref:Common/ops.py:659-713 — ``SampleWeights`` over the first
    ``as_neighbor`` neighbors with a [C, C] head, weighted feature sum,
    optional 16-channel gaussian noise concat, then an MLP [C, 64, 3]
    with the optional ±0.5 sigmoid squash.
    """

    npoint: int
    nsample: int
    use_bn: bool = False
    bn_momentum: float = 0.95
    use_knn: bool = True
    radius: Optional[float] = None
    as_neighbor: int = 8
    use_noise: bool = False
    use_sm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        xyz: jnp.ndarray,
        feature: jnp.ndarray,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b, n, _ = feature.shape
        if n == self.npoint:
            new_xyz = xyz
        else:
            new_xyz, _ = _fps_with_features(self.npoint, xyz, feature)
        group_xyz, group_feature, _ = grouping(
            feature, self.nsample, xyz, new_xyz, use_knn=self.use_knn,
            radius=self.radius if self.radius is not None else 0.2,
        )
        c = group_feature.shape[-1]
        sg_xyz = group_xyz[:, :, : self.as_neighbor, :]
        sg_pts = group_feature[:, :, : self.as_neighbor, :]
        w = SampleWeights(
            [c, c], use_bn=self.use_bn, bn_momentum=self.bn_momentum,
            dtype=self.dtype, name="SampleWeights",
        )(sg_pts, sg_xyz, train)
        new_feature = jnp.sum(sg_pts * w, axis=2)
        if self.use_noise:
            noise = jax.random.normal(
                self.make_rng("noise"),
                new_feature.shape[:-1] + (16,), self.dtype,
            )
            new_feature = jnp.concatenate([new_feature, noise], axis=-1)
        out = PointMLP(
            (c, 64, 3), last_activation=None, use_bn=self.use_bn,
            bn_momentum=self.bn_momentum, dtype=self.dtype, name="mlp2",
        )(new_feature, train)
        if self.use_sm:
            out = nn.sigmoid(out) - 0.5  # range_max = 0.5
        return new_xyz, out


class PointDownscale3_1(nn.Module):
    """The full ASNL-style downscaler with a coordinate head.

    Parity: ref:Common/ops.py:715-795 — the PointASNLSetAbstraction body
    (translation-normalized local cell with an ``nsample``-wide weight
    net, skip, optional non-local, fusion) followed by a 128→64→3
    coordinate MLP and the optional sigmoid squash.
    """

    npoint: int
    nsample: int
    mlp: Sequence[int]
    use_bn: bool = False
    bn_momentum: float = 0.95
    use_knn: bool = True
    radius: Optional[float] = None
    use_nonlocal: bool = True
    use_sm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, xyz: jnp.ndarray, feature: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b, n, c = feature.shape
        out_c = self.mlp[-1]
        kw = dict(use_bn=self.use_bn, bn_momentum=self.bn_momentum,
                  dtype=self.dtype)
        if n == self.npoint:
            new_xyz, new_feature = xyz, feature
        else:
            new_xyz, new_feature = _fps_with_features(
                self.npoint, xyz, feature
            )
        grouped_xyz, new_point, _ = grouping(
            feature, self.nsample, xyz, new_xyz, use_knn=self.use_knn,
            radius=self.radius if self.radius is not None else 0.2,
        )
        grouped_xyz = grouped_xyz - new_xyz[:, :, None, :]
        new_point = jnp.concatenate([grouped_xyz, new_point], axis=-1)

        if self.use_nonlocal:
            nl = PointNonLocalCell(
                bottleneck=max(32, c // 2), out_features=out_c,
                name="nonlocal", **kw,
            )(feature, new_feature[:, None, :, :], train)[:, 0]

        skip = PointConv(out_c, name="skip", **kw)(
            jnp.max(new_point, axis=2), train
        )
        y = new_point
        for i, ch in enumerate(self.mlp[:-1]):
            y = PointConv(ch, name=f"conv{i}", **kw)(y, train)
        w = WeightNetHidden(
            (self.nsample,), bn_momentum=self.bn_momentum,
            dtype=self.dtype, name="weight_net",
        )(grouped_xyz, train)
        y = jnp.einsum("bnkc,bnkt->bnct", y, w)
        y = y.reshape(b, self.npoint, -1)
        y = PointConv(out_c, name="after_conv", **kw)(y, train)
        y = y + skip
        if self.use_nonlocal:
            y = y + nl
        y = PointConv(out_c, name="aggregation", **kw)(y, train)

        coord = PointMLP(
            (128, 64, 3), last_activation=None, dtype=self.dtype,
            name="coord",
        )(y, train)
        if self.use_sm:
            coord = nn.sigmoid(coord) - 0.5
        return new_xyz, coord


class PointDownscale4(nn.Module):
    """FPS + PointNet-style max-pooled neighborhood + MLP offset head.

    Parity: ref:Common/ops.py:797-851 — the reference hard-codes
    ``nsample = 32`` inside the body; two per-edge convs [C, C], max-pool
    over neighbors, optional noise concat, MLP [C, 64, 3], sigmoid squash.
    """

    npoint: int
    nsample: int = 32  # the reference overrides its argument with 32
    use_bn: bool = False
    bn_momentum: float = 0.95
    use_knn: bool = True
    radius: Optional[float] = None
    use_noise: bool = False
    use_sm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, xyz: jnp.ndarray, feature: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b, n, _ = feature.shape
        if n == self.npoint:
            new_xyz = xyz
        else:
            new_xyz, _ = _fps_with_features(self.npoint, xyz, feature)
        _, group_feature, _ = grouping(
            feature, self.nsample, xyz, new_xyz, use_knn=self.use_knn,
            radius=self.radius if self.radius is not None else 0.2,
        )
        c = feature.shape[-1]
        y = group_feature
        y = PointConv(c, use_bn=self.use_bn, bn_momentum=self.bn_momentum,
                      dtype=self.dtype, name="mlp1_2_0")(y, train)
        y = PointConv(c, activation=None, dtype=self.dtype,
                      name="mlp1_2_1")(y, train)
        new_feature = jnp.max(y, axis=2)
        if self.use_noise:
            noise = jax.random.normal(
                self.make_rng("noise"),
                new_feature.shape[:-1] + (16,), self.dtype,
            )
            new_feature = jnp.concatenate([new_feature, noise], axis=-1)
        out = PointMLP(
            (c, 64, 3), last_activation=None, use_bn=self.use_bn,
            bn_momentum=self.bn_momentum, dtype=self.dtype, name="mlp2",
        )(new_feature, train)
        if self.use_sm:
            out = nn.sigmoid(out) - 0.5
        return new_xyz, out


class PointShuffleV1(nn.Module):
    """The refiner's first iteration: attention-pooled feature shuffle.

    Parity: ref:Common/ops.py:982-1010 (``PointShuffle``) — kNN(16) group,
    ``SampleWeights`` over the first ``nsample`` neighbors, weighted
    feature sum.  The reference sizes the weight head from the *xyz*
    channel count (3), which only broadcasts when the features are
    3-channel; we size it from the feature channels (the evident intent,
    and ``PointDownscale3``'s identical pattern).
    """

    nsample: int
    use_bn: bool = True
    bn_momentum: float = 0.95
    use_knn: bool = True
    radius: Optional[float] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, xyz: jnp.ndarray, feature: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        group_xyz, group_feature, _ = grouping(
            feature, 16, xyz, xyz, use_knn=self.use_knn,
            radius=self.radius if self.radius is not None else 0.2,
        )
        c = group_feature.shape[-1]
        sg_xyz = group_xyz[:, :, : self.nsample, :]
        sg_pts = group_feature[:, :, : self.nsample, :]
        w = SampleWeights(
            [c, c], use_bn=self.use_bn, bn_momentum=self.bn_momentum,
            dtype=self.dtype, name="SampleWeights",
        )(sg_pts, sg_xyz, train)
        return jnp.sum(sg_pts * w, axis=2)


# --------------------------------------------------------------------------
# shuffle-based upsampling family
# --------------------------------------------------------------------------


def point_shuffler(inputs: jnp.ndarray, scale: int = 2) -> jnp.ndarray:
    """Channel→point pixel-shuffle: (b, n, 1, c) → (b, n·scale, 1, c/scale).

    Parity: ref:Common/ops.py:1314-1322 — reshape the channel axis to
    (c/scale, scale), move the scale factor onto the point axis.
    """
    b, n, _, c = inputs.shape
    out = inputs.reshape(b, n, 1, c // scale, scale)
    out = jnp.transpose(out, (0, 1, 4, 3, 2))  # (b, n, scale, c/scale, 1)
    return out.reshape(b, n * scale, 1, c // scale)


def shuffle_down(inputs: jnp.ndarray, scale: int) -> jnp.ndarray:
    """NCHW pixel-unshuffle (ref:Common/ops.py:1295-1301, torch-style)."""
    b, c, ih, iw = inputs.shape
    oh, ow = ih // scale, iw // scale
    out = inputs.reshape(b, c, oh, scale, ow, scale)
    out = jnp.transpose(out, (0, 1, 5, 3, 2, 4))
    return out.reshape(b, -1, oh, ow)


def shuffle_up(inputs: jnp.ndarray, scale: int) -> jnp.ndarray:
    """NCHW pixel-shuffle (ref:Common/ops.py:1303-1312, torch-style)."""
    b, c, ih, iw = inputs.shape
    oc = c // (scale**2)
    out = inputs.reshape(b, oc, scale, scale, ih, iw)
    out = jnp.transpose(out, (0, 1, 4, 3, 5, 2))
    return out.reshape(b, oc, ih * scale, iw * scale)


class UpShuffleLayer(nn.Module):
    """r-fold channel-expansion + point shuffle.

    Parity: ref:Common/ops.py:894-915.  ``variant=1``: the (n, c, r)
    reshape + transpose ordering of ``up_shuffle_layer``; ``variant=2``:
    the direct (n, r, c) reshape of ``up_shuffle_layer2``.
    """

    up_ratio: int = 4
    variant: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feature: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, n, c = feature.shape
        r = self.up_ratio
        out = PointConv(r * c, dtype=self.dtype, name="up_shuffle_layer1")(
            feature, train
        )
        if self.variant == 1:
            out = out.reshape(b, n, c, r)
            out = jnp.swapaxes(out, 2, 3)
        else:
            out = out.reshape(b, n, r, c)
        return out.reshape(b, n * r, c)


class UpShuffleLayer3(nn.Module):
    """conv → EdgeConv channel expansion → point shuffle.

    Parity: ref:Common/ops.py:917-947 (``up_shuffle_layer3`` and its
    ``_raw`` twin — identical graphs; layer3's ``up_xyz`` computation is
    dead code, and ``PointUpscale`` calls it with the feature tensor in
    the ``pc`` slot, ref:Common/ops.py:1281).
    """

    up_ratio: int = 4
    k: int = 16
    use_bn: bool = False
    bn_momentum: float = 0.95
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feature: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, n, c = feature.shape
        r = self.up_ratio
        feature = PointConv(
            c, use_bn=self.use_bn, bn_momentum=self.bn_momentum,
            dtype=self.dtype, name="up_shuffle_layer0",
        )(feature, train)
        up = EdgeConv(
            r * c, k=self.k, use_bn=self.use_bn,
            bn_momentum=self.bn_momentum, dtype=self.dtype,
            name="up_shuffle_layer1",
        )(feature, train)
        return up.reshape(b, n, r, c).reshape(b, n * r, c)


class UpShuffleLayer4(nn.Module):
    """Edge-feature fold/expand upsampler.

    Parity: ref:Common/ops.py:949-980 — kNN edge features (b, n, k, 2c);
    a [1, r]-stride-r conv folds groups of r neighbors into r·2c channels
    (≡ dense over each non-overlapping window); the channel axis is
    re-split (2c-major) back onto the neighbor axis; original and folded
    edge stacks concatenate to 2k neighbors; a full [1, 2k] conv reduces
    them to r·c channels, reshaped to r points of c channels each.
    """

    up_ratio: int = 4
    k: int = 16
    use_bn: bool = False
    bn_momentum: float = 0.95
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feature: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, n, c = feature.shape
        r, k = self.up_ratio, self.k
        edges, _ = edge_feature(feature, k)      # (b, n, k, 2c)
        cc = edges.shape[-1]
        kw = dict(use_bn=self.use_bn, bn_momentum=self.bn_momentum,
                  dtype=self.dtype)
        # [1, r] stride [1, r] conv ≡ dense over each window of r neighbors
        win = edges.reshape(b, n, k // r, r * cc)
        tmp = PointConv(r * cc, name="up_shuffle_layer0", **kw)(win, train)
        tmp = jnp.swapaxes(tmp, 2, 3)            # (b, n, r·cc, k/r)
        tmp = tmp.reshape(b, n, cc, r, k // r).reshape(b, n, cc, k)
        tmp = jnp.swapaxes(tmp, 2, 3)            # (b, n, k, cc)
        merged = jnp.concatenate([edges, tmp], axis=2)  # (b, n, 2k, cc)
        # [1, 2k] conv ≡ dense over the flattened neighbor window
        merged = merged.reshape(b, n, 2 * k * cc)
        out = PointConv(cc // 2 * r, name="up_shuffle_layer1", **kw)(
            merged, train
        )
        return out.reshape(b, n, r, cc // 2).reshape(b, n * r, cc // 2)


class UpShuffleLayer5(nn.Module):
    """2× edge upsampler with a learned xyz/feature attention gate.

    Parity: ref:Common/ops.py:1114-1150 — edge features of both the
    feature tensor and the xyz tensor; gate = conv(edge_feat)·conv(edge_pc)
    → conv → softmax over neighbors; pairs of neighbors fold to 2·2c
    channels and re-expand gated; concat + full-window conv to 2·2c,
    emitted as 2 points of 2c channels.
    """

    k: int = 16
    use_bn: bool = False
    bn_momentum: float = 0.95
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, pc: jnp.ndarray, feature: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        b, n, c = feature.shape
        k = self.k
        kw = dict(use_bn=self.use_bn, bn_momentum=self.bn_momentum,
                  dtype=self.dtype)
        edges, idx = edge_feature(feature, k)    # (b, n, k, 2c)
        edge_pc, _ = edge_feature(pc, k, idx=idx)  # (b, n, k, 6)
        cc = edges.shape[-1]
        w_feat = PointConv(cc, name="w_feat", **kw)(edges, train)
        w_pc = PointConv(cc, name="w_pc", **kw)(edge_pc, train)
        w = PointConv(cc, name="w", **kw)(w_feat * w_pc, train)
        w = nn.softmax(w, axis=-2)
        win = edges.reshape(b, n, k // 2, 2 * cc)
        tmp = PointConv(2 * cc, name="up_shuffle_layer0", **kw)(win, train)
        tmp = jnp.swapaxes(tmp, 2, 3)            # (b, n, 2cc, k/2)
        tmp = tmp.reshape(b, n, cc, 2, k // 2).reshape(b, n, cc, k)
        tmp = jnp.swapaxes(tmp, 2, 3) * w        # (b, n, k, cc)
        merged = jnp.concatenate([edges, tmp], axis=2).reshape(
            b, n, 2 * k * cc
        )
        out = PointConv(2 * cc, name="up_shuffle_layer1", **kw)(merged, train)
        return out.reshape(b, n, 2, cc).reshape(b, 2 * n, cc)


class DuplicateUpEdge(nn.Module):
    """Grid-code duplication followed by two EdgeConv mixing layers.

    Parity: ref:Common/ops.py:1201-1236 — tile features r times (r-major),
    append the 2D grid code, then EdgeConv(256) → EdgeConv(128) on
    feature-space kNN graphs of the duplicated set.
    """

    up_ratio: int = 4
    k: int = 16
    use_bn: bool = False
    bn_momentum: float = 0.95
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feature: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, n, _ = feature.shape
        grid = gen_grid(self.up_ratio).astype(self.dtype)
        grid = jnp.repeat(grid, n, axis=0)
        grid = jnp.broadcast_to(grid[None], (b,) + grid.shape)
        net = jnp.tile(feature, (1, self.up_ratio, 1))
        net = jnp.concatenate([net, grid], axis=-1)
        kw = dict(use_bn=self.use_bn, bn_momentum=self.bn_momentum,
                  dtype=self.dtype)
        net = EdgeConv(256, k=self.k, name="shuffle_layer_0", **kw)(net, train)
        net = EdgeConv(128, k=self.k, name="shuffle_layer_1", **kw)(net, train)
        return net


class DuplicateUp2(nn.Module):
    """Duplication with a *global* (patch-wide) grid code.

    Parity: ref:Common/ops.py:1238-1262 — the grid spans all
    ``patch_num·up_ratio`` output points (one unique 2D code per output
    point, vs ``duplicate_up``'s r codes tiled), then conv 256 → conv 128.
    """

    up_ratio: int = 4
    patch_num: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feature: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, n, _ = feature.shape
        grid = gen_grid(self.patch_num * self.up_ratio).astype(self.dtype)
        grid = grid[: n * self.up_ratio]
        grid = jnp.broadcast_to(grid[None], (b,) + grid.shape)
        net = jnp.tile(feature, (1, self.up_ratio, 1))
        net = jnp.concatenate([net, grid], axis=-1)
        net = PointConv(256, dtype=self.dtype, name="conv1")(net, train)
        net = PointConv(128, dtype=self.dtype, name="conv2")(net, train)
        return net


class PointUpscale(nn.Module):
    """Shuffle-upsample features, regress coordinates.

    Parity: ref:Common/ops.py:1264-1293 — ``up_shuffle_layer3`` (the
    reference passes the feature tensor in the pc slot; the xyz path is
    dead code either way) followed by a C → 128 → 64 → 3 coordinate MLP.
    """

    npoint: int
    k: int = 16
    use_bn: bool = False
    bn_momentum: float = 0.95
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feature: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, n, c = feature.shape
        up = UpShuffleLayer3(
            up_ratio=self.npoint // n, k=self.k, use_bn=self.use_bn,
            bn_momentum=self.bn_momentum, dtype=self.dtype,
            name="up_shuffle_layer3",
        )(feature, train)
        coord = PointMLP(
            (c, 128, 64), use_bn=False, activation=nn.relu,
            last_activation=nn.relu, dtype=self.dtype, name="coord",
        )(up, train)
        return PointConv(
            3, activation=None, dtype=self.dtype, name="coord_layer3"
        )(coord, train)


# --------------------------------------------------------------------------
# extractor aliases + misc units
# --------------------------------------------------------------------------


def feature_extraction_down(**kwargs) -> nn.Module:
    """Two pointwise lifts, 32 → 64 channels.

    Parity: ref:Common/ops.py:1368-1386 — despite the name there is no
    downsampling: just conv(32) → conv(64) per point.
    """
    return PointMLP(
        (32, 64), last_activation=nn.relu,
        name=kwargs.pop("name", "feature_extraction_down"), **kwargs,
    )


def feature_extraction_up(growth_rate: int = 24, use_bn: bool = False,
                          **kwargs) -> nn.Module:
    """4-block dense EdgeConv extractor.

    Parity: ref:Common/ops.py:1388-1434 — channel-for-channel the same
    graph as ``feature_extraction_GCN(dense_block=4)`` (the running
    concatenation is carried through the ``l{k}_features`` names instead
    of ``out_feat``; the inline channel comments in the reference are
    stale).  480 output channels at growth 24.
    """
    return FeatureExtractorGCN(
        growth_rate=growth_rate, dense_block=4, use_bn=use_bn,
        name=kwargs.pop("name", "feature_extraction_up"), **kwargs,
    )


def feature_extraction_up2(growth_rate: int = 24, **kwargs) -> nn.Module:
    """Parity: ref:Common/ops.py:1488-1534 — ``feature_extraction_up``
    with ``use_bn`` pinned False."""
    return FeatureExtractorGCN(
        growth_rate=growth_rate, dense_block=4, use_bn=False,
        name=kwargs.pop("name", "feature_extraction_up2"), **kwargs,
    )


class WeightLearningUnit(nn.Module):
    """Grid-conditioned weight bank contracted against the input features.

    Parity: ref:Common/ops.py:1588-1617 — a 1D grid + ratio code runs
    through three convs to produce per-slot weights, contracted against
    the inputs to give (b, n, 1, n·r) scores.  The reference's final
    matmul contracts mismatched channel counts (dim vs dim·r — a latent
    shape bug; the op has no callers); we project the weights back to
    ``dim`` so the contraction is well-defined, preserving the intended
    data flow.
    """

    up_ratio: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, n, _, dim = inputs.shape
        r = self.up_ratio
        # 1D grid code in [-0.2, 0.2] + the ratio constant
        grid = jnp.linspace(-0.2, 0.2, r, dtype=self.dtype)[:, None]
        code = jnp.concatenate(
            [grid, jnp.full_like(grid, float(r))], axis=1
        )  # (r, 2)
        w = jnp.broadcast_to(code[None, None], (b, n, r, 2))
        w = PointConv(dim, activation=None, dtype=self.dtype, name="conv_1")(
            w, train
        )
        w = PointConv(dim * r, activation=None, dtype=self.dtype,
                      name="conv_2")(w, train)
        w = PointConv(dim, activation=None, dtype=self.dtype, name="conv_3")(
            w, train
        )
        s = jnp.einsum(
            "bqc,bkc->bqk", inputs.reshape(b, n, dim), w.reshape(b, n * r, dim)
        )
        return s[:, :, None, :]  # (b, n, 1, n·r)


class CoordinateReconstructionUnit(nn.Module):
    """64 → 3 coordinate head over (b, n, s, c) tensors.

    Parity: ref:Common/ops.py:1620-1635 — conv(64, relu) → conv(3, linear),
    squeezing the singleton sample axis.
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = PointConv(64, dtype=self.dtype, name="fc_layer1")(inputs, train)
        x = PointConv(3, activation=None, dtype=self.dtype, name="fc_layer2")(
            x, train
        )
        return jnp.squeeze(x, axis=2)


class InstanceNorm(nn.Module):
    """Instance normalization over the point axes with learned shift/scale.

    Parity: ref:Common/ops.py:1676-1689.  The reference divides by
    ``(σ² + ε)²`` instead of ``sqrt(σ² + ε)`` — a latent bug in dead code;
    the default here is standard instance norm, and ``faithful=True``
    reproduces the reference formula bit-for-bit.
    """

    epsilon: float = 1e-3
    faithful: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, net: jnp.ndarray) -> jnp.ndarray:
        c = net.shape[-1]
        axes = tuple(range(1, net.ndim - 1))
        mu = jnp.mean(net, axis=axes, keepdims=True)
        var = jnp.var(net, axis=axes, keepdims=True)
        shift = self.param("shift", nn.initializers.zeros, (c,), self.dtype)
        scale = self.param("scale", nn.initializers.ones, (c,), self.dtype)
        if self.faithful:
            normalized = (net - mu) / jnp.square(var + self.epsilon)
        else:
            normalized = (net - mu) * jax.lax.rsqrt(var + self.epsilon)
        return scale * normalized + shift
