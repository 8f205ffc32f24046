"""Attention cells used by the refiner and optional modules.

The non-local cell's global map grows quadratically with the cloud: at
the training/pass-1 size (1024²) XLA's einsum+softmax composition is
near-roofline, but at the 16× second pass (32 × 4096²) it round-trips a
2.1 GB map through HBM.  ``PointNonLocalCell`` therefore dispatches its
attention core to the VMEM-resident Pallas kernel
(:func:`dispu_tpu.ops.pallas_kernels.attention_pallas`) on TPU for large
maps; the einsum form stays the fallback (and the reference semantics —
values agree to bf16-matmul rounding, both paths contract at single-pass
bf16 with f32 accumulation).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dispu_tpu.nn.layers import PointConv, PointMLP


def global_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    impl: str = "auto",
) -> jnp.ndarray:
    """``softmax(scale·q·kᵀ)·v`` with TPU Pallas dispatch.

    impl: 'auto' (Pallas kernel on TPU when K/V fit VMEM and the map is
    large enough to pay the launch), 'xla', or 'pallas' (forced; runs in
    interpreter mode off-TPU for tests).
    """
    b, nq, c = q.shape
    nk, cv = v.shape[1], v.shape[2]
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    fits = nk <= 8192 and c <= 256 and cv <= 256
    if impl == "pallas" or (impl == "auto" and on_tpu and fits
                            and nq * nk >= 512 * 512):
        from dispu_tpu.ops.pallas_kernels import attention_pallas_diff

        return attention_pallas_diff(
            q, k, v, scale, 256, impl == "pallas" and not on_tpu
        )
    from dispu_tpu.ops.pallas_kernels import attention_xla

    return attention_xla(q, k, v, scale)


class PointNonLocalCell(nn.Module):
    """Global (non-local) QKV attention from query points to the full cloud.

    Parity: ref:Common/ops.py:302-346 (mode='dot') — K/V from a single
    fused projection of the dataset features, Q from the query tensor,
    scaled dot-product softmax over the dataset axis, then an output
    projection (ReLU, the reference conv2d default).

    Shapes: feature (b, nd, c); new_point (b, np, ns, c) →
    (b, np, ns, out_features).
    """

    bottleneck: int
    out_features: int
    use_bn: bool = False
    bn_momentum: float = 0.95
    scaled: bool = True
    attn_impl: str = "auto"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, feature: jnp.ndarray, new_point: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        b, np_, ns, _ = new_point.shape
        bc = self.bottleneck
        kw = dict(use_bn=self.use_bn, bn_momentum=self.bn_momentum,
                  dtype=self.dtype)
        kv = PointConv(2 * bc, activation=None, name="conv_kv", **kw)(
            feature, train
        )  # (b, nd, 2bc)
        q = PointConv(bc, activation=None, name="conv_query", **kw)(
            new_point, train
        ).reshape(b, np_ * ns, bc)
        keys, values = kv[..., :bc], kv[..., bc:]
        scale = 1.0 / float(bc) ** 0.5 if self.scaled else 1.0
        out = global_attention(
            q, keys, values, scale, impl=self.attn_impl
        ).reshape(b, np_, ns, bc)
        return PointConv(
            self.out_features, activation=nn.relu, name="conv_back_project", **kw
        )(out, train)


class SampleWeights(nn.Module):
    """Self-attention over a neighborhood producing per-neighbor weights.

    Parity: ref:Common/ops.py:193-232 — xyz re-centered on the *first*
    neighbor, concatenated to features; a QKV attention within the
    neighborhood; an MLP head; softmax over the neighbor axis.
    """

    mlps: Sequence[int]
    use_bn: bool = True
    bn_momentum: float = 0.95
    scaled: bool = True
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
        kv = PointConv(2 * bc, activation=None, name="conv_kv_ds", **kw)(x, train)
        q = PointConv(bc, activation=None, name="conv_query_ds", **kw)(x, train)
        keys, values = kv[..., :bc], kv[..., bc:]
        attn = jnp.einsum("bnsc,bntc->bnst", q, keys)
        if self.scaled:
            attn = attn / jnp.sqrt(jnp.asarray(bc, attn.dtype))
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bnst,bntc->bnsc", attn, values)
        out = PointMLP(
            tuple(self.mlps), last_activation=None, name="mlp2", **kw
        )(out, train)
        return nn.softmax(out, axis=2)


def adaptive_sampling(
    sample_weights_module: SampleWeights,
    group_xyz: jnp.ndarray,
    group_feature: jnp.ndarray,
    num_neighbor: int,
    train: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted re-positioning of query points from their neighborhoods.

    Parity: ref:Common/ops.py:283-299 (``AdaptiveSampling``) — the first
    weight channel re-positions xyz, the rest re-weight features.
    """
    if num_neighbor == 0:
        return group_xyz[:, :, 0, :], group_feature[:, :, 0, :]
    sg_xyz = group_xyz[:, :, :num_neighbor, :]
    sg_feat = group_feature[:, :, :num_neighbor, :]
    w = sample_weights_module(sg_feat, sg_xyz, train)
    new_xyz = jnp.sum(sg_xyz * w[..., :1], axis=2)
    new_feat = jnp.sum(sg_feat * w[..., 1:], axis=2)
    return new_xyz, new_feat


class AttentionUnit(nn.Module):
    """Self-attention with a learned residual gate (SAGAN-style).

    Parity: ref:Common/ops.py:1637-1670 — f/g projections at C/4, h at C,
    softmax(g·fᵀ) over points, gamma-gated residual (gamma init 0).
    """

    use_bn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dim = x.shape[-1]
        layer = dim // 4
        shape = x.shape
        kw = dict(use_bn=self.use_bn, dtype=self.dtype)
        f = PointConv(layer, activation=nn.relu, name="conv_f", **kw)(x, train)
        g = PointConv(layer, activation=nn.relu, name="conv_g", **kw)(x, train)
        h = PointConv(dim, activation=nn.relu, name="conv_h", **kw)(x, train)
        flat = lambda t: t.reshape(shape[0], -1, t.shape[-1])
        s = jnp.einsum("bnc,bmc->bnm", flat(g), flat(f))
        beta = nn.softmax(s, axis=-1)
        o = jnp.einsum("bnm,bmc->bnc", beta, flat(h)).reshape(shape)
        gamma = self.param("gamma", nn.initializers.zeros, (1,), self.dtype)
        return gamma * o + x
