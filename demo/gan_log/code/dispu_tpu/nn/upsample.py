"""Feature duplication upsampling and coordinate regression heads."""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from dispu_tpu.nn.layers import PointConv
from dispu_tpu.ops.geometry import gen_grid


class DuplicateUp(nn.Module):
    """r-fold feature duplication with a 2D grid code, then two MLP layers.

    Output ordering is r-major: output point ``r·N + n`` carries the feature
    of input point ``n`` and grid code ``r``.

    Parity: ref:Common/ops.py:1152-1199 (``duplicate_up`` with the default
    ``atten=False, edge=False`` used by the generator,
    ref:DisPU/generator.py:52-53) — tile features r times, append the
    ``gen_grid`` code, conv 256 → conv 128 (both ReLU, no BN).
    """

    up_ratio: int = 4
    hidden: int = 256
    out_features: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feature: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, n, _ = feature.shape
        grid = gen_grid(self.up_ratio).astype(self.dtype)  # (r, 2)
        # r-major: [g0]*n, [g1]*n, ... paired with [f0..fn-1] tiled r times
        grid = jnp.repeat(grid, n, axis=0)  # (r*n, 2)
        grid = jnp.broadcast_to(grid[None], (b,) + grid.shape)
        net = jnp.tile(feature, (1, self.up_ratio, 1))  # (b, r*n, c)
        net = jnp.concatenate([net, grid], axis=-1)
        net = PointConv(self.hidden, dtype=self.dtype, name="conv1")(net, train)
        net = PointConv(self.out_features, dtype=self.dtype, name="conv2")(
            net, train
        )
        return net


class ContractExpand(nn.Module):
    """Fold the r duplicates, mix, and re-expand (PU-GAN refinement op).

    Parity: ref:Common/ops.py:1537-1570 (``contract_expand_operation``):
    (b, r·n, c) → fold to (b, n, r, c) → dense over the fold window → expand
    back through a c·r dense → (b, r·n, c).  All weight-decayed ReLU convs
    in the reference; plain ReLU denses here (decay handled by the
    optimizer when configured).
    """

    up_ratio: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, rn, c = inputs.shape
        r = self.up_ratio
        n = rn // r
        net = inputs.reshape(b, r, n, c).swapaxes(1, 2)  # (b, n, r, c)
        net = PointConv(c, dtype=self.dtype, name="down_conv1")(
            net.reshape(b, n, r * c), train
        )
        net = PointConv(c * r, dtype=self.dtype, name="down_conv2")(net, train)
        net = net.reshape(b, n, r, c)
        net = PointConv(c, dtype=self.dtype, name="down_conv3")(net, train)
        return net.swapaxes(1, 2).reshape(b, rn, c)


class UpBlock(nn.Module):
    """PU-GAN-style up block: grid duplication + self-attention + MLPs.

    Parity: ref:Common/ops.py:1325-1349 (kept for op-library parity; the
    default Dis-PU generator uses ``DuplicateUp`` without attention).
    """

    up_ratio: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feature: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from dispu_tpu.nn.attention import AttentionUnit

        b, n, _ = feature.shape
        grid = gen_grid(self.up_ratio).astype(self.dtype)
        grid = jnp.repeat(grid, n, axis=0)
        grid = jnp.broadcast_to(grid[None], (b,) + grid.shape)
        net = jnp.tile(feature, (1, self.up_ratio, 1))
        net = jnp.concatenate([net, grid], axis=-1)
        net = AttentionUnit(dtype=self.dtype, name="attention")(net, train)
        net = PointConv(256, dtype=self.dtype, name="conv1")(net, train)
        net = PointConv(128, dtype=self.dtype, name="conv2")(net, train)
        return net


class DownBlock(nn.Module):
    """PU-GAN-style down block: fold the r duplicates back into one point.

    Parity: ref:Common/ops.py:1351-1366 — reshape (b, r·n, c) → (b, n, r·c)
    respecting the r-major duplication order, then two dense layers (the
    reference's [1, r] conv over the fold is exactly a dense over the
    flattened (r, c) window).
    """

    up_ratio: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feature: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, rn, c = feature.shape
        n = rn // self.up_ratio
        net = feature.reshape(b, self.up_ratio, n, c)
        net = jnp.swapaxes(net, 1, 2).reshape(b, n, self.up_ratio * c)
        net = PointConv(256, dtype=self.dtype, name="conv1")(net, train)
        net = PointConv(128, dtype=self.dtype, name="conv2")(net, train)
        return net


class UpProjectionUnit(nn.Module):
    """Back-projection upsampler: up, down, correct, up again.

    Parity: ref:Common/ops.py:1572-1586 — H2 = up(L) + up(down(up(L)) − L).
    """

    up_ratio: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feature: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        l = PointConv(128, dtype=self.dtype, name="conv0")(feature, train)
        h0 = UpBlock(self.up_ratio, dtype=self.dtype, name="up_0")(l, train)
        l0 = DownBlock(self.up_ratio, dtype=self.dtype, name="down_0")(h0, train)
        e0 = l0 - l
        h1 = UpBlock(self.up_ratio, dtype=self.dtype, name="up_1")(e0, train)
        return h0 + h1


class CoordinateRegressor(nn.Module):
    """Per-point MLP head regressing xyz (or a bounded xyz offset).

    Parity: ref:Common/ops.py:1089-1110 — 256 → 64 → 3, no BN; when
    ``offset_range`` is set the output is squashed to
    ``sigmoid(x)·2·range − range`` (ref lines 1106-1108).
    """

    offset_range: Optional[float] = None
    hidden0: int = 256
    hidden1: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feature: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = PointConv(self.hidden0, dtype=self.dtype, name="fc_layer0")(
            feature, train
        )
        x = PointConv(self.hidden1, dtype=self.dtype, name="fc_layer1")(x, train)
        x = PointConv(3, activation=None, dtype=self.dtype, name="fc_layer2")(
            x, train
        )
        if self.offset_range is not None:
            r = self.offset_range
            x = nn.sigmoid(x) * (2.0 * r) - r
        return x
