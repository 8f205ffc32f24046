"""Per-point layer primitives.

The reference expresses every pointwise layer as a 1×1 TF convolution
(ref:Common/tf_util.py:52-185).  A 1×1 conv over a point axis *is* a dense
matmul over the channel axis, so on TPU these become ``flax.linen.Dense``
applied to (..., C) tensors — one big MXU matmul per layer with the bias +
activation fused in by XLA.  No NHWC/NCHW gymnastics needed.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp


def _glorot():
    # tf_util uses xavier (glorot uniform) init, ref:Common/tf_util.py:59,95-99
    return nn.initializers.glorot_uniform()


class PointConv(nn.Module):
    """Dense-over-channels layer ≡ the reference's 1×1 conv1d/conv2d.

    Parity: ref:Common/tf_util.py:52-185 — xavier init, zero bias, optional
    batch norm (momentum = ``bn_decay``), then activation.
    """

    features: int
    activation: Optional[Callable] = nn.relu
    use_bn: bool = False
    bn_momentum: float = 0.95
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Dense(
            self.features,
            kernel_init=_glorot(),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="dense",
        )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=self.bn_momentum,
                dtype=self.dtype,
                name="bn",
            )(x)
        if self.activation is not None:
            x = self.activation(x)
        return x


class PointMLP(nn.Module):
    """Stack of PointConvs; optionally no activation on the last layer.

    Covers the reference's repeated ``for c in mlp: conv(...)`` pattern
    (e.g. ref:Common/ops.py:225-230, ref:Common/tf_util2.py:17-62).
    """

    features: Sequence[int]
    last_activation: Optional[Callable] = None
    activation: Callable = nn.relu
    use_bn: bool = False
    bn_momentum: float = 0.95
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        n = len(self.features)
        for i, c in enumerate(self.features):
            act = self.activation if i < n - 1 else self.last_activation
            x = PointConv(
                c,
                activation=act,
                use_bn=self.use_bn,
                bn_momentum=self.bn_momentum,
                dtype=self.dtype,
                name=f"layer{i}",
            )(x, train)
        return x


class WeightNetHidden(nn.Module):
    """Small MLP over relative coordinates producing pooling weights.

    Parity: ref:Common/ops.py:181-191 — note the reference hard-codes
    ``bn=True`` here even when the rest of the model runs without BN, so
    this module always carries batch statistics.
    """

    hidden_units: Sequence[int]
    bn_momentum: float = 0.95
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xyz: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        net = xyz
        for i, h in enumerate(self.hidden_units):
            net = PointConv(
                h,
                activation=nn.relu,
                use_bn=True,
                bn_momentum=self.bn_momentum,
                dtype=self.dtype,
                name=f"wconv{i}",
            )(net, train)
        return net
