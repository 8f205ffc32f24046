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


#: contrib.layers.batch_norm's default epsilon (the reference's BN,
#: ref:Common/tf_util.py:527) — flax's 1e-5 default deviates measurably at
#: inference with unit moving variance.  Shared with the fused refiner
#: kernel's BN fold (nn/refine._fused_local) so the two can never diverge.
BN_EPSILON = 1e-3


class _PermutedRowDense(nn.Module):
    """Dense whose stored kernel rows are (a, b)-major but whose input is
    (b, a)-major flattened.

    The (a·b, features) kernel param is identical in name, shape, init, and
    row convention to the plain ``nn.Dense`` it replaces — checkpoints and
    the TF converter are unaffected — only the *apply* permutes the kernel
    rows (a 2 MB shuffle) so the caller may feed the transposed-inner-dims
    flatten that avoids relayouting the big activation tensor (see
    ``PointShuffle2``: +0.7 ms/step at the refiner's (64·1024, 128, 16)
    weighted pooling, measured on v5e).
    """

    features: int
    inner: tuple  # (a, b): stored row order; input arrives (b, a)-major
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        a, b = self.inner
        kernel = self.param(
            "kernel", _glorot(), (a * b, self.features), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        k = (kernel.reshape(a, b, self.features)
             .swapaxes(0, 1)
             .reshape(a * b, self.features))
        x, k, bias = nn.dtypes.promote_dtype(x, k, bias, dtype=self.dtype)
        return x @ k + bias


class PointConv(nn.Module):
    """Dense-over-channels layer ≡ the reference's 1×1 conv1d/conv2d.

    Parity: ref:Common/tf_util.py:52-185 — xavier init, zero bias, optional
    batch norm (momentum = ``bn_decay``), then activation.

    ``kernel_row_perm=(a, b)`` keeps the stored kernel rows (a, b)-major
    (the reference/TF layout) while accepting input flattened (b, a)-major;
    see :class:`_PermutedRowDense`.
    """

    features: int
    activation: Optional[Callable] = nn.relu
    use_bn: bool = False
    bn_momentum: float = 0.95
    kernel_row_perm: Optional[tuple] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.kernel_row_perm is not None:
            x = _PermutedRowDense(
                self.features,
                inner=self.kernel_row_perm,
                dtype=self.dtype,
                name="dense",
            )(x)
        else:
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
                epsilon=BN_EPSILON,
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
