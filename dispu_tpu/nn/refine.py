"""The spatial refiner core (PointShuffle2).

Parity: ref:Common/ops.py:1012-1087.  The reference routed its xyz kNN
through a host-side nanoflann call (``tf.py_func`` → CPU → back, a sync
point every training step, ref:Common/ops.py:165); here the kNN is one MXU
matmul + top_k on device, so the whole refiner is a single fused XLA
computation.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from dispu_tpu.nn.attention import PointNonLocalCell, SampleWeights, adaptive_sampling
from dispu_tpu.nn.layers import PointConv, WeightNetHidden
from dispu_tpu.ops.grouping import grouping


class PointShuffle2(nn.Module):
    """Local + non-local feature refinement around each (coarse) point.

    Pipeline (all shapes static):
      1. kNN-group xyz+features (k = ``nsample``).
      2. local branch: per-edge MLP → learned pooling weights
         (``WeightNetHidden`` over centered xyz) → feature×weight matmul →
         flatten → dense.
      3. skip branch: max-pool the raw grouped features → dense.
      4. non-local branch: global QKV attention over the whole cloud.
      5. sum the branches, fuse with a final dense.

    The grouped feature layout follows the reference exactly:
    ``[centered_xyz(3) | raw_neighbor_xyz(3) | neighbor_features(C)]``
    (the raw xyz comes from ``grouping(use_xyz=True)``, the centered copy is
    prepended at ref:Common/ops.py:1035-1036).
    """

    nsample: int = 16
    mlp: Tuple[int, ...] = (128, 128, 256)
    use_bn: bool = False
    bn_momentum: float = 0.95
    use_knn: bool = True
    radius: Optional[float] = None
    use_nonlocal: bool = True     # 'NL'
    use_local: bool = True        # 'Local'
    refine_point: bool = False
    # feature-gather impl: 'gather' | 'onehot' (bf16 MXU) | 'onehot_hp' |
    # 'pallas' (bit-exact MXU, see ops.grouping.group_point) | 'fused' /
    # 'fused_turbo' (one kNN+gather kernel; knn_variant is then ignored —
    # the fused selection is the exact mask-out sequence)
    gather_impl: str = "gather"
    # xyz-kNN selection: 'auto' (exact) | 'packed' (turbo — see ops.knn.knn)
    knn_variant: str = "auto"
    # local+skip branch evaluation: 'xla' (composed Dense/einsum chain) or
    # 'fused' — one Pallas kernel per 128-point tile that keeps every
    # (b, n, k, ·) intermediate in VMEM (ops.pallas_kernels.
    # refine_local_pallas).  Inference-only (no autodiff rule; train=True
    # and module init keep the composed path), f32 params only, same
    # checkpoint layout.  MEASURED NEGATIVE on chip (PERFORMANCE.md
    # round-5): loses end-to-end (the opaque kernel boundary forces the
    # grouped tensor to materialize) and its in-kernel dots run at
    # bf16 grade under Mosaic — kept as a tested option.
    local_impl: str = "xla"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, xyz: jnp.ndarray, feature: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b, n, c = feature.shape
        k = self.nsample
        out_c = self.mlp[-1]
        kw = dict(use_bn=self.use_bn, bn_momentum=self.bn_momentum,
                  dtype=self.dtype)

        fusable = (
            not train
            and not self.is_initializing()
            and not self.use_bn
            and len(self.mlp) == 3
            and jnp.dtype(self.dtype) == jnp.float32
        )
        # 'megafused' additionally skips the grouping: kNN + gathers +
        # local MLP + skip run in ONE kernel with no grouped tensor
        mega = (
            self.local_impl == "megafused" and fusable
            and self.use_knn and not self.refine_point and self.use_local
            and k <= 16
        )
        if mega:
            grouped_xyz = grouped_feat = centered = None
        else:
            grouped_xyz, grouped_feat, _ = grouping(
                feature, k, xyz, xyz, use_xyz=True, use_knn=self.use_knn,
                radius=self.radius if self.radius is not None else 0.2,
                gather_impl=self.gather_impl,
                knn_variant=self.knn_variant,
            )
            centered = grouped_xyz - xyz[:, :, None, :]
            grouped_feat = jnp.concatenate(
                [centered, grouped_feat], axis=-1
            )

        new_xyz, new_feat = xyz, feature
        if self.refine_point:
            sw = SampleWeights([c, c], use_bn=self.use_bn,
                               bn_momentum=self.bn_momentum,
                               dtype=self.dtype, name="noise_refine")
            new_xyz, new_feat = adaptive_sampling(
                sw, centered, grouped_feat, k, train
            )

        if self.use_nonlocal:
            nl = PointNonLocalCell(
                bottleneck=max(32, c // 2),
                out_features=out_c,
                name="nonlocal", **kw,
            )(feature, new_feat[:, None, :, :], train)[:, 0]  # (b, n, out_c)

        skip_mod = PointConv(out_c, name="skip", **kw)
        conv_mods = [
            PointConv(ch, name=f"conv{i}", **kw)
            for i, ch in enumerate(self.mlp[:-1])
        ]
        wnet_mod = WeightNetHidden(
            (k,), bn_momentum=self.bn_momentum, dtype=self.dtype,
            name="weight_net",
        )
        # width entering the weighted pooling: the last hidden conv's
        # features, or the raw grouped width when mlp[:-1] is empty
        c_prime = (self.mlp[-2] if len(self.mlp) > 1 else 6 + c)
        after_mod = PointConv(out_c, name="after_conv",
                              kernel_row_perm=(c_prime, k), **kw)

        use_fused = self.local_impl == "fused" and fusable and n % 128 == 0
        if mega:
            y = self._mega_local(
                conv_mods, wnet_mod, skip_mod, after_mod,
                xyz, feature, c_prime, out_c, k,
            )
        elif use_fused:
            y = self._fused_local(
                conv_mods, wnet_mod, skip_mod, after_mod,
                grouped_feat, c_prime, out_c, k,
            )
        else:
            # skip connection: max over neighbors then dense
            skip = skip_mod(jnp.max(grouped_feat, axis=2), train)

            # local branch
            y = grouped_feat
            for mod in conv_mods:
                y = mod(y, train)
            w = wnet_mod(centered, train)          # (b, n, k, k)
            # feature^T @ weights, computed in the transpose-free operand
            # order: the big (b,n,k,C') tensor is already laid out
            # (K=k, N=C') for the MXU, so contracting as w^T·y avoids
            # relayouting 0.5 GB (only the tiny (k,k) plane transposes);
            # the flatten is therefore k-major and ``after_conv`` permutes
            # its kernel rows instead (stored layout stays the reference's
            # C'-major (C',S) plane, ref:Common/ops.py:1064-1072 —
            # checkpoints/converter unchanged).  -0.7 ms vs the
            # (b,n,C',k) form at b=64 on v5e, same values to f32 round-off.
            y = jnp.einsum("bnkt,bnkc->bntc", w, y)
            y = y.reshape(b, n, -1)            # flatten (k, C'), k-major
            y = after_mod(y, train)

            y = y + skip
        if self.use_nonlocal and self.use_local:
            y = y + nl
        elif self.use_nonlocal:
            y = nl

        out = PointConv(out_c, name="aggregation", **kw)(y, train)
        return new_xyz, out

    def _local_branch_params(self, conv_mods, wnet_mod, skip_mod,
                             after_mod, cf, c_prime, out_c, k):
        """Materialize the local-branch submodule params via shape-correct
        dummy calls (their names/shapes stay exactly the composed path's —
        checkpoints, the TF converter, and the XLA path are untouched)
        and return the raw Dense params, with the weight-net's inference
        BN affine folded into its kernel/bias (running stats are
        constants at train=False) and the after_conv kernel as t-major
        row blocks (the same permutation _PermutedRowDense applies)."""
        import jax

        from dispu_tpu.nn.layers import BN_EPSILON

        z = jnp.zeros
        conv_mods[0](z((1, 1, 1, cf), jnp.float32), False)
        conv_mods[1](z((1, 1, 1, conv_mods[0].features), jnp.float32), False)
        wnet_mod(z((1, 1, 1, 3), jnp.float32), False)
        skip_mod(z((1, 1, cf), jnp.float32), False)
        after_mod(z((1, 1, k * c_prime), jnp.float32), False)

        def dense_params(mod):
            v = mod.variables["params"]["dense"]
            return v["kernel"], v["bias"]

        w0, b0 = dense_params(conv_mods[0])
        w1, b1 = dense_params(conv_mods[1])
        wsk, bsk = dense_params(skip_mod)
        waf, baf = dense_params(after_mod)
        wn_p = wnet_mod.variables["params"]["wconv0"]
        wn_s = wnet_mod.variables["batch_stats"]["wconv0"]["bn"]
        sc = wn_p["bn"]["scale"] * jax.lax.rsqrt(wn_s["var"] + BN_EPSILON)
        ww = wn_p["dense"]["kernel"] * sc[None, :]
        bw = (wn_p["dense"]["bias"] - wn_s["mean"]) * sc + wn_p["bn"]["bias"]
        waf3 = waf.reshape(c_prime, k, out_c).swapaxes(0, 1)
        return w0, b0, w1, b1, ww, bw, wsk, bsk, waf3, baf

    def _fused_local(self, conv_mods, wnet_mod, skip_mod, after_mod,
                     grouped_feat, c_prime, out_c, k):
        """Local+skip branch through the fused Pallas kernel (consumes
        the already-grouped tensor; see refine_local_pallas)."""
        import jax

        from dispu_tpu.ops.pallas_kernels import refine_local_pallas

        params = self._local_branch_params(
            conv_mods, wnet_mod, skip_mod, after_mod,
            grouped_feat.shape[-1], c_prime, out_c, k,
        )
        return refine_local_pallas(
            grouped_feat, *params,
            # CPU (tests, dryruns): Mosaic cannot lower — run the kernel
            # in interpret mode so the flag stays functional everywhere
            interpret=jax.default_backend() in ("cpu",),
        )

    def _mega_local(self, conv_mods, wnet_mod, skip_mod, after_mod,
                    xyz, feature, c_prime, out_c, k):
        """kNN + gathers + local MLP + skip in ONE kernel — no grouped
        tensor exists at all (see refine_block_pallas; turbo grade)."""
        import jax

        from dispu_tpu.ops.pallas_kernels import refine_block_pallas

        params = self._local_branch_params(
            conv_mods, wnet_mod, skip_mod, after_mod,
            6 + feature.shape[-1], c_prime, out_c, k,
        )
        return refine_block_pallas(
            xyz, feature, *params,
            interpret=jax.default_backend() in ("cpu",),
        )
