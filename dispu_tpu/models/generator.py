"""The Dis-PU generator: disentangled dense generation + spatial refinement.

Parity: ref:DisPU/generator.py:21-88.

Structure (4× default, 256 → 1024 points):
  dense generator (scope ``generator``):
    FeatureExtractorGCN  — DenseGCN backbone, 480-ch features per point
    DuplicateUp ×num_up_steps — r-fold duplication + grid code → 128 ch
    CoordinateRegressor  — 'coarse' xyz
  spatial refiner (scope ``refine``):
    PointShuffle2        — local+non-local refinement features
    CoordinateRegressor(offset) — bounded offset; fine = coarse + offset

TPU notes: everything is static-shaped and fully fused under one jit; the
hot FLOPs are the EdgeConv dense blocks (12 edge-MLP matmuls over
(B·N·K, C) — MXU) and the kNN distance matmuls.  ``jax.checkpoint`` can be
applied around the feature extractor by the train step to trade FLOPs for
HBM when scaling batch.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from dispu_tpu.config import GeneratorConfig
from dispu_tpu.nn.edgeconv import FeatureExtractorGCN
from dispu_tpu.nn.refine import PointShuffle2
from dispu_tpu.nn.upsample import CoordinateRegressor, DuplicateUp


class DisPUGenerator(nn.Module):
    """(b, n, 3) sparse patch → (coarse, fine) each (b, r·n, 3)."""

    cfg: GeneratorConfig = GeneratorConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, inputs: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        kw = dict(use_bn=cfg.use_bn, bn_momentum=cfg.bn_momentum,
                  dtype=self.dtype)

        # ---- dense generator ------------------------------------------
        feat = FeatureExtractorGCN(
            growth_rate=cfg.growth_rate,
            dense_block=cfg.dense_block,
            dense_n=cfg.dense_n,
            k=cfg.knn,
            gather_impl=(
                ("fused_turbo" if cfg.fast_gather_backbone else "fused")
                if cfg.fused_grouping
                else ("onehot" if cfg.fast_gather_backbone
                      else cfg.gather_impl)
            ),
            knn_variant="packed" if cfg.fast_knn else "auto",
            dense_impl=cfg.dense_impl,
            name="feature_extraction_coarse",
            **kw,
        )(inputs, train)

        for i in range(cfg.num_up_steps):
            feat = DuplicateUp(
                up_ratio=cfg.step_ratio, dtype=self.dtype, name=f"upshuffle_{i}"
            )(feat, train)

        coarse = CoordinateRegressor(
            dtype=self.dtype, name="coarse_coordinate_regressor"
        )(feat, train)
        # geometry (xyz) always flows in f32, whatever the NN compute dtype:
        # the refiner's kNN and the losses depend on coordinate precision
        coarse = coarse.astype(jnp.float32)

        # ---- spatial refiner ------------------------------------------
        if not cfg.refine:
            return coarse, coarse

        fine_feat = feat
        if cfg.fine_extractor:
            extra = FeatureExtractorGCN(
                growth_rate=cfg.growth_rate,
                dense_block=2,
                dense_n=cfg.dense_n,
                k=cfg.knn,
                dense_impl=cfg.dense_impl,
                name="feature_extraction_fine",
                **kw,
            )(coarse, train)
            fine_feat = jnp.concatenate([extra, fine_feat], axis=-1)

        new_coarse, fine_feat = PointShuffle2(
            nsample=cfg.refine_nsample,
            mlp=tuple(cfg.refine_mlp),
            use_bn=cfg.use_bn,
            bn_momentum=cfg.bn_momentum,
            use_nonlocal=cfg.use_nonlocal,
            use_local=cfg.use_local,
            gather_impl=(
                ("fused_turbo" if cfg.fast_gather else "fused")
                if cfg.fused_grouping
                else ("onehot" if cfg.fast_gather else cfg.gather_impl)
            ),
            knn_variant="packed" if cfg.fast_knn else "auto",
            local_impl=cfg.refine_local_impl,
            dtype=self.dtype,
            name="PointShuffle",
        )(coarse, fine_feat, train)

        offset = CoordinateRegressor(
            offset_range=cfg.offset_range if cfg.is_off else None,
            dtype=self.dtype,
            name="fine_coordinate_regressor",
        )(fine_feat, train).astype(jnp.float32)

        fine = new_coarse + offset if cfg.is_off else offset
        return coarse, fine
