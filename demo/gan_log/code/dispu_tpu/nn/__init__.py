"""Neural building blocks (flax.linen) for the Dis-PU model family."""

from dispu_tpu.nn.layers import PointConv, PointMLP, WeightNetHidden
from dispu_tpu.nn.edgeconv import (
    edge_feature,
    DenseEdgeBlock,
    EdgeConv,
    FeatureExtractorGCN,
)
from dispu_tpu.nn.attention import (
    PointNonLocalCell,
    SampleWeights,
    AttentionUnit,
    adaptive_sampling,
)
from dispu_tpu.nn.upsample import DuplicateUp, CoordinateRegressor
from dispu_tpu.nn.refine import PointShuffle2

__all__ = [
    "PointConv",
    "PointMLP",
    "WeightNetHidden",
    "edge_feature",
    "DenseEdgeBlock",
    "EdgeConv",
    "FeatureExtractorGCN",
    "PointNonLocalCell",
    "SampleWeights",
    "AttentionUnit",
    "adaptive_sampling",
    "DuplicateUp",
    "CoordinateRegressor",
    "PointShuffle2",
]
