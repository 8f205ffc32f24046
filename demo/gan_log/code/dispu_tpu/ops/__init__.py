"""Fixed-shape, jit-friendly point-cloud ops (the TPU equivalents of the
reference's custom CUDA ops under ref:tf_ops/ and host libs under ref:libs/).

Every op here is a pure function over arrays with static shapes, so it can
live under ``jax.jit`` / ``shard_map`` and be fused by XLA.  Hot ops also
have Pallas TPU kernels (see ``dispu_tpu.ops.pallas_kernels``) selected via
``impl=`` arguments.
"""

from dispu_tpu.ops.geometry import (
    pairwise_sq_dist,
    normalize_point_cloud,
    gen_grid,
)
from dispu_tpu.ops.knn import knn, knn_unique, mask_duplicate_rows
from dispu_tpu.ops.sampling import (
    farthest_point_sample,
    farthest_point_sample_bucketed,
    gather_point,
    morton_codes,
    prob_sample,
    nonuniform_sample_indices,
)
from dispu_tpu.ops.grouping import query_ball_point, group_point, grouping
from dispu_tpu.ops.chamfer import nn_distance, chamfer_distance
from dispu_tpu.ops.emd import approx_match, match_cost, earth_mover_cost
from dispu_tpu.ops.interpolate import three_nn, three_interpolate

__all__ = [
    "pairwise_sq_dist",
    "normalize_point_cloud",
    "gen_grid",
    "knn",
    "knn_unique",
    "mask_duplicate_rows",
    "farthest_point_sample",
    "farthest_point_sample_bucketed",
    "morton_codes",
    "gather_point",
    "prob_sample",
    "nonuniform_sample_indices",
    "query_ball_point",
    "group_point",
    "grouping",
    "nn_distance",
    "chamfer_distance",
    "approx_match",
    "match_cost",
    "earth_mover_cost",
    "three_nn",
    "three_interpolate",
]
