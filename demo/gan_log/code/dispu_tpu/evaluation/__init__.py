"""Evaluation stack: on-device metrics replacing the reference's
evaluate.py + CGAL binary (ref:evaluation_code/evaluation.cpp)."""

from dispu_tpu.evaluation.meshio import read_off, read_xyz, write_xyz
from dispu_tpu.evaluation.metrics import (
    cd_hd,
    geodesic_distances,
    point_to_mesh_distance,
    uniformity_measure,
)
from dispu_tpu.evaluation.report import evaluate_dirs

__all__ = [
    "read_off",
    "read_xyz",
    "write_xyz",
    "cd_hd",
    "geodesic_distances",
    "point_to_mesh_distance",
    "uniformity_measure",
    "evaluate_dirs",
]
