"""On-device evaluation metrics: CD/HD, point-to-face, uniformity.

Replaces ref:evaluate.py:34-102 (TF CD/HD graph + uniformity analysis) and
the CGAL binary's P2F/disk machinery (ref:evaluation_code/evaluation.cpp).
The P2F here is an exact brute-force point-to-triangle minimum over all
faces — at these sizes (≤ ~100k points × ~50k faces, chunked) it is a few
batched matmul-scale ops on TPU and needs no AABB tree; uniformity uses
euclidean disks on the mesh-projected points (the reference's geodesic
disks differ only on high-curvature meshes; the loss-side analog
ref:Common/loss_utils.py:238 makes the same approximation).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dispu_tpu.ops.chamfer import nn_distance
from dispu_tpu.ops.geometry import normalize_point_cloud


@jax.jit
def cd_hd(pred: jnp.ndarray, gt: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Chamfer + Hausdorff between two clouds, each unit-sphere normalized.

    Parity: ref:evaluate.py:36-41,157-162 — CD = mean(fwd) + mean(bwd) of
    squared NN distances; HD = max(fwd) + max(bwd).
    """
    pred_n, _, _ = normalize_point_cloud(pred[None])
    gt_n, _, _ = normalize_point_cloud(gt[None])
    fwd, _, bwd, _ = nn_distance(pred_n, gt_n)
    cd = jnp.mean(fwd) + jnp.mean(bwd)
    hd = jnp.max(fwd) + jnp.max(bwd)
    return cd, hd


def _point_triangle_sq_dist(p, a, b, c):
    """Exact squared distance from points to triangles (Eberly's method),
    fully vectorized over a (points, faces) grid."""
    ab = b - a
    ac = c - a
    ap = p - a
    d1 = jnp.sum(ab * ap, -1)
    d2 = jnp.sum(ac * ap, -1)
    bp = p - b
    d3 = jnp.sum(ab * bp, -1)
    d4 = jnp.sum(ac * bp, -1)
    cp = p - c
    d5 = jnp.sum(ab * cp, -1)
    d6 = jnp.sum(ac * cp, -1)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    denom = jnp.maximum(va + vb + vc, 1e-30)
    v = vb / denom
    w = vc / denom
    # interior projection
    proj = a + v[..., None] * ab + w[..., None] * ac

    # edge/vertex regions
    t_ab = jnp.clip(d1 / jnp.maximum(d1 - d3, 1e-30), 0.0, 1.0)
    p_ab = a + t_ab[..., None] * ab
    t_ac = jnp.clip(d2 / jnp.maximum(d2 - d6, 1e-30), 0.0, 1.0)
    p_ac = a + t_ac[..., None] * ac
    t_bc = jnp.clip(
        (d4 - d3) / jnp.maximum((d4 - d3) + (d5 - d6), 1e-30), 0.0, 1.0
    )
    p_bc = b + t_bc[..., None] * (c - b)

    in_vertex_a = (d1 <= 0) & (d2 <= 0)
    in_vertex_b = (d3 >= 0) & (d4 <= d3)
    in_vertex_c = (d6 >= 0) & (d5 <= d6)
    in_edge_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    in_edge_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    in_edge_bc = (va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0)

    nearest = proj
    nearest = jnp.where(in_edge_bc[..., None], p_bc, nearest)
    nearest = jnp.where(in_edge_ac[..., None], p_ac, nearest)
    nearest = jnp.where(in_edge_ab[..., None], p_ab, nearest)
    nearest = jnp.where(in_vertex_c[..., None], c, nearest)
    nearest = jnp.where(in_vertex_b[..., None], b, nearest)
    nearest = jnp.where(in_vertex_a[..., None], a, nearest)

    return jnp.sum((p - nearest) ** 2, -1), nearest


@functools.partial(jax.jit, static_argnames=("chunk",))
def _p2f_chunked(points, tri_a, tri_b, tri_c, chunk: int = 2048):
    """Min point-triangle distance, scanning over face chunks to bound HBM."""
    n_faces = tri_a.shape[0]
    pad = (-n_faces) % chunk
    if pad:
        # pad with a far-away degenerate triangle
        far = jnp.full((pad, 3), 1e6, tri_a.dtype)
        tri_a = jnp.concatenate([tri_a, far])
        tri_b = jnp.concatenate([tri_b, far])
        tri_c = jnp.concatenate([tri_c, far])
    n_chunks = tri_a.shape[0] // chunk
    ta = tri_a.reshape(n_chunks, chunk, 3)
    tb = tri_b.reshape(n_chunks, chunk, 3)
    tc = tri_c.reshape(n_chunks, chunk, 3)

    def body(carry, tri):
        best_d, best_p = carry
        a, b, c = tri
        d, nearest = _point_triangle_sq_dist(
            points[:, None, :], a[None], b[None], c[None]
        )  # (n_points, chunk)
        idx = jnp.argmin(d, axis=1)
        dmin = jnp.take_along_axis(d, idx[:, None], 1)[:, 0]
        pmin = jnp.take_along_axis(nearest, idx[:, None, None], 1)[:, 0]
        better = dmin < best_d
        return (
            jnp.where(better, dmin, best_d),
            jnp.where(better[:, None], pmin, best_p),
        ), None

    init = (
        jnp.full((points.shape[0],), jnp.inf, points.dtype),
        jnp.zeros_like(points),
    )
    (best_d, best_p), _ = jax.lax.scan(body, init, (ta, tb, tc))
    return jnp.sqrt(best_d), best_p


def point_to_mesh_distance(
    points: np.ndarray, verts: np.ndarray, faces: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-point distance to (and nearest point on) a triangle mesh.

    Parity: ref:evaluation_code/evaluation.cpp:202-212 (CGAL AABB-tree
    locate), exact to f32 — brute force over faces on device.

    Returns (distances (n,), mapped_points (n, 3)).
    """
    points = jnp.asarray(points, jnp.float32)
    tri = jnp.asarray(verts, jnp.float32)[jnp.asarray(faces, jnp.int32)]
    d, p = _p2f_chunked(points, tri[:, 0], tri[:, 1], tri[:, 2])
    return np.asarray(d), np.asarray(p)


def uniformity_measure(
    mapped_points: np.ndarray,
    mesh_area: float,
    seeds: np.ndarray,
    percentages=(0.008, 0.012),
) -> np.ndarray:
    """Disk-based uniformity χ² statistic.

    Parity: ref:evaluation_code/evaluation.cpp:68-115,259-311 +
    ref:evaluate.py:53-102 — for each of ``len(seeds)`` disks of radius
    √(area·p/π): coverage = (count − expected)²/expected; spacing deviation
    = mean((NN spacing − hexagon-ideal)²/ideal); measure = mean(coverage ·
    spacing) over disks.  Disks here are euclidean rather than geodesic.
    """
    out = np.zeros((len(percentages), 1), np.float64)
    n = mapped_points.shape[0]
    d2_seed = np.sum(
        (seeds[:, None, :] - mapped_points[None, :, :]) ** 2, -1
    )  # (s, n)
    for j, p in enumerate(percentages):
        radius = math.sqrt(mesh_area * p / math.pi)
        expected = p * n
        vals = []
        for s in range(seeds.shape[0]):
            members = np.where(d2_seed[s] < radius * radius)[0]
            density = len(members)
            coverage = (density - expected) ** 2 / expected
            if density < 5:
                continue
            disk = mapped_points[members]
            dd = np.sum((disk[:, None] - disk[None]) ** 2, -1)
            np.fill_diagonal(dd, np.inf)
            spacing = np.sqrt(dd.min(axis=1))
            disk_area = math.pi * radius**2 / density
            expect_d = math.sqrt(2 * disk_area / 1.732)  # hexagon ideal
            dev = np.mean((spacing - expect_d) ** 2 / expect_d)
            vals.append(coverage * dev)
        out[j, 0] = float(np.mean(vals)) if vals else float("nan")
    return out
