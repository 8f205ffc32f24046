"""Minimal mesh / point-cloud IO (OFF, xyz, ply-ascii points).

Replaces the reference's CGAL OFF reader (ref:evaluation_code/evaluation.cpp:136-147)
and pc_util loaders (ref:Common/pc_util.py:276-459) for the formats the
pipeline actually uses.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def read_off(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Read an OFF mesh → (vertices (v, 3) f32, faces (f, 3) i32).

    Handles the common header variants ('OFF' on its own line or fused with
    the counts) and polygonal faces (fan-triangulated).
    """
    with open(path) as f:
        tokens = f.read().split()
    i = 0
    if tokens[0].upper().startswith("OFF"):
        rest = tokens[0][3:]
        i = 1
        if rest:  # 'OFF3 5 0' style fused header
            tokens.insert(1, rest)
    nv, nf = int(tokens[i]), int(tokens[i + 1])
    i += 3  # skip edge count
    verts = np.array(tokens[i : i + 3 * nv], np.float32).reshape(nv, 3)
    i += 3 * nv
    faces = []
    for _ in range(nf):
        k = int(tokens[i])
        poly = [int(t) for t in tokens[i + 1 : i + 1 + k]]
        i += 1 + k
        for j in range(1, k - 1):  # fan triangulation
            faces.append((poly[0], poly[j], poly[j + 1]))
    return verts, np.asarray(faces, np.int32)


def read_xyz(path: str) -> np.ndarray:
    """Whitespace-separated point file → (n, >=3) float32."""
    return np.loadtxt(path, dtype=np.float32)


def write_xyz(path: str, points: np.ndarray, fmt: str = "%.6f") -> None:
    """Parity with ref:DisPU/model.py:381 (np.savetxt '%.6f')."""
    np.savetxt(path, np.asarray(points), fmt=fmt)


def mesh_face_areas(verts: np.ndarray, faces: np.ndarray) -> np.ndarray:
    a = verts[faces[:, 1]] - verts[faces[:, 0]]
    b = verts[faces[:, 2]] - verts[faces[:, 0]]
    return 0.5 * np.linalg.norm(np.cross(a, b), axis=-1)


def sample_mesh_surface(
    verts: np.ndarray, faces: np.ndarray, n: int, seed: int = 0
) -> np.ndarray:
    """Area-weighted uniform surface samples (the CGAL binary's random seed
    generator, ref:evaluation_code/evaluation.cpp:230-248)."""
    rng = np.random.RandomState(seed)
    areas = mesh_face_areas(verts, faces)
    probs = areas / areas.sum()
    fi = rng.choice(len(faces), size=n, p=probs)
    u = rng.rand(n, 1)
    v = rng.rand(n, 1)
    flip = (u + v) > 1.0
    u = np.where(flip, 1.0 - u, u)
    v = np.where(flip, 1.0 - v, v)
    tri = verts[faces[fi]]
    return (
        tri[:, 0]
        + u * (tri[:, 1] - tri[:, 0])
        + v * (tri[:, 2] - tri[:, 0])
    ).astype(np.float32)
