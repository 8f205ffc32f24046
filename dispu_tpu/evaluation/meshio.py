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


def read_ply(path: str) -> np.ndarray:
    """Read vertex positions from an ASCII or binary_little_endian PLY.

    Self-contained (the environment has no plyfile/open3d); covers the
    point-cloud PLYs the reference tooling reads/writes
    (ref:Common/pc_util.py:276-459).
    """
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii").strip()
            header.append(line)
            if line == "end_header":
                break
        fmt = next(l.split()[1] for l in header if l.startswith("format"))
        counts = {}
        props = []
        current = None
        for l in header:
            t = l.split()
            if t and t[0] == "element":
                current = t[1]
                counts[current] = int(t[2])
                props.append((current, []))
            elif t and t[0] == "property" and current is not None:
                if t[1] == "list":
                    props[-1][1].append(("list", t[2], t[3], t[4]))
                else:
                    props[-1][1].append((t[1], t[2]))
        nv = counts.get("vertex", 0)
        vprops = dict(props).get("vertex", [])
        names = [p[-1] for p in vprops]
        np_types = {
            "float": "f4", "float32": "f4", "double": "f8", "float64": "f8",
            "uchar": "u1", "uint8": "u1", "char": "i1", "int8": "i1",
            "short": "i2", "int16": "i2", "ushort": "u2", "uint16": "u2",
            "int": "i4", "int32": "i4", "uint": "u4", "uint32": "u4",
        }
        if fmt == "ascii":
            rows = []
            for _ in range(nv):
                rows.append([float(x) for x in f.readline().split()])
            data = np.asarray(rows, np.float64)
        else:
            dtype = np.dtype(
                [(n, "<" + np_types[t]) for (t, n) in vprops]
            )
            raw = np.frombuffer(f.read(nv * dtype.itemsize), dtype=dtype)
            data = np.stack(
                [raw[n].astype(np.float64) for n in names], axis=-1
            )
        cols = [names.index(c) for c in ("x", "y", "z")]
        return data[:, cols].astype(np.float32)


def write_ply(path: str, points: np.ndarray) -> None:
    """Write a point cloud as ASCII PLY (vertex x y z)."""
    points = np.asarray(points, np.float32)
    with open(path, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\nelement vertex %d\n"
            "property float x\nproperty float y\nproperty float z\n"
            "end_header\n" % len(points)
        )
        for p in points:
            f.write("%.6f %.6f %.6f\n" % (p[0], p[1], p[2]))


def load_points(path: str) -> np.ndarray:
    """Load a point cloud by extension (.xyz/.txt/.ply) —
    ref:Common/pc_util.py ``load`` dispatcher equivalent."""
    if path.endswith(".ply"):
        return read_ply(path)
    return read_xyz(path)[:, :3]


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
    verts: np.ndarray,
    faces: np.ndarray,
    n: int,
    seed: int = 0,
    return_faces: bool = False,
):
    """Area-weighted uniform surface samples (the CGAL binary's random seed
    generator, ref:evaluation_code/evaluation.cpp:230-248).  With
    ``return_faces`` also returns each sample's source face index (the
    ``Face_location`` analog for geodesic disks)."""
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
    pts = (
        tri[:, 0]
        + u * (tri[:, 1] - tri[:, 0])
        + v * (tri[:, 2] - tri[:, 0])
    ).astype(np.float32)
    if return_faces:
        return pts, fi.astype(np.int32)
    return pts
