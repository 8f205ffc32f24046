"""ctypes bindings for the native host library (native/dispu_native.cpp).

Host-side counterparts of the reference's non-TF native components
(SURVEY.md §2.1 N10-N13).  The TPU compute path never calls these — the
on-device ops in ``dispu_tpu.ops`` replace them; they exist for host
tooling (CPU preprocessing, offline evaluation) and as an independent
implementation to parity-test the device ops against.

The library is built on demand with ``make -C native`` (g++, OpenMP).
``available()`` reports whether the shared object could be loaded; callers
should gracefully fall back to the JAX/numpy implementations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_LIB_PATH = os.path.join(_LIB_DIR, "libdispu_native.so")
_lib: Optional[ctypes.CDLL] = None


def build(force: bool = False) -> bool:
    """Compile the shared library (no-op if current). Returns success."""
    if not force and os.path.exists(_LIB_PATH) and os.path.getmtime(
        _LIB_PATH
    ) >= os.path.getmtime(os.path.join(_LIB_DIR, "dispu_native.cpp")):
        return True
    try:
        subprocess.run(
            ["make", "-C", _LIB_DIR], check=True, capture_output=True
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.dispu_knn_batch.argtypes = [
        f32p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        i32p, f32p,
    ]
    lib.dispu_knn.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, f32p, ctypes.c_int, ctypes.c_int,
        i32p, f32p,
    ]
    lib.dispu_knn_batch_distance_pick.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_uint64, f32p, i32p,
    ]
    lib.dispu_grid_subsample.argtypes = [
        f32p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_float, f32p, f32p,
        ctypes.c_int,
    ]
    lib.dispu_grid_subsample.restype = ctypes.c_int
    lib.dispu_render_points.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p,
    ]
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.dispu_render_ball.argtypes = [
        ctypes.c_int, ctypes.c_int, u8p, ctypes.c_int, i32p,
        f32p, f32p, f32p, ctypes.c_int,
    ]
    lib.dispu_point_to_mesh.argtypes = [
        f32p, ctypes.c_int, f32p, ctypes.c_int, i32p, ctypes.c_int, f32p, f32p,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _f32(a: np.ndarray):
    return np.ascontiguousarray(a, np.float32)


def _ptr(a: np.ndarray, t=ctypes.c_float):
    return a.ctypes.data_as(ctypes.POINTER(t))


def knn_batch(
    support: np.ndarray, queries: np.ndarray, k: int, return_dist: bool = False
):
    """Exact batched KD-tree kNN on host (ref:libs/nearest_neighbors parity).

    support (b, n, 3), queries (b, m, 3) → idx (b, m, k) int32 [, d2].
    """
    lib = _load()
    assert lib is not None, "native library unavailable"
    support = _f32(support)
    queries = _f32(queries)
    b, n, _ = support.shape
    m = queries.shape[1]
    idx = np.empty((b, m, k), np.int32)
    d2 = np.empty((b, m, k), np.float32) if return_dist else None
    lib.dispu_knn_batch(
        _ptr(support), _ptr(queries), b, n, m, k,
        _ptr(idx, ctypes.c_int32),
        _ptr(d2) if return_dist else ctypes.cast(None, ctypes.POINTER(ctypes.c_float)),
    )
    return (idx, d2) if return_dist else idx


def knn(
    pts: np.ndarray, queries: np.ndarray, k: int, return_dist: bool = False
):
    """Single-cloud exact kNN on host, any dimensionality.

    Drop-in for ref:libs/nearest_neighbors/knn.pyx:33-71 (``knn``):
    pts (n, dim), queries (m, dim) → idx (m, k) int64, ascending by
    distance (plus squared distances with ``return_dist``).
    """
    lib = _load()
    assert lib is not None, "native library unavailable"
    pts = _f32(pts)
    queries = _f32(queries)
    n, dim = pts.shape
    m = queries.shape[0]
    assert queries.shape[1] == dim
    idx = np.empty((m, k), np.int32)
    d2 = np.empty((m, k), np.float32) if return_dist else None
    lib.dispu_knn(
        _ptr(pts), n, dim, _ptr(queries), m, k,
        _ptr(idx, ctypes.c_int32),
        _ptr(d2) if return_dist else ctypes.cast(None, ctypes.POINTER(ctypes.c_float)),
    )
    idx64 = idx.astype(np.int64)
    return (idx64, d2) if return_dist else idx64


def knn_batch_distance_pick(
    pts: np.ndarray, nqueries: int, k: int, seed: int = 0
):
    """Coverage-balanced query picking + kNN (the reference's
    "distance pick": repeatedly kNN around a random least-used point).

    Drop-in for ref:libs/nearest_neighbors/knn.pyx:115-148
    (``knn_batch_distance_pick``): pts (b, n, dim) →
    (idx (b, nqueries, k) int64, queries (b, nqueries, dim) f32), except
    the RNG is caller-seeded for reproducibility (the reference seeds from
    time(0), and its OpenMP variant races the shared stream).
    """
    lib = _load()
    assert lib is not None, "native library unavailable"
    pts = _f32(pts)
    b, n, dim = pts.shape
    idx = np.empty((b, nqueries, k), np.int32)
    queries = np.empty((b, nqueries, dim), np.float32)
    lib.dispu_knn_batch_distance_pick(
        _ptr(pts), b, n, dim, nqueries, k, ctypes.c_uint64(seed),
        _ptr(queries), _ptr(idx, ctypes.c_int32),
    )
    return idx.astype(np.int64), queries


def grid_subsample(
    points: np.ndarray,
    cell: float,
    features: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Voxel-grid barycenter subsampling (ref:libs/cpp_wrappers parity)."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    points = _f32(points)
    n = len(points)
    fdim = features.shape[1] if features is not None else 0
    out_p = np.empty((n, 3), np.float32)
    out_f = np.empty((n, fdim), np.float32) if fdim else None
    feats = _f32(features) if features is not None else None
    cnt = lib.dispu_grid_subsample(
        _ptr(points),
        _ptr(feats) if feats is not None else ctypes.cast(None, ctypes.POINTER(ctypes.c_float)),
        n, fdim, cell, _ptr(out_p),
        _ptr(out_f) if out_f is not None else ctypes.cast(None, ctypes.POINTER(ctypes.c_float)),
        n,
    )
    return out_p[:cnt].copy(), (out_f[:cnt].copy() if out_f is not None else None)


def render_points(points: np.ndarray, size: int = 500, radius: int = 5):
    """Z-buffer ball render (ref:tf_ops/renderball parity)."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    points = _f32(points)
    img = np.empty((size, size), np.float32)
    lib.dispu_render_points(_ptr(points), len(points), size, radius, _ptr(img))
    return img


def render_ball(
    h: int,
    w: int,
    xyzs: np.ndarray,
    c0: np.ndarray,
    c1: np.ndarray,
    c2: np.ndarray,
    radius: int = 8,
) -> np.ndarray:
    """The reference's color ball renderer, faithfully.

    Args:
      xyzs: (n, 3) int32 pixel-space coordinates (x row, y col, z depth).
      c0/c1/c2: (n,) float colors, 0..255 scale.
      radius: ball radius in pixels.

    Returns:
      (h, w, 3) uint8 image.  Channel order and shading match
      ref:tf_ops/renderball/render_balls_so.cpp:14-57 exactly (including
      its out[0]=b*c2 / out[1]=g*c0 / out[2]=r*c1 quirk).
    """
    import ctypes

    lib = _load()
    assert lib is not None, "native library unavailable"
    xyzs = np.ascontiguousarray(xyzs, np.int32)
    n = len(xyzs)
    img = np.zeros((h, w, 3), np.uint8)
    lib.dispu_render_ball(
        h, w, img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n,
        xyzs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        _ptr(_f32(c0)), _ptr(_f32(c1)), _ptr(_f32(c2)), radius,
    )
    return img


def point_to_mesh(points: np.ndarray, verts: np.ndarray, faces: np.ndarray):
    """Exact point→mesh distances + mapped points, multithreaded on host
    (independent check of dispu_tpu.evaluation.metrics.point_to_mesh_distance)."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    points = _f32(points)
    verts = _f32(verts)
    faces = np.ascontiguousarray(faces, np.int32)
    dist = np.empty(len(points), np.float32)
    nearest = np.empty((len(points), 3), np.float32)
    lib.dispu_point_to_mesh(
        _ptr(points), len(points), _ptr(verts), len(verts),
        _ptr(faces, ctypes.c_int32), len(faces), _ptr(dist), _ptr(nearest),
    )
    return dist, nearest
