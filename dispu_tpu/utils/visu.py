"""Point-cloud visualization: z-buffer splat renderer + matplotlib views.

Capability parity with ref:Common/pc_util.py:466-559 (``draw_point_cloud``,
``point_cloud_three_views``) and ref:Common/visu_utils.py:159-211
(``plot_pcd_three_views``), re-implemented from scratch: an orthographic
gaussian-splat z-buffer renderer in vectorized numpy (no per-point Python
loop over pixels) and a matplotlib 3-view figure writer.  Used for the
trainer's periodic image summaries (ref:DisPU/model.py:265-281).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import numpy as np


def euler_rotation(xrot: float, yrot: float, zrot: float) -> np.ndarray:
    """Rz @ Ry @ Rx rotation matrix from radians (replaces the vendored
    eulerangles lib, ref:Common/eulerangles.py:98-147)."""

    def rx(a):
        c, s = math.cos(a), math.sin(a)
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])

    def ry(a):
        c, s = math.cos(a), math.sin(a)
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])

    def rz(a):
        c, s = math.cos(a), math.sin(a)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])

    return rz(zrot) @ ry(yrot) @ rx(xrot)


def draw_point_cloud(
    points: np.ndarray,
    canvas_size: int = 500,
    space: float = 200.0,
    diameter: int = 25,
    xrot: float = 0.0,
    yrot: float = 0.0,
    zrot: float = 0.0,
    normalize: bool = True,
) -> np.ndarray:
    """Render one orthographic view as a (canvas, canvas) float image.

    Points nearer the camera (larger depth after rotation) draw brighter
    disks with a gaussian falloff; a z-buffer keeps the nearest splat.
    """
    img = np.zeros((canvas_size, canvas_size), np.float32)
    if points.shape[0] == 0:
        return img
    pts = np.asarray(points, np.float64)[:, :3]
    pts = pts @ euler_rotation(xrot, yrot, zrot).T
    if normalize:
        centroid = pts.mean(axis=0)
        pts = pts - centroid
        scale = np.abs(pts).max() or 1.0
        pts = pts / scale

    # draw far-to-near so near splats overwrite
    order = np.argsort(pts[:, 2])
    pts = pts[order]

    radius = diameter // 2
    dx, dy = np.meshgrid(
        np.arange(-radius, radius + 1), np.arange(-radius, radius + 1)
    )
    mask = (dx**2 + dy**2) <= radius**2
    kx, ky = dx[mask], dy[mask]
    falloff = np.exp(-((kx**2 + ky**2) / (radius**2)) * 4.0)

    cx = (pts[:, 0] * space + canvas_size / 2).astype(np.int64)
    cy = (pts[:, 1] * space + canvas_size / 2).astype(np.int64)
    depth = (pts[:, 2] + 1.0) / 2.0  # 0 far, 1 near

    px = cx[:, None] + kx[None, :]
    py = cy[:, None] + ky[None, :]
    val = depth[:, None] * falloff[None, :]
    valid = (px >= 0) & (px < canvas_size) & (py >= 0) & (py < canvas_size)
    np.maximum.at(img, (py[valid], px[valid]), val[valid].astype(np.float32))

    m = img.max()
    if m > 0:
        img /= m
    return img


def point_cloud_three_views(points: np.ndarray, canvas_size: int = 500) -> np.ndarray:
    """Three orthogonal views side by side → (canvas, 3·canvas) image.

    Parity: ref:Common/pc_util.py:545-559 (used for training image
    summaries).
    """
    views = [
        draw_point_cloud(points, canvas_size, xrot=110 / 180 * math.pi,
                         yrot=0, zrot=-45 / 180 * math.pi),
        draw_point_cloud(points, canvas_size, xrot=70 / 180 * math.pi,
                         yrot=0, zrot=135 / 180 * math.pi),
        draw_point_cloud(points, canvas_size, xrot=math.pi / 2, yrot=0,
                         zrot=math.pi / 2),
    ]
    return np.concatenate(views, axis=1)


def plot_pcd_three_views(
    filename: str,
    pcds: Sequence[np.ndarray],
    titles: Sequence[str],
    suptitle: str = "",
    sizes: Optional[Sequence[float]] = None,
    cmap: str = "Reds",
    zdir: str = "y",
    xlim=(-0.3, 0.3),
    ylim=(-0.3, 0.3),
    zlim=(-0.3, 0.3),
) -> None:
    """Matplotlib grid: one row per elevation/azim view, one column per
    cloud.  Parity: ref:Common/visu_utils.py:159-211."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if sizes is None:
        sizes = [0.5 for _ in pcds]
    fig = plt.figure(figsize=(len(pcds) * 3, 9))
    elevations = [30, 0, 90]
    for i, elev in enumerate(elevations):
        for j, (pcd, size) in enumerate(zip(pcds, sizes)):
            color = pcd[:, 0]
            ax = fig.add_subplot(
                3, len(pcds), i * len(pcds) + j + 1, projection="3d"
            )
            ax.view_init(elev, -45)
            ax.scatter(
                pcd[:, 0], pcd[:, 1], pcd[:, 2], zdir=zdir, c=color,
                s=size, cmap=cmap, vmin=-1.0, vmax=0.5,
            )
            ax.set_title(titles[j] if i == 0 else "")
            ax.set_axis_off()
            ax.set_xlim(xlim)
            ax.set_ylim(ylim)
            ax.set_zlim(zlim)
    plt.suptitle(suptitle)
    fig.savefig(filename)
    plt.close(fig)


class PointPool:
    """History buffer of generated point clouds (CycleGAN image pool).

    Parity: ref:Common/visu_utils.py:309-334 — while the pool is filling,
    ``query`` stores the input and returns it; once full, with probability
    0.5 it swaps the input for a randomly chosen stored batch and returns
    the old one, otherwise returns the input.  The reference defines it but
    never calls it; here it is wired (optionally) into the GAN step so the
    critic can train against a history of generator outputs —
    ``TrainConfig.fake_pool_size`` (default 0 = off, reference behavior).

    A seeded ``numpy.random.RandomState`` replaces the reference's global
    ``random`` module so training runs stay reproducible.
    """

    def __init__(self, pool_size: int = 20, rng=None):
        self.pool_size = pool_size
        self.points: list = []
        self.rng = rng if rng is not None else np.random.RandomState()

    def query(self, point: np.ndarray) -> np.ndarray:
        if self.pool_size == 0:
            return point
        if len(self.points) < self.pool_size:
            self.points.append(np.asarray(point).copy())
            return point
        if self.rng.rand() > 0.5:
            random_id = self.rng.randint(0, self.pool_size)
            tmp = self.points[random_id].copy()
            self.points[random_id] = np.asarray(point).copy()
            return tmp
        return point
