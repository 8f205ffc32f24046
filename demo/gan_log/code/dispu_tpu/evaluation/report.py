"""Directory-level evaluation producing evaluation.csv.

Parity: ref:evaluate.py:104-214 — per-file CD / hausdorff / p2f avg / p2f
std / uniform_{0,1}, plus a summary row of averages.  The reference needed
side files from the CGAL binary; here P2F and uniformity are computed
directly when a gt mesh (.off) is available.
"""

from __future__ import annotations

import csv
import os
from glob import glob
from typing import Optional

import numpy as np

from dispu_tpu.evaluation.meshio import (
    mesh_face_areas,
    read_off,
    read_xyz,
    sample_mesh_surface,
)
from dispu_tpu.evaluation.metrics import (
    cd_hd,
    geodesic_distances,
    point_to_mesh_distance,
    uniformity_measure,
)

PERCENTAGES = (0.008, 0.012)  # ref:evaluate.py:43
NUM_DISK_SEEDS = 1000         # ref:evaluation.cpp sample_number


def evaluate_pair(
    pred_path: str,
    gt_path: str,
    mesh_path: Optional[str] = None,
    num_disk_seeds: int = NUM_DISK_SEEDS,
    geodesic: bool = True,
) -> dict:
    import jax.numpy as jnp

    pred = read_xyz(pred_path)[:, :3]
    gt = read_xyz(gt_path)[:, :3]
    cd, hd = cd_hd(jnp.asarray(pred), jnp.asarray(gt))
    row = {
        "name": os.path.basename(pred_path),
        "CD": float(cd),
        "hausdorff": float(hd),
    }
    if mesh_path and os.path.isfile(mesh_path):
        verts, faces = read_off(mesh_path)
        d, mapped, point_faces = point_to_mesh_distance(
            pred, verts, faces, return_faces=True
        )
        row["p2f avg"] = float(np.nanmean(d))
        row["p2f std"] = float(np.nanstd(d))
        row["_p2f"] = d
        area = float(mesh_face_areas(verts, faces).sum())
        seeds, seed_faces = sample_mesh_surface(
            verts, faces, num_disk_seeds, return_faces=True
        )
        dists = (
            geodesic_distances(
                verts, faces, seeds, seed_faces, mapped, point_faces
            )
            if geodesic
            else None
        )
        uni = uniformity_measure(
            mapped, area, seeds, PERCENTAGES, seed_point_dists=dists
        )
        for i in range(len(PERCENTAGES)):
            row["uniform_%d" % i] = float(uni[i, 0])
    return row


def evaluate_dirs(
    pred_dir: str,
    gt_dir: str,
    mesh_dir: Optional[str] = None,
    out_csv: Optional[str] = None,
    num_disk_seeds: int = NUM_DISK_SEEDS,
    geodesic: bool = True,
) -> dict:
    """Evaluate all *.xyz in pred_dir against same-named gt files.

    Returns the summary row; writes evaluation.csv next to the predictions
    (same schema as ref:evaluate.py:105-143).
    """
    fieldnames = ["name", "CD", "hausdorff", "p2f avg", "p2f std"] + [
        "uniform_%d" % d for d in range(len(PERCENTAGES))
    ]
    gt_paths = {
        os.path.basename(p)[:-4]: p for p in glob(os.path.join(gt_dir, "*.xyz"))
    }
    rows, p2f_all = [], []
    for pred_path in sorted(glob(os.path.join(pred_dir, "*.xyz"))):
        name = os.path.basename(pred_path)[:-4]
        base = name.split("_X")[0]  # pred files are '<name>_X4.xyz'
        gt_path = gt_paths.get(name) or gt_paths.get(base)
        if gt_path is None:
            continue
        mesh_path = None
        if mesh_dir:
            cand = os.path.join(mesh_dir, base + ".off")
            mesh_path = cand if os.path.isfile(cand) else None
        row = evaluate_pair(pred_path, gt_path, mesh_path, num_disk_seeds,
                            geodesic=geodesic)
        if "_p2f" in row:
            p2f_all.append(row.pop("_p2f"))
        rows.append(row)

    summary = {
        "CD": float(np.mean([r["CD"] for r in rows])) if rows else float("nan"),
        "hausdorff": float(np.mean([r["hausdorff"] for r in rows]))
        if rows
        else float("nan"),
    }
    if p2f_all:
        cat = np.concatenate(p2f_all)
        summary["p2f avg"] = float(np.nanmean(cat))
        summary["p2f std"] = float(np.nanstd(cat))
    for i in range(len(PERCENTAGES)):
        vals = [r.get("uniform_%d" % i) for r in rows if "uniform_%d" % i in r]
        if vals:
            summary["uniform_%d" % i] = float(np.mean(vals))

    out_csv = out_csv or os.path.join(pred_dir, "evaluation.csv")
    with open(out_csv, "w", newline="") as f:
        writer = csv.DictWriter(
            f, fieldnames=fieldnames, restval="-", extrasaction="ignore"
        )
        writer.writeheader()
        for row in rows:
            writer.writerow(row)
        writer.writerow(summary)
    return summary
