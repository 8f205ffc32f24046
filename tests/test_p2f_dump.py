"""--dump_p2f side files must be readable by the REFERENCE's own reader.

Writes predictions + side files through ``evaluate_pair(dump_p2f=True)``,
then executes the reference's ``analyze_uniform`` / ``cal_nearest_distance``
(ref:evaluate.py:45-102) — extracted verbatim from /root/reference at
runtime, tf_parity-style — on our files and checks the uniformity stats
match the ones our pipeline computed directly.
"""

import math
import os
import re

import numpy as np
import pytest

REF_EVAL = "/root/reference/evaluate.py"
REF_MESH = "/root/reference/data/test/Icosahedron.off"


def _load_reference_reader(sample_number: int):
    """Exec the reference's analyze_uniform + cal_nearest_distance.

    The function bodies are taken verbatim from the reference source; the
    only edit is the hard-coded ``sample_number = 1000`` literal, which is
    substituted with the test's seed count (the reference binary and
    reader agree on 1000 by convention, not by a shared parameter).
    """
    src = open(REF_EVAL).read()
    fn_srcs = []
    for name in ("cal_nearest_distance", "analyze_uniform"):
        m = re.search(
            r"^def %s\(.*?(?=^\S)" % name, src, re.S | re.M
        )
        assert m, "reference function %s not found" % name
        fn_srcs.append(m.group(0))
    body = "\n".join(fn_srcs).replace(
        "sample_number = 1000", "sample_number = %d" % sample_number
    )
    from sklearn.neighbors import NearestNeighbors
    from time import time

    ns = {
        "np": np,
        "re": re,
        "math": math,
        "time": time,
        "NearestNeighbors": NearestNeighbors,
        "load": np.loadtxt,
        "precentages": np.array([0.008, 0.012]),
        "print": lambda *a, **k: None,
    }
    exec(body, ns)
    return ns["analyze_uniform"]


@pytest.mark.skipif(
    not os.path.isfile(REF_EVAL), reason="reference checkout unavailable"
)
def test_side_files_feed_reference_reader(tmp_path):
    from dispu_tpu.evaluation.meshio import read_off, sample_mesh_surface
    from dispu_tpu.evaluation.report import evaluate_pair

    verts, faces = read_off(REF_MESH)
    rng = np.random.RandomState(3)
    pred = sample_mesh_surface(verts, faces, 1500, seed=3)
    pred += rng.randn(*pred.shape).astype(np.float32) * 1e-3
    gt = sample_mesh_surface(verts, faces, 1500, seed=4)

    pred_path = tmp_path / "Icosahedron_X4.xyz"
    gt_path = tmp_path / "Icosahedron.xyz"
    np.savetxt(pred_path, pred, fmt="%.8f")
    np.savetxt(gt_path, gt, fmt="%.8f")

    n_seeds = 40
    row = evaluate_pair(
        str(pred_path), str(gt_path), REF_MESH,
        num_disk_seeds=n_seeds, geodesic=True, dump_p2f=True,
    )

    prefix = str(pred_path)[:-4]
    p2f_file = prefix + "_point2mesh_distance.txt"
    idx_file = prefix + "_disk_idx.txt"
    radius_file = prefix + "_radius.txt"
    seed_file = prefix + "_sampling_seed.txt"
    for f in (p2f_file, idx_file, radius_file, seed_file):
        assert os.path.isfile(f), f

    # structural format checks (what ref:evaluate.py:166-185 expects)
    arr = np.loadtxt(p2f_file)
    assert arr.shape == (len(pred), 7)
    np.testing.assert_allclose(arr[:, :3], pred, atol=1e-5)
    # the dumped distance column is the same p2f our CSV stats use
    np.testing.assert_allclose(
        float(np.nanmean(arr[:, 3])), row["p2f avg"], rtol=1e-4
    )
    radii = np.loadtxt(radius_file)
    assert radii.shape == (2,)
    lines = open(idx_file).read().strip("\n").split("\n")
    assert len(lines) == n_seeds * 2
    counts = np.array([int(l.split(":")[0]) for l in lines])
    members0 = [int(s) for s in lines[0].split(":")[1].split()]
    assert len(members0) == counts[0]
    bary = np.loadtxt(seed_file)
    np.testing.assert_allclose(bary.sum(1), 1.0, atol=1e-4)

    # the reference's own reader on our files reproduces our uniformity
    analyze_uniform = _load_reference_reader(n_seeds)
    ref_measure = analyze_uniform(idx_file, radius_file, p2f_file)
    assert ref_measure.shape == (2, 1)
    for j in range(2):
        ours = row["uniform_%d" % j]
        theirs = float(ref_measure[j, 0])
        assert math.isfinite(theirs)
        # text round-trip (%g, 6 sig digits) perturbs the reader's
        # recomputed NN spacings; the disk memberships/counts are identical
        assert abs(theirs - ours) <= 2e-2 * max(abs(ours), 1e-3), (
            j, ours, theirs,
        )
