"""Quantify the X16 pass-2 distribution shift (VERDICT r4 item 3).

At 16× the generator runs twice (ref:DisPU/model.py:116-118 iterates the
same 4× graph); the second pass consumes patches of PASS-1 OUTPUTS — a
distribution the model never sees in training (Poisson-disk / Gaussian-
biased inputs).  This script isolates that shift with the trained model:
for each held-out cloud,

  O1  = pass-1 output   (2048-input upsampled 4× → 8192 points)
  P8  = the INDEPENDENT Poisson-disk 8192-point sampling of the same
        mesh (data/heldout/gt — on-surface, blue-noise: the
        in-distribution counterfactual)

then runs the SAME second pass (a 4× patch upsample) on both and
evaluates CD/HD vs the gt cloud and exact point-to-mesh P2F:

  pass2(O1) = the production X16 tail; pass2(P8) = what pass 2 would do
  if its input matched the training distribution.  The gap is the shift.

Usage (importable; run_r5_queue.py calls main() in-process):
    PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/x16_shift.py \
        [--log_dir demo/log] [--out /tmp/x16_shift.csv]
"""

from __future__ import annotations

import argparse
import os
import sys
from glob import glob

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def evaluate_cloud(pred, gt, verts, faces):
    import jax.numpy as jnp

    from dispu_tpu.evaluation.metrics import cd_hd, point_to_mesh_distance

    cd, hd = cd_hd(jnp.asarray(pred), jnp.asarray(gt))
    dists, _ = point_to_mesh_distance(jnp.asarray(pred), verts, faces)
    return float(cd), float(hd), float(jnp.mean(dists))


def main(log_dir="demo/log", out_csv="/tmp/x16_shift.csv"):
    from dispu_tpu.config import ExperimentConfig, InferenceConfig
    from dispu_tpu.evaluation.meshio import read_off, read_xyz
    from dispu_tpu.inference import PatchUpsampler
    from scripts.regen_demo import restore_variables

    cfg = ExperimentConfig()
    variables = restore_variables(log_dir)
    up4 = PatchUpsampler(
        variables, cfg.generator, InferenceConfig(final_ratio=4)
    )

    rows = []
    for in_path in sorted(glob("data/heldout/input/*.xyz")):
        name = os.path.basename(in_path)[:-4]
        gt = read_xyz(f"data/heldout/gt/{name}.xyz")[:, :3]
        verts, faces = read_off(f"data/heldout/mesh/{name}.off")
        pc = read_xyz(in_path)[:, :3]

        o1 = np.asarray(up4.upsample(pc))            # pass 1 (8192)
        p2_o1 = np.asarray(up4.upsample(o1))         # production X16 tail
        p2_p8 = np.asarray(up4.upsample(gt))         # in-distribution pass 2

        for tag, cloud in (("pass1", o1), ("pass2_from_pass1", p2_o1),
                           ("pass2_from_poisson", p2_p8)):
            cd, hd, p2f = evaluate_cloud(cloud, gt, verts, faces)
            rows.append((name, tag, cd, hd, p2f))
            print(f"{name:16s} {tag:20s} CD={cd:.6f} HD={hd:.6f} "
                  f"P2F={p2f:.6f}", flush=True)

    with open(out_csv, "w") as f:
        f.write("name,stage,cd,hd,p2f\n")
        for r in rows:
            f.write("%s,%s,%.8f,%.8f,%.8f\n" % r)
    # the shift, summarized: mean over clouds of pass2(O1) vs pass2(P8)
    for metric, i in (("CD", 2), ("P2F", 4)):
        a = np.mean([r[i] for r in rows if r[1] == "pass2_from_pass1"])
        b = np.mean([r[i] for r in rows if r[1] == "pass2_from_poisson"])
        print(f"shift[{metric}]: pass2(pass1)={a:.6f} vs "
              f"pass2(poisson)={b:.6f} -> ratio {a/max(b,1e-12):.3f}",
              flush=True)
    print("wrote", out_csv, flush=True)
    return rows


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--log_dir", default="demo/log")
    ap.add_argument("--out", default="/tmp/x16_shift.csv")
    a = ap.parse_args()
    main(a.log_dir, a.out)
