#!/usr/bin/env python
"""Metrics CLI: score predicted clouds against ground truth.

Parity: ref:evaluate.py — per-file CD / hausdorff / p2f avg / p2f std /
uniform_{0,1} plus a summary row, written to evaluation.csv next to the
predictions.  Unlike the reference (which needed side files produced by
the CGAL binary), P2F and disk uniformity are computed directly when a
``--mesh`` directory with ``<name>.off`` files is given.

  python evaluate.py --pred outputs/ --gt data/test/gt/ [--mesh data/test/]
"""

import argparse
import json


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pred", required=True, help="dir of predicted *.xyz")
    p.add_argument("--gt", required=True, help="dir of ground-truth *.xyz")
    p.add_argument("--mesh", default=None, help="dir of gt *.off meshes")
    p.add_argument("--out_csv", default=None)
    p.add_argument("--disk_seeds", type=int, default=1000)
    p.add_argument(
        "--dump_p2f", action="store_true",
        help="also write the reference evaluation binary's per-point side "
        "files next to each prediction: <name>_point2mesh_distance.txt, "
        "_disk_idx.txt, _radius.txt, _sampling_seed.txt "
        "(ref:evaluation_code/evaluation.cpp:202-212,259-311; readable by "
        "ref:evaluate.py's analyze_uniform)")
    args = p.parse_args()

    from dispu_tpu.evaluation.report import evaluate_dirs

    summary = evaluate_dirs(
        args.pred,
        args.gt,
        mesh_dir=args.mesh,
        out_csv=args.out_csv,
        num_disk_seeds=args.disk_seeds,
        dump_p2f=args.dump_p2f,
    )
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
