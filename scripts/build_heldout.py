"""Build a HELD-OUT evaluation set: unseen procedural shapes → clouds+meshes.

The training h5 (scripts/build_dataset.py) includes patches from the two
reference-shipped meshes, so evaluating only on those clouds measures
performance partly on seen surfaces.  This builder emits shapes the
training corpus has never seen (disjoint RNG stream), in the layout the
evaluation CLI consumes:

    data/heldout/input/<name>.xyz   2048-point Poisson-disk input cloud
    data/heldout/gt/<name>.xyz      8192-point Poisson-disk gt cloud (4x)
    data/heldout/mesh/<name>.off    the triangle mesh (P2F / uniformity)

Protocol mirrors the reference's test layout (ref:data/test/*.xyz are
2048-point clouds with .off meshes alongside; ref:evaluate.py pairs
pred '<name>_X4.xyz' with gt '<name>.xyz' and mesh '<name>.off').

Usage (host-only):
    python -u scripts/build_heldout.py [--out data/heldout] [--shapes 4]
"""

import argparse
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HELDOUT_SEED = 7_777_777  # disjoint from the training corpus stream (0..)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/heldout")
    ap.add_argument("--shapes", type=int, default=4)
    ap.add_argument("--input_points", type=int, default=2048)
    ap.add_argument("--gt_points", type=int, default=8192)
    args = ap.parse_args()

    from dispu_tpu.data.meshgen import make_corpus, poisson_disk_sample
    from dispu_tpu.evaluation.meshio import write_off, write_xyz

    for sub in ("input", "gt", "mesh"):
        os.makedirs(os.path.join(args.out, sub), exist_ok=True)

    for name, (verts, faces) in make_corpus(args.shapes, seed=HELDOUT_SEED):
        name = "ho_" + name
        gt = poisson_disk_sample(verts, faces, args.gt_points,
                                 seed=HELDOUT_SEED + 1)
        # independent sampling at input density (like the patch pairs:
        # the input cloud is NOT a subset of the gt cloud)
        inp = poisson_disk_sample(verts, faces, args.input_points,
                                  seed=HELDOUT_SEED + 2)
        write_xyz(os.path.join(args.out, "input", name + ".xyz"), inp)
        write_xyz(os.path.join(args.out, "gt", name + ".xyz"), gt)
        write_off(os.path.join(args.out, "mesh", name + ".off"),
                  verts, faces)
        print(f"{name}: {len(verts)} verts, input {inp.shape}, "
              f"gt {gt.shape}", flush=True)
    print("held-out set written to", args.out)


if __name__ == "__main__":
    main()
