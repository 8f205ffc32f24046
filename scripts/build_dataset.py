"""Build the training h5 (PUGAN layout) from real meshes.

Rebuilds the reference's missing training artifact
``PUGAN_poisson_256_poisson_1024.h5`` (ref:DisPU/dataset.py:52-55) from
the two meshes the reference ships plus a procedural corpus — see
``dispu_tpu.data.meshgen``.  Deterministic in ``--seed``.

Usage (host-only work — forces the CPU backend before importing jax):
    python -u scripts/build_dataset.py \
        --out data/PUGAN_poisson_256_poisson_1024.h5 \
        --shapes 22 --patches 100
"""

import argparse
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_MESH_DIR = "/root/reference/data/test"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/PUGAN_poisson_256_poisson_1024.h5")
    ap.add_argument("--shapes", type=int, default=22,
                    help="procedural corpus size")
    ap.add_argument("--families", default="v2", choices=("v1", "v2"),
                    help="corpus family cycle: v1 = the round-4 five "
                         "families, v2 adds flat-faceted polyhedra, CAD "
                         "fillet/chamfer revolutions, thin plates, and "
                         "thin-walled shells")
    ap.add_argument("--patches", type=int, default=100, help="per mesh")
    ap.add_argument("--num_point", type=int, default=256)
    ap.add_argument("--up_ratio", type=int, default=4)
    ap.add_argument("--coverage", type=float, default=1.0 / 24.0,
                    help="surface fraction one gt patch spans")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--reference_meshes", type=lambda s: s.lower() != "false",
                    default=True,
                    help="include the two shipped .off meshes")
    args = ap.parse_args()

    from dispu_tpu.data.meshgen import (
        build_h5_dataset, make_corpus, normalize_mesh,
    )
    from dispu_tpu.evaluation.meshio import read_off

    meshes = []
    if args.reference_meshes and os.path.isdir(REF_MESH_DIR):
        for fname in sorted(os.listdir(REF_MESH_DIR)):
            if fname.endswith(".off"):
                verts, faces = read_off(os.path.join(REF_MESH_DIR, fname))
                meshes.append(
                    (fname[:-4], (normalize_mesh(verts), faces))
                )
                print(f"reference mesh: {fname} "
                      f"({len(verts)} verts, {len(faces)} faces)", flush=True)
    meshes.extend(
        make_corpus(args.shapes, seed=args.seed, families=args.families)
    )

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    total, names = build_h5_dataset(
        args.out, meshes, patches_per_mesh=args.patches,
        num_point=args.num_point, up_ratio=args.up_ratio,
        coverage=args.coverage, seed=args.seed,
    )
    print(f"wrote {args.out}: {total} patches from {len(names)} meshes")


if __name__ == "__main__":
    main()
