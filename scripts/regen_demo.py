"""Regenerate every demo artifact from the round-4 trained checkpoints
in ONE process (one chip grant): 4x/16x inference over the reference's
shipped clouds AND the held-out unseen-shape clouds, for the CD and GAN
models, plus all evaluation CSVs (CD/HD, exact point-to-mesh P2F,
geodesic-disk uniformity — the demo/README protocol).

Inputs it expects on disk:
  demo/log       — CD training run (dispu.py --phase train)
  demo/gan_log   — GAN training run (--use_gan true --d_clip 0)   [optional]
  data/heldout   — scripts/build_heldout.py output                 [optional]

Usage:
    cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
        python -u scripts/regen_demo.py [--skip_gan] [--disk_seeds 1000]
"""

import argparse
import os
import sys
import time
from glob import glob

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REF_TEST = "/root/reference/data/test"


def restore_variables(log_dir, use_gan=False):
    """Newest checkpoint in log_dir → generator variables (GAN dirs
    restore the generator half, like dispu.py's test phase /
    ref:DisPU/model.py:344-358)."""
    import jax

    from dispu_tpu.config import ExperimentConfig
    from dispu_tpu.train.state import create_generator_state
    from dispu_tpu.utils.checkpoint import (latest_checkpoint,
                                            restore_checkpoint)

    cfg = ExperimentConfig()
    epoch, path = latest_checkpoint(log_dir)
    if path is None:
        raise SystemExit(f"no checkpoint in {log_dir}")
    print(f"restoring {path} (epoch {epoch})", flush=True)
    template = create_generator_state(
        jax.random.PRNGKey(0), cfg.generator, cfg.train)
    try:
        state = restore_checkpoint(path, template)
    except ValueError:
        from dispu_tpu.train.gan_steps import create_gan_state

        state = restore_checkpoint(
            path, create_gan_state(jax.random.PRNGKey(0), cfg)).gen
        print("restored the generator half of a GAN checkpoint", flush=True)
    return {"params": state.params, "batch_stats": state.batch_stats}


def upsample_glob(upsampler, pattern, out_folder, ratio):
    from dispu_tpu.evaluation.meshio import read_xyz, write_xyz

    os.makedirs(out_folder, exist_ok=True)
    for path in sorted(glob(pattern)):
        pc = read_xyz(path)[:, :3]
        t0 = time.perf_counter()
        out = np.asarray(upsampler.upsample(pc))
        assert np.isfinite(out).all()
        name = os.path.basename(path)[:-4]
        out_path = os.path.join(out_folder, f"{name}_X{ratio}.xyz")
        write_xyz(out_path, out)
        print(f"  {out_path} ({len(out)} pts, "
              f"{time.perf_counter() - t0:.2f}s)", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip_gan", action="store_true")
    ap.add_argument("--skip_heldout", action="store_true")
    ap.add_argument("--disk_seeds", type=int, default=1000,
                    help="geodesic uniformity disk seeds (demo protocol)")
    args = ap.parse_args()

    import jax

    from dispu_tpu.config import ExperimentConfig, InferenceConfig
    from dispu_tpu.evaluation.report import evaluate_dirs
    from dispu_tpu.inference import PatchUpsampler

    print("backend:", jax.default_backend(), flush=True)
    cfg = ExperimentConfig()
    have_heldout = (not args.skip_heldout
                    and os.path.isdir("data/heldout/input"))

    legs = [("demo/log", "demo/outputs", "demo/heldout_outputs")]
    if not args.skip_gan and os.path.isdir("demo/gan_log"):
        legs.append(("demo/gan_log", "demo/gan_outputs",
                     "demo/gan_heldout_outputs"))

    for log_dir, out_ref, out_ho in legs:
        variables = restore_variables(log_dir)
        for ratio in (4, 16):
            ups = PatchUpsampler(
                variables, cfg.generator,
                InferenceConfig(final_ratio=ratio))
            print(f"[{log_dir}] X{ratio} reference clouds:", flush=True)
            upsample_glob(ups, os.path.join(REF_TEST, "*.xyz"),
                          out_ref, ratio)
            if have_heldout:
                print(f"[{log_dir}] X{ratio} held-out clouds:", flush=True)
                upsample_glob(ups, "data/heldout/input/*.xyz",
                              out_ho, ratio)
        print(f"[{log_dir}] evaluating {out_ref} ...", flush=True)
        row = evaluate_dirs(out_ref, "demo/gt", mesh_dir=REF_TEST,
                            num_disk_seeds=args.disk_seeds)
        print("  summary:", row, flush=True)
        if have_heldout:
            print(f"[{log_dir}] evaluating {out_ho} ...", flush=True)
            row = evaluate_dirs(out_ho, "data/heldout/gt",
                                mesh_dir="data/heldout/mesh",
                                num_disk_seeds=args.disk_seeds)
            print("  summary:", row, flush=True)


if __name__ == "__main__":
    main()
