"""Round-5 training queue: both 401-epoch retrains + evals, ONE process.

Chip grants take minutes and serialize, so the whole round-5 protocol
rides one grant:

  1. CD model retrain on the 20.7k-pair v2 corpus (the full reference
     schedule: 401 epochs, batch 28, lr 1e-3 ×0.7/30, weight_fine bumps
     at 10/20/30 — ref:DisPU/configs.py:15-34), driven through the real
     CLI entry (dispu.main in-process) so demo/log is produced exactly
     as a user run would.
  2. GAN model retrain (--d_clip 0 deviating config with the balance
     parameters chosen by the profile_r5a sweep).
  3. X16 pass-2 distribution-shift quantification with the fresh CD
     model (scripts/x16_shift.py).
  4. Full demo regeneration + evaluation CSVs (scripts/regen_demo.py,
     1000-disk geodesic protocol).

    cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
        python -u scripts/run_r5_queue.py --cluster_prob 0.3 \
            --gen_update 2 --lr_d 1e-4
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def run_cli(argv):
    import dispu

    old = sys.argv
    sys.argv = ["dispu.py"] + argv
    try:
        dispu.main()
    finally:
        sys.argv = old


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cluster_prob", type=float, default=0.0)
    ap.add_argument("--gen_update", type=int, default=2)
    ap.add_argument("--lr_d", type=float, default=1e-4)
    ap.add_argument("--skip_cd", action="store_true")
    ap.add_argument("--skip_gan", action="store_true")
    ap.add_argument("--restore", action="store_true",
                    help="resume both trainings from their latest crash/"
                         "scheduled checkpoints")
    ap.add_argument("--disk_seeds", type=int, default=1000)
    args = ap.parse_args()

    import jax

    print("backend:", jax.devices(), flush=True)
    failed = []

    def leg(name, fn):
        print(f"===== {name} start {time.strftime('%H:%M:%S')} =====",
              flush=True)
        try:
            fn()
        except Exception:
            traceback.print_exc()
            print(f"===== {name} FAILED =====", flush=True)
            failed.append(name)
        else:
            print(f"===== {name} done {time.strftime('%H:%M:%S')} =====",
                  flush=True)

    # steps_per_print=74 divides the 20740/28=740-step epoch exactly: the
    # whole epoch runs as chunked-scan dispatches with no stepwise tail
    # (a 40-step tail pays ~37 ms/step of tunnel overhead — ~0.17 h over
    # 401 epochs).  Logging cadence only; no training semantics change.
    restore = ["--restore"] if args.restore else []
    if not args.skip_cd:
        leg("cd_train", lambda: run_cli([
            "--phase", "train", "--data_dir", "data",
            "--log_dir", "demo/log",
            "--steps_per_print", "74",
            "--cluster_prob", str(args.cluster_prob),
        ] + restore))
    if not args.skip_gan:
        leg("gan_train", lambda: run_cli([
            "--phase", "train", "--data_dir", "data",
            "--log_dir", "demo/gan_log",
            "--use_gan", "true", "--d_clip", "0",
            "--steps_per_print", "74",
            "--gen_update", str(args.gen_update),
            "--base_lr_d", str(args.lr_d),
            "--cluster_prob", str(args.cluster_prob),
        ] + restore))

    def x16():
        from scripts import x16_shift

        x16_shift.main("demo/log", "/tmp/x16_shift.csv")

    leg("x16_shift", x16)

    def regen():
        from scripts import regen_demo

        old = sys.argv
        sys.argv = ["regen_demo.py", "--disk_seeds", str(args.disk_seeds)]
        try:
            regen_demo.main()
        finally:
            sys.argv = old

    leg("regen_demo", regen)

    if failed:
        print("failed legs:", ", ".join(failed), flush=True)
        sys.exit(1)


if __name__ == "__main__":
    main()
