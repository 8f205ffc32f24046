"""Run the three queued round-3 TPU measurement sessions in ONE process.

The TPU pool went down at the end of the previous session with
profile_r3o (kernel-variant grid), r3p (in-context fast_knn /
shared-geometry GAN / bf16 pass-2) and r3q (full turbo-config grid)
written but unmeasured.  Chip grants take minutes and serialize, so all
three run here back to back in a single grant.

    cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
        python -u scripts/run_r3_queue.py
"""

import sys
import time
import traceback

from scripts.archive import (profile_r3o, profile_r3p, profile_r3q, profile_r3r,
                     profile_r3s, profile_r3t)


def main():
    # Probe the backend ONCE up front: during a pool outage the handshake
    # raises UNAVAILABLE after ~25 min — without this, each queued script
    # would burn its own 25-min doomed handshake.  Exit 17 so a wrapper
    # loop can sleep and relaunch.
    import jax

    try:
        print(f"probing backend {time.strftime('%H:%M:%S')} ...",
              flush=True)
        print("backend ok:", jax.devices(), flush=True)
    except Exception:
        traceback.print_exc()
        print("BACKEND UNAVAILABLE", flush=True)
        sys.exit(17)
    failed = []
    for name, mod in (("r3o", profile_r3o), ("r3p", profile_r3p),
                      ("r3q", profile_r3q), ("r3r", profile_r3r),
                      ("r3s", profile_r3s), ("r3t", profile_r3t)):
        print(f"===== {name} start {time.strftime('%H:%M:%S')} =====",
              flush=True)
        try:
            mod.main()
        except Exception:
            traceback.print_exc()
            print(f"===== {name} FAILED =====", flush=True)
            failed.append(name)
        else:
            print(f"===== {name} done {time.strftime('%H:%M:%S')} =====",
                  flush=True)
    if failed:
        # a partial run must not exit 0 (advisor finding, round 4)
        print("failed sessions:", ", ".join(failed), flush=True)
        sys.exit(1)


if __name__ == "__main__":
    main()
