"""Run the round-4 follow-up TPU sessions (r4h, r4i) in ONE process.

Chip grants take minutes and serialize across processes, so the
chunk-width sweep and the maskout-512 reproduction check ride one grant
back to back (same pattern as scripts/run_r4_queue.py).

    cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
        python -u scripts/run_r4_queue2.py
"""

import sys
import time
import traceback

from scripts import profile_r4h, profile_r4i


def main():
    import jax

    try:
        print(f"probing backend {time.strftime('%H:%M:%S')} ...", flush=True)
        print("backend ok:", jax.devices(), flush=True)
    except Exception:
        traceback.print_exc()
        print("BACKEND UNAVAILABLE", flush=True)
        sys.exit(17)
    failed = []
    for name, mod in (("r4h", profile_r4h), ("r4i", profile_r4i)):
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
