"""Round-3 session E: regenerate demo/outputs with the current code.

Run: cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
        python -u scripts/profile_r3e.py

The BN-epsilon parity fix (1e-5 -> 1e-3, matching the reference's
contrib batch_norm) shifts inference outputs at the ~0.05% level, so the
round-2 demo outputs / evaluation.csv drift from what the current code
produces.  Regenerates demo/outputs (exact merge mode — the default)
through the same --phase test path, plus a bench.py run as a sanity
check of the headline + parity guard.
"""

import sys


def main():
    import bench

    bench.main()

    import dispu

    sys.argv = [
        "dispu.py", "--phase", "test", "--log_dir", "demo/log",
        "--test_data", "/root/reference/data/test/*.xyz",
        "--out_folder", "demo/outputs", "--final_ratio", "4",
    ]
    args = dispu.parse_args()
    dispu.run_test(args, dispu.build_config(args))

    sys.argv = [
        "dispu.py", "--phase", "test", "--log_dir", "demo/log",
        "--test_data", "/root/reference/data/test/*.xyz",
        "--out_folder", "demo/outputs", "--final_ratio", "16",
    ]
    args = dispu.parse_args()
    dispu.run_test(args, dispu.build_config(args))
    print("demo outputs regenerated", flush=True)


if __name__ == "__main__":
    main()
