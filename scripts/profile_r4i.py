"""Round-4 session I: does the n_pad=512 maskout carve-out reproduce?

knn_pallas variant='auto' special-cases exactly n_pad==512 to 'maskout'
from ONE r3o session (3.83 vs unroll 4.55 ms at (64,512,16)).  The
round-3 advisor flagged the one-point carve-out as brittle given the
documented ~20% inter-session throughput swings on this pool: unroll
wins everywhere else (256/1024/4096) and the two variants are
bit-identical, so unless the 512 win reproduces across sessions the
simpler uniform pick should stand.

Measures, interleaved A/B/A/B (5 legs each) so session drift cannot
masquerade as a variant effect:
  - maskout vs unroll at (64, 512, 16) self-kNN (the r3o shape)
  - the same pair at k=5 (the query_ball/grouping selection depth)

Decision rule: keep the carve-out only if maskout's median beats
unroll's median by >5% here; otherwise switch auto to uniform unroll.

Run on the TPU (one process — chip grants are slow):
    cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
        python -u scripts/profile_r4i.py
"""

import numpy as np
import jax

from scripts.harness import timed

R = np.random.RandomState(0)

LEGS = 5


def main():
    print("backend:", jax.default_backend(), flush=True)

    from dispu_tpu.ops.pallas_kernels import knn_pallas

    pts = (R.randn(64, 512, 3) * 0.5).astype(np.float32)

    for k in (16, 5):
        res = {"maskout": [], "unroll": []}
        for leg in range(LEGS):
            for variant in ("maskout", "unroll"):
                ms = timed(
                    f"(64,512,{k:2d}) {variant:8s} leg {leg}",
                    lambda p, v=variant, k=k: knn_pallas(k, p, p, variant=v),
                    (pts,),
                )
                res[variant].append(ms)
        med = {v: float(np.median(r)) for v, r in res.items()}
        win = (med["unroll"] - med["maskout"]) / med["unroll"]
        print(
            f"k={k}: maskout median {med['maskout']:.2f} ms, unroll median "
            f"{med['unroll']:.2f} ms, maskout win {win * 100:+.1f}% "
            f"({'KEEP carve-out' if win > 0.05 else 'DROP carve-out'})",
            flush=True,
        )


if __name__ == "__main__":
    main()
