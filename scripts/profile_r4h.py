"""Round-4 session H: chunk-width sweep for the chunked-sweep FPS kernel.

r4f/r4g established: the wide FPS kernel is latency-bound on serial
per-round reductions (236 ms at the 5k merge), and the width-128
chunked kernel loses there (283 ms) because its 468 serialized loop
iterations per round cannot pipeline — but it is the ONLY kernel that
compiles at the 10k merge (1033 ms vs a 56.5 s XLA fallback).  The
chunk width now parameterizes that trade: bigger (8, width) chunks
mean fewer serialized iterations per round (width 8192 -> 4-8
iterations) while temporaries stay width-bounded, approaching the wide
kernel's full-array pipelining WITH the running-argmax fusion that
saves its extraction/selection sweeps.

Measures (one chip session):
  W5k:  wide anchor + chunked width in {128, 512, 2048, 8192} at
        (1,237568)->80000
  W10k: chunked width in {128, 512, 2048, 8192} at (1,479232)->160000
  P:    parity chunked(width=2048) == wide at the 5k merge scale

Decision: wire the best width into farthest_point_sample's dispatch;
if a width beats the wide kernel at the 5k scale, extend the chunked
route below the wide envelope too.

Run on the TPU (one process — chip grants are slow):
    cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
        python -u scripts/profile_r4h.py
"""

import numpy as np
import jax
import jax.numpy as jnp

from scripts.harness import timed

R = np.random.RandomState(0)

WIDTHS = (128, 512, 2048, 8192)


def main():
    print("backend:", jax.default_backend(), flush=True)

    from dispu_tpu.ops.pallas_kernels import fps_pallas, fps_pallas_chunked

    cloud5 = (R.randn(1, 237_568, 3) * 0.5).astype(np.float32)
    cloud10 = (R.randn(1, 479_232, 3) * 0.5).astype(np.float32)

    timed("W5k wide anchor (237568->80000)",
          lambda p: fps_pallas(80_000, p), (cloud5,), iters=3)
    for w in WIDTHS:
        timed(f"W5k chunked width={w:5d}",
              lambda p, w=w: fps_pallas_chunked(80_000, p, False, w),
              (cloud5,), iters=3)

    wref = np.asarray(fps_pallas(80_000, jnp.asarray(cloud5)))
    c2k = np.asarray(
        fps_pallas_chunked(80_000, jnp.asarray(cloud5), False, 2048))
    print("P parity chunked(2048)==wide:",
          "ok" if np.array_equal(wref, c2k) else "MISMATCH", flush=True)

    for w in WIDTHS:
        timed(f"W10k chunked width={w:5d}",
              lambda p, w=w: fps_pallas_chunked(160_000, p, False, w),
              (cloud10,), iters=3)


if __name__ == "__main__":
    main()
