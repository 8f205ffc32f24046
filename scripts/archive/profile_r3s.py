"""Round-3 session S: sort-free Morton ranking for the bucketed merge FPS.

The bucketed merge FPS (16x: n=237,568 -> m=80,000, K=64) now spends
~12 of its 14.1 ms in `jnp.argsort(morton_codes(xyz))` (PERFORMANCE.md
"Round-3: bucketed merge FPS").  `ops.sampling.morton_rank` replaces the
sort with a counting rank over the 2^12 alphabet of bits=4 morton codes
(one lax.scan carrying a running histogram; stable intra-key offsets via
a strictly-lower-triangular equality count per chunk) plus ONE
permutation scatter to invert.  This session measures, at merge scale:

  A. the rank micro-legs: argsort(bits=10) | argsort(bits=4) |
     morton_rank at chunk 1024/2048/4096 | the inversion scatter alone —
     where does the XLA sort's 12 ms actually go, and is a permutation
     scatter fast on this chip (it lowers through sort on some backends,
     which would erase the win);
  B. farthest_point_sample_bucketed end-to-end: argsort/bits=10 (the
     shipping mode) vs radix/bits=4, K=64 and 128;
  C. selection-quality spot check: coverage radius of both modes on a
     patchy cloud (the radix mode only reorders within 16^3 morton
     cells, so coverage should be statistically identical).

Decision: if B shows radix ~>=2x faster at K=64 AND C shows no coverage
regression, flip InferenceConfig.merge_fps="bucketed" to route
rank_impl="radix" (keeping argsort available) and re-measure the 16x
whole-cloud number.

Run on the TPU (one process — chip grants are slow):
    cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
        python -u scripts/profile_r3s.py
"""

import numpy as np
import jax
import jax.numpy as jnp

from scripts.harness import timed

R = np.random.RandomState(0)

N, M, K = 237_568, 80_000, 64


def main():
    print("backend:", jax.default_backend(), flush=True)

    from dispu_tpu.ops.sampling import (
        farthest_point_sample_bucketed,
        morton_codes,
        morton_rank,
    )

    xyz = jnp.asarray(R.randn(N, 3), jnp.float32)

    # ---- A: rank micro-legs ------------------------------------------
    timed("A morton_codes bits=10 (n=237k)",
          lambda p: morton_codes(p, bits=10), (xyz,), iters=20)
    timed("A argsort(codes10)",
          lambda p: jnp.argsort(morton_codes(p, bits=10)), (xyz,),
          iters=20)
    timed("A argsort(codes4)",
          lambda p: jnp.argsort(morton_codes(p, bits=4)), (xyz,),
          iters=20)
    for chunk in (1024, 2048, 4096):
        timed(f"A morton_rank bits=4 chunk={chunk}",
              lambda p, ck=chunk: morton_rank(
                  morton_codes(p, bits=4), n_bins=4096, chunk=ck),
              (xyz,), iters=20)

    def rank_and_invert(p):
        pos = morton_rank(morton_codes(p, bits=4), n_bins=4096)
        return jnp.zeros((N,), jnp.int32).at[pos].set(
            jnp.arange(N, dtype=jnp.int32), unique_indices=True)

    timed("A rank + inversion scatter", rank_and_invert, (xyz,), iters=20)

    # scatter alone, on a fixed permutation (data-independent of iter —
    # the checksum carry still keeps it live; pos is int so the perturb
    # rides on a dummy float operand folded into the updates)
    pos_fixed = jnp.asarray(
        np.random.RandomState(1).permutation(N).astype(np.int32))

    def scatter_only(dummy, pos):
        upd = jnp.arange(N, dtype=jnp.int32) + dummy.astype(jnp.int32)
        return jnp.zeros((N,), jnp.int32).at[pos].set(
            upd, unique_indices=True)

    timed("A inversion scatter alone",
          scatter_only, (jnp.zeros((1,), jnp.float32), pos_fixed),
          iters=20)

    # ---- B: bucketed FPS end-to-end ----------------------------------
    for K_ in (64, 128):
        timed(f"B bucketed FPS argsort/b10 K={K_} (ref 14.1@K64)",
              lambda p, k=K_: farthest_point_sample_bucketed(
                  M, p, n_buckets=k),
              (xyz,), iters=10)
        timed(f"B bucketed FPS radix/b4 K={K_}",
              lambda p, k=K_: farthest_point_sample_bucketed(
                  M, p, n_buckets=k, rank_impl="radix", bits=4),
              (xyz,), iters=10)

    # ---- C: coverage spot check --------------------------------------
    centers = R.randn(24, 3).astype(np.float32)
    pts = np.concatenate(
        [c + 0.35 * R.randn(2000, 3).astype(np.float32) for c in centers])
    cloud = jnp.asarray(pts)  # (48000, 3)
    m = 8192

    def coverage(sel):
        sel_pts = np.asarray(cloud)[np.asarray(sel)]
        # chunked NN to bound host memory
        worst = 0.0
        for s in range(0, pts.shape[0], 8192):
            d = np.linalg.norm(
                pts[s:s + 8192, None] - sel_pts[None], axis=-1)
            worst = max(worst, float(d.min(axis=1).max()))
        return worst

    sel_a = farthest_point_sample_bucketed(m, cloud, 64)
    sel_r = farthest_point_sample_bucketed(
        m, cloud, 64, rank_impl="radix", bits=4)
    print(f"C coverage argsort/b10: {coverage(sel_a):.4f}  "
          f"radix/b4: {coverage(sel_r):.4f}", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
