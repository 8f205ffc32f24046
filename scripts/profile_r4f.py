"""Round-4 session F: chunked-sweep FPS kernel A/B + 16x exact e2e.

Context (r4e, this round): the wide FPS kernel's scoped-VMEM stack
cannot compile the 16x merge on a 10k cloud (18.8 MiB vs the 16 MiB
limit), and the gated XLA-loop fallback measured **56.5 s** for that
merge (160k rounds round-tripping a 1.9 MB mindist vector through HBM)
— the exact path needs a kernel that covers the scale.
``fps_pallas_chunked`` fuses each round into one sweep over (8, 128)
chunks (distance update + mindist store + running argmax value/index/
coords ride the same chunk loads), halving the wide kernel's per-round
VMEM traffic and shrinking temporaries to (8, 128), so its envelope
covers ~6M points.

Measures (one chip session, in-session A/B):
  A. patch-scale FPS (28,1024)->256: wide | chunked   (training shape)
  P. parity at merge scale: chunked vs wide bit-equal at
     (1,237568)->80000 (the 5k-cloud 16x merge)
  B. merge-scale FPS isolated: wide | chunked at 5k scale;
     chunked at 10k scale (1,479232)->160000 (wide cannot compile)
  C. 16x whole-cloud exact end-to-end on the 5k cloud: merge=wide
     (auto today) vs merge=chunked — same session; then the 10k cloud
     with merge=chunked (r4e same day: 56.5 s via the XLA fallback).

Decision: if chunked >= wide at merge scale, route auto above the wide
envelope only (already wired); if chunked clearly wins at 5k merge
scale too, lower the wide->chunked crossover.

Run on the TPU (one process — chip grants are slow):
    cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
        python -u scripts/profile_r4f.py
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from scripts.harness import timed

R = np.random.RandomState(0)


def main():
    print("backend:", jax.default_backend(), flush=True)

    from dispu_tpu.ops.pallas_kernels import fps_pallas, fps_pallas_chunked
    from dispu_tpu.ops import sampling as sampling_mod

    # ---- A: patch scale ------------------------------------------------
    pts = R.randn(28, 1024, 3).astype(np.float32)
    timed("A fps wide    (28,1024)->256", lambda p: fps_pallas(256, p),
          (pts,), iters=30)
    timed("A fps chunked (28,1024)->256",
          lambda p: fps_pallas_chunked(256, p), (pts,), iters=30)

    # ---- P: parity at the 5k-cloud merge scale -------------------------
    cloud5 = (R.randn(1, 237_568, 3) * 0.5).astype(np.float32)
    w = np.asarray(fps_pallas(80_000, jnp.asarray(cloud5)))
    c = np.asarray(fps_pallas_chunked(80_000, jnp.asarray(cloud5)))
    print("P merge-scale parity chunked==wide:",
          "ok" if np.array_equal(w, c) else "MISMATCH", flush=True)

    # ---- B: merge scale isolated ---------------------------------------
    timed("B merge wide    (237568->80000)",
          lambda p: fps_pallas(80_000, p), (cloud5,), iters=3)
    timed("B merge chunked (237568->80000)",
          lambda p: fps_pallas_chunked(80_000, p), (cloud5,), iters=3)
    cloud10 = (R.randn(1, 479_232, 3) * 0.5).astype(np.float32)
    timed("B merge chunked (479232->160000)",
          lambda p: fps_pallas_chunked(160_000, p), (cloud10,), iters=3)

    # ---- C: 16x whole-cloud exact end-to-end ---------------------------
    from dispu_tpu.config import GeneratorConfig, InferenceConfig
    import dispu_tpu.inference as inf_mod
    from dispu_tpu.models.generator import DisPUGenerator

    gcfg = GeneratorConfig()
    variables = DisPUGenerator(cfg=gcfg).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 3), jnp.float32),
        train=False)
    orig_fps = inf_mod.farthest_point_sample

    def e2e(tag, n_cloud, merge_impl, repeats):
        if merge_impl is None:
            inf_mod.farthest_point_sample = orig_fps
        else:
            inf_mod.farthest_point_sample = functools.partial(
                orig_fps, impl=merge_impl)
        jax.clear_caches()
        cloud = np.asarray(R.randn(n_cloud, 3), np.float32)
        ups = inf_mod.PatchUpsampler(
            variables, gcfg, InferenceConfig(final_ratio=16))
        out = ups.upsample(cloud)  # warmup/compile
        assert np.isfinite(np.asarray(out)).all()
        assert out.shape[0] == 16 * n_cloud, out.shape
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            out = ups.upsample(cloud)
            assert np.isfinite(float(np.sum(np.asarray(out))))
            times.append(time.perf_counter() - t0)
        times.sort()
        print(f"C {tag}: min {times[0]*1e3:.0f} ms  "
              f"median {times[len(times)//2]*1e3:.0f} ms", flush=True)

    try:
        e2e("16x 5k exact, merge=wide(auto)", 5000, None, repeats=5)
        e2e("16x 5k exact, merge=chunked", 5000, "chunked", repeats=5)
        e2e("16x 10k exact, merge=chunked", 10_000, "chunked", repeats=3)
    finally:
        inf_mod.farthest_point_sample = orig_fps


if __name__ == "__main__":
    main()
