"""Round-4 session G: traffic-lean wide FPS kernel (lite) A/B.

r4f measured the exact 16x merge FPS at 236 ms (5k cloud,
237568->80000) on the wide kernel — the largest single component of
the 536 ms whole-cloud exact pipeline.  ``fps_pallas_lite`` removes
~1/3 of the wide kernel's per-round VMEM traffic (dynamic row-slice
coordinate extraction instead of 3 full-plane masked maxes, no
redundant valid re-mask, narrow dynamic-sublane output-row writes)
with bit-identical selection.

Measures (one chip session, in-session A/B):
  A. patch-scale FPS (28,1024)->256: wide | lite       (training shape)
  P. on-chip parity: lite vs wide bit-equal at the 5k merge scale
  B. merge-scale FPS isolated: wide | lite at (1,237568)->80000
  C. 16x whole-cloud exact e2e on the 5k cloud: merge=wide vs
     merge=lite (same session; r4f same shapes: 524/536 ms wide)

Decision: if lite wins at merge scale with parity ok, route
farthest_point_sample's wide-envelope dispatch to the lite kernel and
swap the bench guard leg accordingly.

Run on the TPU (one process — chip grants are slow):
    cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
        python -u scripts/profile_r4g.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from scripts.harness import timed

R = np.random.RandomState(0)


def main():
    print("backend:", jax.default_backend(), flush=True)

    from dispu_tpu.ops.pallas_kernels import fps_pallas, fps_pallas_lite
    from dispu_tpu.ops.sampling import _fps_pallas_fits

    # ---- A: patch scale ------------------------------------------------
    pts = R.randn(28, 1024, 3).astype(np.float32)
    timed("A fps wide (28,1024)->256", lambda p: fps_pallas(256, p),
          (pts,), iters=30)
    timed("A fps lite (28,1024)->256", lambda p: fps_pallas_lite(256, p),
          (pts,), iters=30)

    # ---- P: parity at the 5k-cloud merge scale -------------------------
    cloud5 = (R.randn(1, 237_568, 3) * 0.5).astype(np.float32)
    w = np.asarray(fps_pallas(80_000, jnp.asarray(cloud5)))
    l = np.asarray(fps_pallas_lite(80_000, jnp.asarray(cloud5)))
    print("P merge-scale parity lite==wide:",
          "ok" if np.array_equal(w, l) else "MISMATCH", flush=True)

    # ---- B: merge scale isolated ---------------------------------------
    timed("B merge wide (237568->80000)",
          lambda p: fps_pallas(80_000, p), (cloud5,), iters=3)
    timed("B merge lite (237568->80000)",
          lambda p: fps_pallas_lite(80_000, p), (cloud5,), iters=3)

    # ---- C: 16x whole-cloud exact end-to-end ---------------------------
    from dispu_tpu.config import GeneratorConfig, InferenceConfig
    import dispu_tpu.inference as inf_mod
    from dispu_tpu.models.generator import DisPUGenerator

    gcfg = GeneratorConfig()
    variables = DisPUGenerator(cfg=gcfg).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 3), jnp.float32),
        train=False)
    orig_fps = inf_mod.farthest_point_sample

    def lite_dispatch(npoint, xyz, impl="auto"):
        if impl == "auto" and _fps_pallas_fits(xyz.shape[1], npoint):
            return fps_pallas_lite(npoint, xyz)
        return orig_fps(npoint, xyz, impl)

    def e2e(tag, fps_fn, repeats=5):
        inf_mod.farthest_point_sample = fps_fn
        jax.clear_caches()
        cloud = np.asarray(R.randn(5000, 3), np.float32)
        ups = inf_mod.PatchUpsampler(
            variables, gcfg, InferenceConfig(final_ratio=16))
        out = ups.upsample(cloud)  # warmup/compile
        assert np.isfinite(np.asarray(out)).all()
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
        e2e("16x 5k exact, merge=wide", orig_fps)
        e2e("16x 5k exact, merge=lite", lite_dispatch)
    finally:
        inf_mod.farthest_point_sample = orig_fps


if __name__ == "__main__":
    main()
