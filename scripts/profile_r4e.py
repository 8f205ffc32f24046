"""Round-4 session E: whole-cloud 16x exact (section D of r4c/r4d).

r4d's section D crashed at compile time: on a 10k-point cloud the 16x
merge FPS (160k samples from ~479k merged points) routed to the
VMEM-resident Pallas kernel, whose scoped stack measures 18.80 MiB
against the 16 MiB limit.  farthest_point_sample's auto dispatch now
gates on the calibrated envelope (ops/sampling._fps_pallas_fits) and
falls back to the XLA loop above it.  This script measures:

  D1: 16x exact on the 5k cloud — the round-3-comparable shape
      (r3 session: 506 ms; VERDICT r3 item 2 target <= ~420 ms).
  D2: 16x exact on the 10k cloud — proves the gate end-to-end (this
      shape did not compile before the fix).

Run on the TPU (one process — chip grants are slow):
    cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
        python -u scripts/profile_r4e.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

R = np.random.RandomState(0)


def main():
    print("backend:", jax.default_backend(), flush=True)

    from dispu_tpu.config import GeneratorConfig, InferenceConfig
    from dispu_tpu.inference import PatchUpsampler
    from dispu_tpu.models.generator import DisPUGenerator

    gcfg = GeneratorConfig()
    variables = DisPUGenerator(cfg=gcfg).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 3), jnp.float32),
        train=False)

    for tag, n_cloud, repeats in (("D1 5k", 5000, 5), ("D2 10k", 10000, 3)):
        cloud = np.asarray(R.randn(n_cloud, 3), np.float32)
        ups = PatchUpsampler(variables, gcfg, InferenceConfig(final_ratio=16))
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
        print(f"{tag} 16x whole-cloud exact: min {times[0]*1e3:.0f} ms  "
              f"median {times[len(times)//2]*1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
