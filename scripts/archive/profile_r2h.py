"""Round-2 session H: 2-D-layout FPS kernel + whole-cloud + batch sweep.

Run: cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
        python -u scripts/profile_r2h.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from scripts.harness import timed

R = np.random.RandomState(0)


def main():
    print("backend:", jax.default_backend(), flush=True)

    from dispu_tpu.ops.pallas_kernels import fps_pallas
    from dispu_tpu.ops.sampling import _fps_xla

    # parity at several scales (incl. non-divisible n)
    for (b, n, m) in ((4, 1024, 256), (2, 5000, 512), (1, 61440, 1024)):
        pts = jnp.asarray(R.randn(b, n, 3), jnp.float32)
        i_x = jax.jit(lambda p, m=m: _fps_xla(m, p))(pts)
        i_p = jax.jit(lambda p, m=m: fps_pallas(m, p))(pts)
        print(f"fps ({b},{n})->{m} parity:",
              bool(jnp.array_equal(i_x, i_p)), flush=True)

    big = jnp.asarray(R.randn(1, 61440, 3), jnp.float32)
    timed("fps 61440->8192 [2D layout]",
          lambda p: fps_pallas(8192, p), (big,), iters=5)
    small = jnp.asarray(R.randn(28, 1024, 3), jnp.float32)
    timed("fps (28,1024)->256 [2D layout]",
          lambda p: fps_pallas(256, p), (small,))

    # whole-cloud inference 5k -> 20k
    from dispu_tpu.config import GeneratorConfig, InferenceConfig
    from dispu_tpu.inference import PatchUpsampler
    from dispu_tpu.models.generator import DisPUGenerator

    gen = GeneratorConfig()
    model = DisPUGenerator(cfg=gen)
    seed_in = jnp.asarray(R.randn(4, gen.num_points, 3), jnp.float32)
    vs = jax.jit(lambda: model.init(jax.random.PRNGKey(0), seed_in,
                                    train=False))()
    ups = PatchUpsampler(vs, gen_cfg=gen, inf_cfg=InferenceConfig())
    cloud = np.random.RandomState(1).randn(5000, 3).astype(np.float32)
    out = ups.upsample(cloud)  # compile
    t0 = time.perf_counter()
    out = ups.upsample(cloud)
    dt = time.perf_counter() - t0
    print(f"whole-cloud 5000->{len(out)}: {dt:.3f} s", flush=True)

    # inference batch sweep (turbo config, bench workload)
    model_t = DisPUGenerator(cfg=GeneratorConfig(
        fast_gather=True, fast_gather_backbone=True))
    for bs in (64, 128, 256):
        inp = jnp.asarray(R.randn(bs, 256, 3), jnp.float32)
        vs_t = jax.jit(lambda inp=inp: model_t.init(
            jax.random.PRNGKey(0), inp, train=False))()
        ms = timed(f"e2e turbo b={bs}",
                   lambda v, x: model_t.apply(v, x, train=False),
                   (vs_t, inp), iters=10)
        print(f"   -> {bs / (ms / 1000):.0f} patches/sec", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
