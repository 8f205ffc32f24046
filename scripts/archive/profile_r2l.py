"""Round-2 session L: grid-step overhead — query-tile size sweep.

Run: cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
        python -u scripts/profile_r2l.py
"""

import numpy as np
import jax
import jax.numpy as jnp

from scripts.harness import timed

R = np.random.RandomState(0)


def main():
    print("backend:", jax.default_backend(), flush=True)

    from dispu_tpu.ops.pallas_kernels import knn_pallas, query_ball_pallas

    xyz = jnp.asarray(R.randn(64, 1024, 3), jnp.float32)
    for tm in (128, 256, 512, 1024):
        timed(f"knn xyz (64,1024) k16 tile_m={tm}",
              lambda p, t=tm: knn_pallas(16, p, p, tile_m=t), (xyz,))
    # parity at the candidate tile
    d_a, i_a = jax.jit(lambda p: knn_pallas(16, p, p, tile_m=256))(xyz)
    d_b, i_b = jax.jit(lambda p: knn_pallas(16, p, p, tile_m=1024))(xyz)
    print("tile_m parity:", bool(jnp.array_equal(i_a, i_b)
                                 and jnp.array_equal(d_a, d_b)), flush=True)

    pts = jnp.asarray(R.randn(28, 1024, 3) * 0.5, jnp.float32)
    for tm in (256, 512, 1024):
        timed(f"ball (28,1024) ns=20 tile_m={tm}",
              lambda p, t=tm: query_ball_pallas(0.07, 20, p, p, tile_m=t),
              (pts,))

    feats = jnp.asarray(R.randn(64, 256, 48), jnp.float32)
    timed("knn feat (64,256,48) k17 tile_m=256",
          lambda p: knn_pallas(17, p, p, tile_m=256), (feats,))

    print("done", flush=True)


if __name__ == "__main__":
    main()
