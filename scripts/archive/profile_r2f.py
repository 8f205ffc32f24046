"""Round-2 session F: skinny (c=3) gather/scatter formulations.

The native TPU row gather pads each 3-wide row to the 128-lane tile, so a
7 MB xyz neighborhood gather moves ~300 MB.  Candidates re-express it as
per-coordinate *lane* gathers/scatters.

Run: cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
        python -u scripts/profile_r2f.py
"""

import numpy as np
import jax
import jax.numpy as jnp

from scripts.harness import timed

R = np.random.RandomState(0)


def g_native(tbl, idx):
    return jax.vmap(lambda p, i: p[i])(tbl, idx)


def g_tala(tbl, idx):
    return jnp.take_along_axis(tbl, idx[..., None], axis=1)


def g_lanes(tbl, idx):
    # (b, n, c) -> (b, c, n); gather q lanes per (batch, coordinate) row
    tT = jnp.swapaxes(tbl, 1, 2)
    out = jnp.take_along_axis(tT, idx[:, None, :], axis=2)  # (b, c, q)
    return jnp.swapaxes(out, 1, 2)


def s_native(g, idx, n):
    zeros = jnp.zeros((g.shape[0], n, g.shape[-1]), g.dtype)
    return jax.vmap(lambda z, i, u: z.at[i].add(u))(zeros, idx, g)


def s_lanes(g, idx, n):
    gT = jnp.swapaxes(g, 1, 2)  # (b, c, q)
    zeros = jnp.zeros((g.shape[0], g.shape[-1], n), g.dtype)
    out = jax.vmap(jax.vmap(lambda z, i, u: z.at[i].add(u),
                            in_axes=(0, None, 0)))(zeros, idx, gT)
    return jnp.swapaxes(out, 1, 2)


def main():
    print("backend:", jax.default_backend(), flush=True)

    for (b, n, q) in ((28, 1024, 20480), (64, 1024, 16384)):
        tbl = jnp.asarray(R.randn(b, n, 3), jnp.float32)
        idx = jnp.asarray(R.randint(0, n, (b, q)), jnp.int32)
        r0 = jax.jit(g_native)(tbl, idx)
        for name, fn in (("take_along_axis", g_tala), ("lane-gather", g_lanes)):
            r1 = jax.jit(fn)(tbl, idx)
            assert bool(jnp.array_equal(r0, r1)), name
        print(f"gather variants bit-identical at ({b},{n},{q})", flush=True)
        timed(f"xyz gather native ({b},{q})", g_native, (tbl, idx))
        timed(f"xyz gather take_along ({b},{q})", g_tala, (tbl, idx))
        timed(f"xyz gather lanes ({b},{q})", g_lanes, (tbl, idx))

        upd = jnp.asarray(R.randn(b, q, 3), jnp.float32)
        s0 = jax.jit(lambda g, i: s_native(g, i, n))(upd, idx)
        s1 = jax.jit(lambda g, i: s_lanes(g, i, n))(upd, idx)
        dev = float(jnp.max(jnp.abs(s0 - s1)))
        print(f"scatter lane-form max|dev|: {dev:.3e}", flush=True)
        timed(f"xyz scatter native ({b},{q})",
              lambda g, i: s_native(g, i, n), (upd, idx))
        timed(f"xyz scatter lanes ({b},{q})",
              lambda g, i: s_lanes(g, i, n), (upd, idx))

    # wide-row sanity: is the lane form also fine at c=128?
    tbl = jnp.asarray(R.randn(64, 1024, 128), jnp.float32)
    idx = jnp.asarray(R.randint(0, 1024, (64, 16384)), jnp.int32)
    timed("wide gather native (64,16384,128)", g_native, (tbl, idx))
    timed("wide gather lanes (64,16384,128)", g_lanes, (tbl, idx))

    print("done", flush=True)


if __name__ == "__main__":
    main()
