"""Shared on-chip measurement harness for the profile scripts.

Extracted from the round-2 session script (scripts/archive/profile_r2.py)
once later rounds started importing it — every profile session uses this
one timing primitive.

Methodology (PERFORMANCE.md "Round-2 refiner decomposition"): time a
``lax.scan`` of the op INSIDE one jit with a data dependency between
iterations, and checksum EVERY output element into the carry.  A
single-element carry lets XLA slice the dot / DCE everything not feeding
that element and produces fantasy numbers; per-dispatch timing through
the axon tunnel (~1.6 ms round trip) poisons naive microbenchmarks.  The
trailing ``float()`` is the host fetch that bounds completion —
``jax.block_until_ready`` does not guarantee it on this backend.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def timed(label, fn, args, iters=30):
    """ms/iter of fn(*args) via an in-jit scan with a data dependency."""
    args = tuple(jax.tree.map(jnp.asarray, a) for a in args)

    def perturb(a, c):
        done = [False]

        def go(x):
            if not done[0] and jnp.issubdtype(x.dtype, jnp.floating):
                done[0] = True
                return x + c.astype(x.dtype) * 1e-30
            return x

        return jax.tree.map(go, a)

    @jax.jit
    def loop(args):
        def body(c, _):
            out = fn(*tuple(perturb(a, c) for a in args))
            # checksum EVERY output element: a single-element carry lets
            # XLA slice the dot/DCE everything not feeding that element
            # (pallas calls are opaque and stay whole — XLA ops must too)
            tot = jnp.float32(0.0)
            for leaf in jax.tree_util.tree_leaves(out):
                tot = tot + jnp.sum(leaf).astype(jnp.float32)
            return tot * 1e-30, ()

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    float(loop(args))  # compile + warm
    t0 = time.perf_counter()
    float(loop(args))
    ms = (time.perf_counter() - t0) / iters * 1000
    print(f"{label:55s} {ms:8.2f} ms/iter", flush=True)
    return ms
