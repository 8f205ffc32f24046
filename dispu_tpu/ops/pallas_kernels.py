"""Pallas TPU kernels for the hot sequential ops.

Currently:
  * ``fps_pallas`` — farthest-point sampling.  FPS is inherently sequential
    in the sample count (ref kernel: tf_ops/sampling/tf_sampling_g.cu:105-170
    runs m block-wide argmax rounds).  The XLA ``fori_loop`` version round-
    trips the running min-distance vector through HBM every iteration; this
    kernel keeps the coordinate rows and the min-distance vector resident in
    VMEM for the entire loop, so each round is a handful of VPU passes over
    lanes plus a scalar update — the memory traffic drops from
    O(m·n) HBM to O(n) once.
  * ``nn_distance_chunked`` — pure-XLA streaming nearest-neighbor distance
    for clouds whose full (n, m) matrix would blow HBM (whole-cloud eval).

Correctness of the kernel is tested in interpreter mode on CPU against the
jnp implementation (tests/test_pallas.py); the jnp path remains the
fallback on non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _make_fps_kernel(npoint: int, rows: int):
    def kernel(actual_n_ref, pts_ref, out_ref, mindist_ref):
        """One grid step = one cloud.

        pts (1, 3, rows, n/rows) VMEM; out (1, 1, m_pad).  The coordinate
        planes are laid out 2-D — a (1, n) vector would occupy one sublane
        of each (8, 128) VPU tile, wasting 7/8 of every elementwise pass,
        and FPS is nothing but elementwise passes over these planes.
        Flat indices are row-major, so selection order (first-occurrence
        argmax) is identical to the 1-D layout, bit for bit.
        """
        nr = pts_ref.shape[-1]
        n = rows * nr
        actual_n = actual_n_ref[0]

        flat = (
            jax.lax.broadcasted_iota(jnp.int32, (rows, nr), 0) * nr
            + jax.lax.broadcasted_iota(jnp.int32, (rows, nr), 1)
        )
        valid = flat < actual_n
        m_pad = out_ref.shape[-1]
        lane_m = jax.lax.broadcasted_iota(jnp.int32, (1, m_pad), 1)

        x = pts_ref[0, 0]  # (rows, nr)
        y = pts_ref[0, 1]
        z = pts_ref[0, 2]

        # seed with index 0 (ref:tf_sampling_g.cu:114-116)
        out_ref[0, :, :] = jnp.zeros((1, m_pad), jnp.int32)
        mindist_ref[:, :] = jnp.where(valid, 1e38, -1.0)

        def body(j, last):
            # scalar reads of the last-selected point's coordinates
            px = jnp.max(jnp.where(flat == last, x, -jnp.inf))
            py = jnp.max(jnp.where(flat == last, y, -jnp.inf))
            pz = jnp.max(jnp.where(flat == last, z, -jnp.inf))
            d = (x - px) ** 2 + (y - py) ** 2 + (z - pz) ** 2
            md = jnp.minimum(mindist_ref[:, :], d)
            md = jnp.where(valid, md, -1.0)
            mindist_ref[:, :] = md
            # first-index argmax (matches jnp.argmax tie-breaking)
            maxval = jnp.max(md)
            nxt = jnp.min(jnp.where(md == maxval, flat, n)).astype(jnp.int32)
            # masked row write (Mosaic rejects scalar stores to VMEM)
            out_ref[0, :, :] = jnp.where(lane_m == j, nxt, out_ref[0, :, :])
            return nxt

        jax.lax.fori_loop(1, npoint, body, jnp.int32(0))

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 2))
def fps_pallas(npoint: int, xyz: jnp.ndarray, interpret: bool = False):
    """Farthest-point sampling via a VMEM-resident Pallas kernel.

    Args:
      npoint: samples per cloud (static).
      xyz: (b, n, 3) float32.
      interpret: run in interpreter mode (CPU testing).

    Returns:
      (b, npoint) int32 indices, first always 0 — identical semantics to
      ``dispu_tpu.ops.sampling.farthest_point_sample``.
    """
    b, n, _ = xyz.shape
    rows = 8  # full (8, 128) VPU tiles
    n_pad = _round_up(max(n, rows * 128), rows * 128)
    nr = n_pad // rows
    m_pad = _round_up(max(npoint, 128), 128)
    # indices carry no gradient (ref: NoGradient); stopping tangents here
    # also keeps reverse-mode linearization away from the pallas_call
    xyz = jax.lax.stop_gradient(xyz)
    pts = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)  # (b, 3, n)
    if n_pad != n:
        pts = jnp.pad(pts, ((0, 0), (0, 0), (0, n_pad - n)))
    pts = pts.reshape(b, 3, rows, nr)  # row-major: flat index preserved

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, 3, rows, nr), lambda i, *_: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, m_pad), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((rows, nr), jnp.float32)],
    )

    out = pl.pallas_call(
        _make_fps_kernel(npoint, rows),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, 1, m_pad), jnp.int32),
        interpret=interpret,
    )(jnp.array([n], jnp.int32), pts)
    return jax.lax.stop_gradient(out[:, 0, :npoint])


def _make_fps_lite_kernel(npoint: int, rows: int):
    def kernel(actual_n_ref, pts_ref, out_ref, mindist_ref):
        """Traffic-lean form of ``_make_fps_kernel`` (bit-identical output).

        Three of the wide kernel's per-round full-plane sweeps go away:

        * coordinate extraction reads ONE dynamically-sliced (1, nr) row
          per plane (the selected index's sublane row) instead of a
          full-plane ``where(flat == last)`` masked max — 1/8 of the
          traffic at rows=8;
        * the ``where(valid, md, -1)`` re-mask is dropped: invalid
          (padded) entries are initialized to -1 and squared distances
          are >= 0, so ``min`` preserves the -1 sentinel by itself;
        * the output write is a masked (1, 128) row at a dynamic sublane
          offset instead of a full (1, m_pad) read-modify-write — at
          merge scale (m_pad 80k+) that full row costs more than a
          coordinate plane.

        Selection math and order are unchanged, so results stay
        bit-identical to ``_make_fps_kernel`` and ``_fps_xla`` —
        pinned by interpret-mode tests and verified on chip in the
        one-off scripts/profile_r4g.py session.  NOTE: unlike the wide
        and chunked kernels, this non-default variant has NO ongoing
        bench.parity_guard leg; re-verify on chip before promoting it.
        """
        nr = pts_ref.shape[-1]
        n = rows * nr
        actual_n = actual_n_ref[0]
        m_rows = out_ref.shape[1]

        flat = (
            jax.lax.broadcasted_iota(jnp.int32, (rows, nr), 0) * nr
            + jax.lax.broadcasted_iota(jnp.int32, (rows, nr), 1)
        )
        lane_nr = jax.lax.broadcasted_iota(jnp.int32, (1, nr), 1)
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        x = pts_ref[0, 0]  # (rows, nr)
        y = pts_ref[0, 1]
        z = pts_ref[0, 2]

        out_ref[0] = jnp.zeros((m_rows, 128), jnp.int32)
        mindist_ref[:, :] = jnp.where(flat < actual_n, 1e38, -1.0)

        def body(j, last):
            # the selected point's coordinates: one (1, nr) sublane row
            # per plane + an in-row masked max
            r = last // nr
            c = last - r * nr
            hit = lane_nr == c
            px = jnp.max(jnp.where(hit, pts_ref[0, 0, pl.ds(r, 1), :],
                                   -jnp.inf))
            py = jnp.max(jnp.where(hit, pts_ref[0, 1, pl.ds(r, 1), :],
                                   -jnp.inf))
            pz = jnp.max(jnp.where(hit, pts_ref[0, 2, pl.ds(r, 1), :],
                                   -jnp.inf))
            d = (x - px) ** 2 + (y - py) ** 2 + (z - pz) ** 2
            md = jnp.minimum(mindist_ref[:, :], d)  # invalid stays -1
            mindist_ref[:, :] = md
            # first-index argmax (matches jnp.argmax tie-breaking)
            maxval = jnp.max(md)
            nxt = jnp.min(jnp.where(md == maxval, flat, n)).astype(jnp.int32)
            jr = j // 128
            cur = out_ref[0, pl.ds(jr, 1), :]
            out_ref[0, pl.ds(jr, 1), :] = jnp.where(
                lane128 == j - jr * 128, nxt, cur
            )
            return nxt

        jax.lax.fori_loop(1, npoint, body, jnp.int32(0))

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 2))
def fps_pallas_lite(npoint: int, xyz: jnp.ndarray, interpret: bool = False):
    """Traffic-lean wide FPS kernel (see _make_fps_lite_kernel).

    Same contract and bit-identical results as :func:`fps_pallas`; ~2/3
    of its per-round VMEM traffic (scripts/profile_r4g.py A/B).
    """
    b, n, _ = xyz.shape
    rows = 8
    n_pad = _round_up(max(n, rows * 128), rows * 128)
    nr = n_pad // rows
    m_pad = _round_up(max(npoint, 128), 128)
    xyz = jax.lax.stop_gradient(xyz)
    pts = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)  # (b, 3, n)
    if n_pad != n:
        pts = jnp.pad(pts, ((0, 0), (0, 0), (0, n_pad - n)))
    pts = pts.reshape(b, 3, rows, nr)  # row-major: flat index preserved

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, 3, rows, nr), lambda i, *_: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, m_pad // 128, 128), lambda i, *_: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((rows, nr), jnp.float32)],
    )

    out = pl.pallas_call(
        _make_fps_lite_kernel(npoint, rows),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, m_pad // 128, 128), jnp.int32),
        interpret=interpret,
    )(jnp.array([n], jnp.int32), pts)
    return jax.lax.stop_gradient(out.reshape(b, m_pad)[:, :npoint])


def _make_fps_chunked_kernel(npoint: int, width: int):
    def kernel(actual_n_ref, pts_ref, out_ref, mindist_ref):
        """One grid step = one cloud, n axis chunked into (8, width) tiles.

        pts (1, 3, nc, 8, width) VMEM; out (1, m_pad//128, 128);
        mindist scratch (nc, 8, width).  ``width`` trades loop
        iterations per round (nc = n_pad / (8·width), each serialized
        by the running-argmax carry) against temporary size — large
        widths approach the wide kernel's full-array pipelining while
        keeping the scoped stack width-bounded instead of n-bounded.
        Each round runs ONE fused sweep
        over the chunks: the distance update, the min-distance store,
        and a running argmax (value, flat index, AND the winning point's
        coordinates) all ride the same chunk loads, so per-round VMEM
        traffic is 3 coordinate-plane reads + the mindist read/write —
        the wide kernel (``_make_fps_kernel``) pays ~2x that because its
        coordinate extraction (3 full where+max passes over (8, nr))
        and selection run as separate full-array sweeps.  Temporaries
        are (8, 128)-sized instead of (8, nr)-sized, so the scoped-VMEM
        stack stays small and the envelope covers merge scales the wide
        kernel cannot compile at (18.8 MiB stack at n_pad=479232).

        Selection semantics are bit-identical to ``_fps_xla``: chunks
        are visited in natural point order and the running argmax uses
        strict ``>``, so equal-distance ties keep the earliest chunk;
        the final reduction takes the minimum flat index among tied
        candidate positions — together that is exactly jnp.argmax's
        first-occurrence rule.  Invalid (padded) entries hold mindist
        -1, which ``min`` preserves (squared distances are >= 0) and the
        final ``maxval >= 0`` candidate mask excludes.
        """
        nc = pts_ref.shape[2]
        cw = 8 * width  # points per chunk
        n = nc * cw
        actual_n = actual_n_ref[0]
        m_rows = out_ref.shape[1]

        row_l = (
            jax.lax.broadcasted_iota(jnp.int32, (8, width), 0) * width
            + jax.lax.broadcasted_iota(jnp.int32, (8, width), 1)
        )
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def init_chunk(c, _):
            mindist_ref[c] = jnp.where(
                c * cw + row_l < actual_n, 1e38, -1.0
            )
            return 0

        jax.lax.fori_loop(0, nc, init_chunk, 0)
        out_ref[0] = jnp.zeros((m_rows, 128), jnp.int32)

        # seed with index 0 (ref:tf_sampling_g.cu:114-116): extract the
        # first point's coordinates from chunk 0
        first = row_l == 0
        c0x = jnp.max(jnp.where(first, pts_ref[0, 0, 0], -jnp.inf))
        c0y = jnp.max(jnp.where(first, pts_ref[0, 1, 0], -jnp.inf))
        c0z = jnp.max(jnp.where(first, pts_ref[0, 2, 0], -jnp.inf))

        def round_body(j, q):
            qx, qy, qz = q

            def chunk(c, cc):
                maxvec, flatvec, xv, yv, zv = cc
                xc = pts_ref[0, 0, c]
                yc = pts_ref[0, 1, c]
                zc = pts_ref[0, 2, c]
                d = (xc - qx) ** 2 + (yc - qy) ** 2 + (zc - qz) ** 2
                nmd = jnp.minimum(mindist_ref[c], d)
                mindist_ref[c] = nmd
                upd = nmd > maxvec
                return (
                    jnp.where(upd, nmd, maxvec),
                    jnp.where(upd, c * cw + row_l, flatvec),
                    jnp.where(upd, xc, xv),
                    jnp.where(upd, yc, yv),
                    jnp.where(upd, zc, zv),
                )

            zero = jnp.zeros((8, width), jnp.float32)
            maxvec, flatvec, xv, yv, zv = jax.lax.fori_loop(
                0, nc, chunk,
                (jnp.full((8, width), -2.0, jnp.float32),
                 jnp.zeros((8, width), jnp.int32), zero, zero, zero),
            )
            maxval = jnp.max(maxvec)
            cand = maxvec == maxval
            nxt = jnp.min(jnp.where(cand, flatvec, n)).astype(jnp.int32)
            # candidate positions carry distinct flats, so exactly one
            # position matches nxt — its coords seed the next round
            sel = cand & (flatvec == nxt)
            # masked (1, 128) row write at a dynamic sublane offset
            # (Mosaic rejects scalar VMEM stores)
            jr = j // 128
            cur = out_ref[0, pl.ds(jr, 1), :]
            out_ref[0, pl.ds(jr, 1), :] = jnp.where(
                lane == j - jr * 128, nxt, cur
            )
            return (
                jnp.max(jnp.where(sel, xv, -jnp.inf)),
                jnp.max(jnp.where(sel, yv, -jnp.inf)),
                jnp.max(jnp.where(sel, zv, -jnp.inf)),
            )

        jax.lax.fori_loop(1, npoint, round_body, (c0x, c0y, c0z))

    return kernel


def _make_fps_chunked_batch_kernel(npoint: int, width: int, bsz: int):
    def kernel(actual_n_ref, pts_ref, out_ref, mindist_ref):
        """Batch-fused chunked FPS: ONE grid step advances ``bsz`` clouds
        together — round j selects the j-th point of EVERY cloud.

        Exact FPS is latency-bound on its serial per-round argmax chain
        (falsified-bandwidth measurement, PERFORMANCE.md "exact merge-FPS
        wall"), so a second independent cloud's chain rides the same
        rounds nearly free: the per-cloud chunk updates inside each
        round carry no cross-cloud dependencies (python-unrolled over
        ``bsz`` with separate carries), giving the scheduler ``bsz``
        independent instruction streams to interleave where the
        single-cloud kernel stalls on its own carry.

        pts (bsz, 3, nc, 8, width) VMEM; out (bsz, m_rows, 128);
        mindist scratch (bsz, nc, 8, width).  Per cloud the arithmetic,
        visit order, and tie rules are exactly
        :func:`_make_fps_chunked_kernel`'s, so selections are
        bit-identical to the single-cloud kernel and the XLA loop
        (pinned by tests/test_pallas.py::TestFPSChunkedBatch).
        """
        nc = pts_ref.shape[2]
        cw = 8 * width
        n = nc * cw
        actual_n = actual_n_ref[0]
        m_rows = out_ref.shape[1]

        row_l = (
            jax.lax.broadcasted_iota(jnp.int32, (8, width), 0) * width
            + jax.lax.broadcasted_iota(jnp.int32, (8, width), 1)
        )
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def init_chunk(c, _):
            md0 = jnp.where(c * cw + row_l < actual_n, 1e38, -1.0)
            for v in range(bsz):
                mindist_ref[v, c] = md0
            return 0

        jax.lax.fori_loop(0, nc, init_chunk, 0)
        for v in range(bsz):
            out_ref[v] = jnp.zeros((m_rows, 128), jnp.int32)

        first = row_l == 0
        q0 = []
        for v in range(bsz):
            q0.extend([
                jnp.max(jnp.where(first, pts_ref[v, 0, 0], -jnp.inf)),
                jnp.max(jnp.where(first, pts_ref[v, 1, 0], -jnp.inf)),
                jnp.max(jnp.where(first, pts_ref[v, 2, 0], -jnp.inf)),
            ])

        def round_body(j, q):
            def chunk(c, cc):
                out = []
                for v in range(bsz):
                    maxvec, flatvec, xv, yv, zv = cc[5 * v: 5 * v + 5]
                    qx, qy, qz = q[3 * v: 3 * v + 3]
                    xc = pts_ref[v, 0, c]
                    yc = pts_ref[v, 1, c]
                    zc = pts_ref[v, 2, c]
                    d = (xc - qx) ** 2 + (yc - qy) ** 2 + (zc - qz) ** 2
                    nmd = jnp.minimum(mindist_ref[v, c], d)
                    mindist_ref[v, c] = nmd
                    upd = nmd > maxvec
                    out.extend([
                        jnp.where(upd, nmd, maxvec),
                        jnp.where(upd, c * cw + row_l, flatvec),
                        jnp.where(upd, xc, xv),
                        jnp.where(upd, yc, yv),
                        jnp.where(upd, zc, zv),
                    ])
                return tuple(out)

            zero = jnp.zeros((8, width), jnp.float32)
            init = []
            for _ in range(bsz):
                init.extend([
                    jnp.full((8, width), -2.0, jnp.float32),
                    jnp.zeros((8, width), jnp.int32), zero, zero, zero,
                ])
            cc = jax.lax.fori_loop(0, nc, chunk, tuple(init))

            jr = j // 128
            lane_match = lane == j - jr * 128
            nq = []
            for v in range(bsz):
                maxvec, flatvec, xv, yv, zv = cc[5 * v: 5 * v + 5]
                maxval = jnp.max(maxvec)
                cand = maxvec == maxval
                nxt = jnp.min(jnp.where(cand, flatvec, n)).astype(jnp.int32)
                sel = cand & (flatvec == nxt)
                cur = out_ref[v, pl.ds(jr, 1), :]
                out_ref[v, pl.ds(jr, 1), :] = jnp.where(
                    lane_match, nxt, cur
                )
                nq.extend([
                    jnp.max(jnp.where(sel, xv, -jnp.inf)),
                    jnp.max(jnp.where(sel, yv, -jnp.inf)),
                    jnp.max(jnp.where(sel, zv, -jnp.inf)),
                ])
            return tuple(nq)

        jax.lax.fori_loop(1, npoint, round_body, tuple(q0))

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def fps_pallas_chunked_batch(
    npoint: int, xyz: jnp.ndarray, interpret: bool = False,
    width: int = 256,
):
    """Batch-fused chunked FPS: all ``b`` clouds advance per round (see
    _make_fps_chunked_batch_kernel).  Same contract as
    :func:`fps_pallas_chunked` per cloud — (b, npoint) int32, seed index
    0, bit-identical selection — with the serial round chain amortized
    across the batch (the streaming inference API's merge stage,
    VERDICT r4 item 6).  ``width`` default 256: the round-5 on-chip
    sweep at the 16x merge scale (80k from 237.5k, scripts/profile_r5c)
    measured per-cloud 209.6/148.7/141.8 ms at b=2 width 128/256/512
    and 193.9/136.0/181.2 ms at b=3 — 256 is the sweet spot for both
    production batch sizes (b=3 @ 512 regresses on VMEM pressure), vs
    283 ms for the b=1 kernel: **2.08×** per-cloud at b=3.  Caller
    gates VMEM residency (ops.sampling._fps_chunked_fits with the b×
    multiplier)."""
    assert width % 128 == 0 and width > 0
    b, n, _ = xyz.shape
    cw = 8 * width
    n_pad = _round_up(max(n, cw), cw)
    nc = n_pad // cw
    m_pad = _round_up(max(npoint, 128), 128)
    xyz = jax.lax.stop_gradient(xyz)
    pts = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)  # (b, 3, n)
    if n_pad != n:
        pts = jnp.pad(pts, ((0, 0), (0, 0), (0, n_pad - n)))
    pts = pts.reshape(b, 3, nc, 8, width)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(
                (b, 3, nc, 8, width), lambda i, *_: (0, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (b, m_pad // 128, 128), lambda i, *_: (0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((b, nc, 8, width), jnp.float32)],
    )

    out = pl.pallas_call(
        _make_fps_chunked_batch_kernel(npoint, width, b),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, m_pad // 128, 128), jnp.int32),
        interpret=interpret,
    )(jnp.array([n], jnp.int32), pts)
    return jax.lax.stop_gradient(out.reshape(b, m_pad)[:, :npoint])


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def fps_pallas_chunked(
    npoint: int, xyz: jnp.ndarray, interpret: bool = False,
    width: int = 128,
):
    """Chunked-sweep farthest-point sampling (see _make_fps_chunked_kernel).

    Same contract as :func:`fps_pallas` — (b, npoint) int32, first index
    0, bit-identical selection to the XLA loop — with ~half the per-round
    VMEM traffic and an envelope that covers whole-cloud 16x merge scales
    (n ~ 479k) where the wide kernel's scoped stack exceeds the 16 MiB
    limit.  ``width`` is the chunk lane count (multiple of 128): bigger
    widths mean fewer serialized loop iterations per round at the cost
    of (8, width)-sized temporaries and coarser n padding.
    """
    assert width % 128 == 0 and width > 0
    b, n, _ = xyz.shape
    cw = 8 * width
    n_pad = _round_up(max(n, cw), cw)
    nc = n_pad // cw
    m_pad = _round_up(max(npoint, 128), 128)
    xyz = jax.lax.stop_gradient(xyz)
    pts = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)  # (b, 3, n)
    if n_pad != n:
        pts = jnp.pad(pts, ((0, 0), (0, 0), (0, n_pad - n)))
    # natural row-major reshape: point i -> (i // cw, (i % cw) // width,
    # i % width) — flat order preserved, so selection parity holds
    pts = pts.reshape(b, 3, nc, 8, width)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, 3, nc, 8, width), lambda i, *_: (i, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, m_pad // 128, 128), lambda i, *_: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((nc, 8, width), jnp.float32)],
    )

    out = pl.pallas_call(
        _make_fps_chunked_kernel(npoint, width),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, m_pad // 128, 128), jnp.int32),
        interpret=interpret,
    )(jnp.array([n], jnp.int32), pts)
    return jax.lax.stop_gradient(out.reshape(b, m_pad)[:, :npoint])


def _make_fps_bucketed_kernel(m_per_bucket: int):
    def kernel(pts_ref, out_ref, mindist_ref):
        """All K bucket-local FPS loops advance together, one point per
        bucket per round.

        pts (1, 3, K, n_b) VMEM — coordinate planes with one bucket per
        row; out (1, K, m_pad).  Exact FPS runs m sequential rounds each
        touching all n points; here round j selects the j-th point of
        EVERY bucket at once — the whole (K, n_b) plane is updated in one
        elementwise pass and the per-bucket argmax is a row-wise
        reduction, so the sequential depth drops from m to m/K and the
        total distance-update work from O(n·m) to O(n·m/K).  Per bucket
        the selection is textbook FPS (seed = local index 0, running min
        squared distance, first-occurrence argmax) — bit-identical to
        running the XLA loop on that bucket alone.
        """
        K, nb = mindist_ref.shape
        m_pad = out_ref.shape[-1]
        lane = jax.lax.broadcasted_iota(jnp.int32, (K, nb), 1)
        lane_m = jax.lax.broadcasted_iota(jnp.int32, (K, m_pad), 1)

        x = pts_ref[0, 0]  # (K, nb)
        y = pts_ref[0, 1]
        z = pts_ref[0, 2]

        out_ref[0] = jnp.zeros((K, m_pad), jnp.int32)  # seed: local idx 0
        mindist_ref[:, :] = jnp.full((K, nb), 1e38, jnp.float32)

        def body(j, sel):
            # per-row extraction of the last-selected point's coordinates
            onehot = lane == sel                       # exactly one per row
            px = jnp.sum(jnp.where(onehot, x, 0.0), axis=1, keepdims=True)
            py = jnp.sum(jnp.where(onehot, y, 0.0), axis=1, keepdims=True)
            pz = jnp.sum(jnp.where(onehot, z, 0.0), axis=1, keepdims=True)
            d = (x - px) ** 2 + (y - py) ** 2 + (z - pz) ** 2
            md = jnp.minimum(mindist_ref[:, :], d)
            mindist_ref[:, :] = md
            mv = jnp.max(md, axis=1, keepdims=True)    # (K, 1)
            nxt = jnp.min(
                jnp.where(md == mv, lane, nb), axis=1, keepdims=True
            ).astype(jnp.int32)                        # first-occurrence
            out_ref[0] = jnp.where(lane_m == j, nxt, out_ref[0])
            return nxt

        jax.lax.fori_loop(
            1, m_per_bucket, body, jnp.zeros((K, 1), jnp.int32)
        )

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 2))
def fps_bucketed_pallas(
    m_per_bucket: int, pts_bucketed: jnp.ndarray, interpret: bool = False
):
    """Per-bucket FPS over a (K, n_b, 3) pre-partitioned cloud.

    Returns (K, m_per_bucket) int32 LOCAL indices (into each bucket's
    n_b axis); per bucket the selection is bit-identical to
    ``sampling._fps_xla(m_per_bucket, pts_bucketed)`` (tested in
    interpret mode and guarded on chip by ``bench.parity_guard``).
    Callers handle the spatial partitioning and the local→global index
    mapping — see ``dispu_tpu.ops.sampling.farthest_point_sample_bucketed``.
    """
    K, nb, _ = pts_bucketed.shape
    K_pad = _round_up(max(K, 8), 8)
    nb_pad = _round_up(max(nb, 128), 128)
    m_pad = _round_up(max(m_per_bucket, 128), 128)
    pts = jnp.transpose(
        jax.lax.stop_gradient(pts_bucketed).astype(jnp.float32), (2, 0, 1)
    )  # (3, K, nb)
    if K_pad != K or nb_pad != nb:
        # edge-padding: padded slots replicate each bucket's last point
        # (padded rows replicate the last bucket) — duplicates have
        # mindist 0 once their twin is selected, so they are only
        # re-picked after a bucket's real content is exhausted
        pts = jnp.pad(
            pts,
            ((0, 0), (0, K_pad - K), (0, nb_pad - nb)),
            mode="edge",
        )
    out = pl.pallas_call(
        _make_fps_bucketed_kernel(m_per_bucket),
        grid=(1,),
        in_specs=[
            pl.BlockSpec(
                (1, 3, K_pad, nb_pad), lambda i: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, K_pad, m_pad), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, K_pad, m_pad), jnp.int32),
        scratch_shapes=[pltpu.VMEM((K_pad, nb_pad), jnp.float32)],
        interpret=interpret,
    )(pts[None])
    return jax.lax.stop_gradient(out[0, :K, :m_per_bucket])


_KNN_SENTINEL = 3.0e37  # must exceed any selectable distance incl. the
                        # 1e30 padded-column bias; finite (see INVARIANT)


def _make_knn_kernel(k: int, variant: str = "maskout"):
    """Fused distance + k-smallest selection, entirely in VMEM.

    One grid step = (one cloud, one query tile).  The (tile_m, n) distance
    tile is computed on the MXU and never leaves VMEM; selection is k
    rounds over the resident tile — replacing XLA's sort-based ``top_k``
    lowering, which dominated the generator's runtime (21 ms → ~2 ms for
    (64, 1024) k=16 on v5e).

    Two selection formulations, bit-identical outputs (both realize the
    lexicographic (value, lane) order):

    * ``maskout``: plain min + first-lane argmin, then the selected
      lane's distance is overwritten with ``_KNN_SENTINEL`` in a VMEM
      scratch tile — ~6 elementwise passes per round.  The tile rewrite
      costs one (tile_m, n) VMEM store per round plus a second resident
      (tile_m, n) tile, but VPU instruction count is the bottleneck at
      large n, not VMEM bandwidth (scripts/profile_r3n.py: 28.0 → 22.9 ms
      at (32, 4096, k=16)).
    * ``walk``: carries the last selected (value, lane) threshold and
      scans for the strictly-next entry without rewriting the tile —
      ~11 passes per round, no scratch.  Wins at small n where the
      maskout's upfront tile copy is not amortized (3.68 vs 4.36 ms at
      (64, 256, k=17)).

    ``knn_pallas(variant="auto")`` picks by n_pad (measured,
    scripts/profile_r3o.py: unroll wins at n_pad 256/1024/4096 — the SSA
    chain drops the per-round scratch load — while maskout keeps a
    narrow win at exactly n_pad=512, 3.83 vs 4.55 ms at (64,512,k16)).
    """

    def kernel(pts_ref, q_ref, bias_ref, idx_ref, dist_ref, *scratch):
        p = pts_ref[0]  # (n_pad, c_pad)
        q = q_ref[0]    # (tm, c_pad)
        n_pad = p.shape[0]
        tm = q.shape[0]
        k_pad = idx_ref.shape[-1]

        p2 = jnp.sum(p * p, axis=1)[None, :]
        q2 = jnp.sum(q * q, axis=1)[:, None]
        # HIGHEST precision: neighbor selection needs f32-exact distances
        # (default single-pass bf16 MXU rounding misranks near neighbors)
        qp = jnp.dot(
            q, p.T,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # MXU
        d = jnp.maximum(q2 - 2.0 * qp + p2, 0.0) + bias_ref[0]

        lane = jax.lax.broadcasted_iota(jnp.int32, (tm, n_pad), 1)
        lane_k = jax.lax.broadcasted_iota(jnp.int32, (tm, k_pad), 1)

        # INVARIANT (load-bearing, both variants): every entry of d must
        # be FINITE and < _KNN_SENTINEL.  The walk advances past an equal
        # value via the lane order; duplicated +inf entries would instead
        # re-select the same lane (inf == inf but the lexicographic step
        # only fires on equality with the carried value, which min()
        # saturates at inf).  The mask-out variant overwrites selected
        # lanes with the sentinel — a real distance at or above it would
        # tie with consumed lanes.  Padded columns therefore use a finite
        # 1e30 bias, never inf — keep it that way.
        if variant == "packed":
            # TURBO selection (documented value deviation — see
            # ``knn_pallas``): each lane's key is one sortable int32 —
            # the f32 distance's bit pattern (monotone under int compare
            # for non-negative floats) with its low ``lb`` mantissa bits
            # replaced by the lane index.  Keys are therefore DISTINCT,
            # so the k smallest keys ascending ARE the selection sequence
            # and each round is a single threshold-min pass (compare +
            # select + min ≈ 3 elementwise passes vs maskout's ~6): no
            # argmin pass, no knockout write, no scratch tile.  Ranking
            # is lexicographic (distance-truncated-to-high-bits, lane):
            # lanes whose distances agree in the top 32-lb bits order by
            # lane index, and returned distances are the truncated keys.
            lb = max(1, (n_pad - 1).bit_length())
            lmask = jnp.int32((1 << lb) - 1)
            bits = jax.lax.bitcast_convert_type(d, jnp.int32)  # d >= 0
            keys = jnp.bitwise_or(jnp.bitwise_and(bits, ~lmask), lane)
            imax = jnp.int32(0x7FFFFFFF)
            idx_acc = jnp.zeros((tm, k_pad), jnp.int32)
            dist_acc = jnp.zeros((tm, k_pad), jnp.float32)
            t = jnp.full((tm, 1), -1, jnp.int32)  # every key is >= 0
            for j in range(k):
                t = jnp.min(jnp.where(keys > t, keys, imax),
                            axis=1, keepdims=True)
                idx_acc = jnp.where(
                    lane_k == j, jnp.bitwise_and(t, lmask), idx_acc)
                dist_acc = jnp.where(
                    lane_k == j,
                    jax.lax.bitcast_convert_type(
                        jnp.bitwise_and(t, ~lmask), jnp.float32),
                    dist_acc)
            idx_ref[0] = idx_acc
            dist_ref[0] = dist_acc
            return

        if variant == "unroll":
            # statically-unrolled mask-out: the tile stays an SSA value
            # across all k rounds — no scratch ref and no per-round VMEM
            # load; the knockout chains through whatever temporaries
            # Mosaic schedules.  Selection order identical to the other
            # two variants (lexicographic (value, lane) min among
            # unconsumed lanes).  Outputs accumulate in (tm, k_pad)
            # values and hit the refs once.
            dc = d
            idx_acc = jnp.zeros((tm, k_pad), jnp.int32)
            dist_acc = jnp.zeros((tm, k_pad), jnp.float32)
            for j in range(k):
                mv2 = jnp.min(dc, axis=1, keepdims=True)
                sel2 = jnp.min(
                    jnp.where(dc == mv2, lane, n_pad),
                    axis=1, keepdims=True,
                )
                idx_acc = jnp.where(lane_k == j, sel2, idx_acc)
                dist_acc = jnp.where(lane_k == j, mv2, dist_acc)
                if j + 1 < k:
                    dc = jnp.where(lane == sel2, _KNN_SENTINEL, dc)
            idx_ref[0] = idx_acc
            dist_ref[0] = dist_acc
            return

        idx_ref[0] = jnp.zeros((tm, k_pad), jnp.int32)
        dist_ref[0] = jnp.zeros((tm, k_pad), jnp.float32)
        if variant == "maskout":
            # min + first-lane argmin over the live tile, then knock the
            # selected lane out by overwriting its distance with the
            # sentinel.  Selection order is the lexicographic (value,
            # lane) minimum among unconsumed lanes — identical to the
            # walk, ties and all.
            (d_ref,) = scratch
            d_ref[:, :] = d

            def body(j, _):
                dc = d_ref[:, :]
                mv2 = jnp.min(dc, axis=1, keepdims=True)
                sel2 = jnp.min(
                    jnp.where(dc == mv2, lane, n_pad),
                    axis=1, keepdims=True,
                )
                idx_ref[0] = jnp.where(lane_k == j, sel2, idx_ref[0])
                dist_ref[0] = jnp.where(lane_k == j, mv2, dist_ref[0])
                d_ref[:, :] = jnp.where(
                    lane == sel2, _KNN_SENTINEL, dc
                )
                return 0

            jax.lax.fori_loop(0, k, body, 0)
            return

        # walk: carries the last selected (value, lane) threshold — the
        # d tile is never rewritten; each round scans for the strictly
        # next entry in (d, lane) lexicographic order.
        def body(j, carry):
            mv, sel = carry  # (tm, 1) f32, (tm, 1) int32
            later = (d > mv) | ((d == mv) & (lane > sel))
            mv2 = jnp.min(
                jnp.where(later, d, jnp.inf), axis=1, keepdims=True
            )
            # (d == mv2) & later ≡ (d == mv2) & ((mv2 > mv) | (lane > sel)):
            # if mv2 > mv, both reduce to d == mv2 (> mv ⊂ later); if
            # mv2 == mv, both reduce to (d == mv) & (lane > sel).  Reusing
            # the materialized `later` drops two broadcast compares per
            # selection round.
            sel2 = jnp.min(
                jnp.where((d == mv2) & later, lane, n_pad),
                axis=1,
                keepdims=True,
            )
            idx_ref[0] = jnp.where(lane_k == j, sel2, idx_ref[0])
            dist_ref[0] = jnp.where(lane_k == j, mv2, dist_ref[0])
            return mv2, sel2

        jax.lax.fori_loop(
            0,
            k,
            body,
            (jnp.full((tm, 1), -jnp.inf, jnp.float32),
             jnp.full((tm, 1), -1, jnp.int32)),
        )

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 4, 5, 6))
def knn_pallas(
    k: int,
    points: jnp.ndarray,
    queries: jnp.ndarray,
    column_bias: jnp.ndarray | None = None,
    tile_m: int = 256,
    interpret: bool = False,
    variant: str = "auto",
):
    """Exact kNN via the fused Pallas kernel.

    Args:
      k: neighbors (static).
      points: (b, n, c) dataset points (n·c·4B + tile·n·4B must fit VMEM —
        fine for n ≤ ~4096).
      queries: (b, m, c).
      column_bias: optional (b, n) additive bias on the distance columns
        (used for duplicate masking — biased columns sort last).
      tile_m: query rows per grid step.
      variant: selection formulation — 'maskout', 'walk', 'unroll', or
        'auto' (unroll everywhere except the measured maskout win at
        n_pad=512; see ``_make_knn_kernel``).  Bit-identical outputs for all of
        these.  'packed' is the TURBO variant: selection ranks one
        sortable int32 key per lane (f32 distance bits with the low
        ``ceil(log2(n_pad))`` mantissa bits replaced by the lane index),
        so near-ties whose distances agree in the remaining high bits
        resolve by lane index instead of exact value, and the returned
        distances are truncated to those high bits (relative error
        ≤ 2^-(23-lane_bits), ~5e-4 at n=4096 — far below the bf16 turbo
        gather's 2^-8).  Exact callers must not use it; the indices-only
        turbo consumers (grouping) may.

    Returns:
      (sq_dists, idx): (b, m, k) ascending — same semantics as
      ``dispu_tpu.ops.knn.knn``.
    """
    b, n, c = points.shape
    m = queries.shape[1]
    n_pad = _round_up(max(n, 128), 128)
    c_pad = _round_up(max(c, 128), 128)
    k_pad = _round_up(max(k, 128), 128)
    tile_m = min(tile_m, _round_up(max(m, 8), 8))
    if variant == "auto":
        # measured (scripts/profile_r3o.py, superseding r3n's
        # maskout/walk crossover): the unrolled SSA selection wins at
        # n_pad 256 (3.13 vs walk 3.29 / maskout 3.19), 1024 (5.18 vs
        # 6.13) and 4096 (20.40 vs 22.15) — k=1 chamfer included (7.22
        # vs 7.32) — while maskout keeps a narrow win at exactly
        # n_pad=512 (3.83 vs 4.55)
        variant = "maskout" if n_pad == 512 else "unroll"
    if variant in ("maskout", "unroll", "packed"):
        # these forms hold TWO (tile_m, n_pad) 4-byte tiles live
        # (maskout: distances + the rewritable scratch; unroll: the SSA
        # knockout chain double-buffers; packed: distances + int32 keys);
        # cap their sum at ~12 MiB of the 16 MiB scoped VMEM
        # (tile_m=512 @ n=4096 OOMs)
        cap = max(8, (12 * 2**20) // (8 * n_pad) // 8 * 8)
        tile_m = min(tile_m, cap)
    m_pad = _round_up(max(m, tile_m), tile_m)

    pts = jnp.zeros((b, n_pad, c_pad), jnp.float32)
    pts = pts.at[:, :n, :c].set(points.astype(jnp.float32))
    qs = jnp.zeros((b, m_pad, c_pad), jnp.float32)
    qs = qs.at[:, :m, :c].set(queries.astype(jnp.float32))
    bias = jnp.full((b, 1, n_pad), 1e30, jnp.float32)
    if column_bias is None:
        bias = bias.at[:, 0, :n].set(0.0)
    else:
        bias = bias.at[:, 0, :n].set(column_bias.astype(jnp.float32))

    grid = (b, m_pad // tile_m)
    idx_out, dist_out = pl.pallas_call(
        _make_knn_kernel(k, variant),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n_pad, c_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_m, c_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_m, k_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_m, k_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, m_pad, k_pad), jnp.int32),
            jax.ShapeDtypeStruct((b, m_pad, k_pad), jnp.float32),
        ],
        scratch_shapes=(
            [pltpu.VMEM((tile_m, n_pad), jnp.float32)]
            if variant == "maskout" else []
        ),
        interpret=interpret,
    )(pts, qs, bias)
    return dist_out[:, :m, :k], idx_out[:, :m, :k]


def _make_ball_kernel(nsample: int, n_actual: int, with_dists: bool,
                      select_smallest: int = 0, nsample_full: int = 0):
    """Fused ball query: distance tile + first-k-hits-in-index-order.

    Same VMEM-resident structure as the kNN kernel, but the selection
    ranks *hit indices* instead of distances: key = (d < r² ? lane : n),
    then ``nsample`` rounds of (min, record, mask) return the first hits
    in ascending index order — the CUDA scan semantics
    (ref:tf_ops/grouping/tf_grouping_g.cu:1-36) without the XLA sort that
    dominates the ball query's top_k lowering.

    With ``with_dists`` the kernel also records each selected hit's squared
    distance (one extra masked-min pass per round) — the repulsion loss can
    then rank neighbors without re-gathering coordinates (the TPU gather
    costs ~8 ns per indexed *row* regardless of width, so a (b·m·k, 3)
    xyz gather is the expensive part of the loss, not the math).
    """

    def kernel(r2_ref, pts_ref, q_ref, *out_refs):
        refs = list(out_refs)
        slots_ref = refs.pop(0)
        cnt_ref = refs.pop(0)
        dist_ref = refs.pop(0) if with_dists else None
        sel_ref = refs.pop(0) if select_smallest else None
        i = pl.program_id(0)
        p = pts_ref[0]  # (n_pad, c_pad)
        q = q_ref[0]    # (tm, c_pad)
        n_pad = p.shape[0]
        tm = q.shape[0]
        k_pad = slots_ref.shape[-1]

        p2 = jnp.sum(p * p, axis=1)[None, :]
        q2 = jnp.sum(q * q, axis=1)[:, None]
        qp = jnp.dot(
            q, p.T,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        # identical association to ops.geometry.pairwise_sq_dist so the
        # hit classification is bit-equal to the XLA path
        d = jnp.maximum(q2 - 2.0 * qp + p2, 0.0)

        lane = jax.lax.broadcasted_iota(jnp.int32, (tm, n_pad), 1)
        lane_k = jax.lax.broadcasted_iota(jnp.int32, (tm, k_pad), 1)
        hit = (d < r2_ref[i]) & (lane < n_actual)
        key = jnp.where(hit, lane, n_actual)

        slots_ref[0] = jnp.full((tm, k_pad), n_actual, jnp.int32)
        need_dists = with_dists or select_smallest > 0

        # keys are unique lane indices, so walking the ascending order only
        # needs the previous selection as a threshold — one masked-min pass
        # per round, no key-tile rewrite
        def body(j, carry):
            sel, dists = carry
            sel2 = jnp.min(
                jnp.where(key > sel, key, n_actual), axis=1, keepdims=True
            )
            slots_ref[0] = jnp.where(lane_k == j, sel2, slots_ref[0])
            if need_dists:
                dv = jnp.min(
                    jnp.where(lane == sel2, d, jnp.inf),
                    axis=1, keepdims=True,
                )
                dv = jnp.where(sel2 < n_actual, dv, 0.0)
                dists = jnp.where(lane_k == j, dv, dists)
            return sel2, dists

        _, dists = jax.lax.fori_loop(
            0,
            nsample,
            body,
            (jnp.full((tm, 1), -1, jnp.int32),
             jnp.zeros((tm, k_pad), jnp.float32)),
        )
        if with_dists:
            dist_ref[0] = dists
        cnt = jnp.sum(hit.astype(jnp.int32), axis=1, keepdims=True)
        cnt_ref[0] = jnp.broadcast_to(cnt, (tm, cnt_ref.shape[-1]))

        if select_smallest:
            # the `select_smallest` lowest-distance hits, resolved to
            # dataset indices, with exactly the composed semantics of
            # top_k(-dists, k) over the wrapper's padded distance rows
            # (pad slots repeat the first hit's distance; stable ties by
            # slot position) followed by take_along(idx, ...).
            s = slots_ref[0]
            valid = s < n_actual
            first_slot = jnp.min(
                jnp.where(lane_k == 0, s, n_actual), axis=1, keepdims=True
            )
            d0 = jnp.min(
                jnp.where(lane_k == 0, dists, jnp.inf), axis=1, keepdims=True
            )
            # pad positions — rounds that found no hit AND positions beyond
            # the selection loop when n < nsample — carry the first hit's
            # distance, exactly like the composed XLA path's padded row;
            # only positions past the caller's nsample are excluded
            dfix = jnp.where(valid, dists, d0)
            dfix = jnp.where(
                lane_k < (nsample_full or nsample), dfix, jnp.inf
            )
            pad_idx = jnp.where(first_slot < n_actual, first_slot, 0)
            sel_pad = sel_ref.shape[-1]
            lane_s = jax.lax.broadcasted_iota(jnp.int32, (tm, sel_pad), 1)
            sel_ref[0] = jnp.zeros((tm, sel_pad), jnp.int32)

            mv = jnp.full((tm, 1), -jnp.inf, jnp.float32)
            pos = jnp.full((tm, 1), -1, jnp.int32)
            for j in range(select_smallest):
                later = (dfix > mv) | ((dfix == mv) & (lane_k > pos))
                mv = jnp.min(
                    jnp.where(later, dfix, jnp.inf), axis=1, keepdims=True
                )
                pos = jnp.min(
                    jnp.where((dfix == mv) & later, lane_k, k_pad),
                    axis=1,
                    keepdims=True,
                )
                sval = jnp.min(
                    jnp.where(lane_k == pos, s, n_actual),
                    axis=1, keepdims=True,
                )
                out_val = jnp.where(sval < n_actual, sval, pad_idx)
                sel_ref[0] = jnp.where(lane_s == j, out_val, sel_ref[0])

    return kernel


@functools.partial(jax.jit, static_argnums=(1, 4, 5, 6, 7))
def query_ball_pallas(
    radius,
    nsample: int,
    xyz: jnp.ndarray,
    new_xyz: jnp.ndarray,
    tile_m: int = 256,
    interpret: bool = False,
    with_dists: bool = False,
    select_smallest: int = 0,
):
    """Ball query via the fused Pallas kernel.

    Same contract as :func:`dispu_tpu.ops.grouping.query_ball_point`
    (first ``nsample`` in-radius dataset points in index order, padding
    repeats the first hit, counts capped at ``nsample``); bit-identical
    outputs, no O(n log n) sort.  ``radius`` is a scalar or (b,) array.

    ``with_dists=True`` additionally returns (b, m, nsample) squared
    distances of the selected hits (expansion form |q|²−2q·p+|p|², the
    same values the hit test used; padded slots repeat the first hit's
    distance, empty balls give 0) — no gradient, selection-grade values.

    ``select_smallest=k`` additionally returns the dataset indices of the
    k lowest-distance hits per query, (b, m, k) int32 — exactly
    ``take_along(idx, top_k(-dists, k).indices)`` of the composed padded
    outputs, but selected inside the kernel so the caller skips a sort
    and a (b, m, nsample) round-trip (the repulsion loss's shape).
    """
    # indices/counts carry no gradient (ref: NoGradient on the CUDA op);
    # stopping tangents keeps reverse-mode linearization away from the
    # pallas_call (which has no JVP rule) when the caller differentiates
    # through a loss built on the returned neighborhoods
    xyz = jax.lax.stop_gradient(jnp.asarray(xyz))
    new_xyz = jax.lax.stop_gradient(jnp.asarray(new_xyz))
    b, n, c = xyz.shape
    m = new_xyz.shape[1]
    radius = jax.lax.stop_gradient(radius)
    r2 = jnp.broadcast_to(jnp.asarray(radius, xyz.dtype), (b,)) ** 2

    n_pad = _round_up(max(n, 128), 128)
    c_pad = _round_up(max(c, 128), 128)
    k_pad = _round_up(max(nsample, 128), 128)
    tile_m = min(tile_m, _round_up(max(m, 8), 8))
    m_pad = _round_up(max(m, tile_m), tile_m)

    pts = jnp.zeros((b, n_pad, c_pad), jnp.float32)
    pts = pts.at[:, :n, :c].set(xyz.astype(jnp.float32))
    qs = jnp.zeros((b, m_pad, c_pad), jnp.float32)
    qs = qs.at[:, :m, :c].set(new_xyz.astype(jnp.float32))

    out_specs = [
        pl.BlockSpec((1, tile_m, k_pad), lambda i, j, *_: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_m, 128), lambda i, j, *_: (i, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, m_pad, k_pad), jnp.int32),
        jax.ShapeDtypeStruct((b, m_pad, 128), jnp.int32),
    ]
    if with_dists:
        out_specs.append(
            pl.BlockSpec((1, tile_m, k_pad), lambda i, j, *_: (i, j, 0),
                         memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((b, m_pad, k_pad), jnp.float32))
    if select_smallest:
        sel_pad = _round_up(max(select_smallest, 128), 128)
        out_specs.append(
            pl.BlockSpec((1, tile_m, sel_pad), lambda i, j, *_: (i, j, 0),
                         memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((b, m_pad, sel_pad), jnp.int32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, m_pad // tile_m),
        in_specs=[
            pl.BlockSpec((1, n_pad, c_pad), lambda i, j, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_m, c_pad), lambda i, j, *_: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
    )
    if select_smallest > nsample:
        raise ValueError(
            f"select_smallest={select_smallest} exceeds nsample={nsample}"
        )
    outs = pl.pallas_call(
        _make_ball_kernel(min(nsample, n), n, with_dists, select_smallest,
                          nsample_full=nsample),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(r2.astype(jnp.float32), pts, qs)
    slots, cnt = outs[0], outs[1]

    slots = slots[:, :m, :nsample]
    valid = slots < n
    first = slots[..., :1]
    pad = jnp.where(valid[..., :1], first, 0)
    idx = jnp.where(valid, slots, pad).astype(jnp.int32)
    pts_cnt = jnp.minimum(cnt[:, :m, 0], nsample).astype(jnp.int32)
    extras = []
    pos = 2
    if with_dists:
        d_raw = outs[pos][:, :m, :nsample]
        pos += 1
        d_first = d_raw[..., :1]
        dists = jnp.where(valid, d_raw,
                          jnp.where(valid[..., :1], d_first, 0.0))
        extras.append(dists)
    if select_smallest:
        extras.append(outs[pos][:, :m, :select_smallest])
    if extras:
        return (idx, pts_cnt, *extras)
    return idx, pts_cnt


def _make_gather_kernel(exact: bool = True):
    """Exact row gather as a 3-pass bf16 one-hot contraction in VMEM.

    One grid step = (one cloud, one query tile).  The feature table is
    split into three bf16 terms (t = t1 + t2 + t3 exactly: each residual
    carries ≤8 fresh mantissa bits, all partial sums are f32-representable,
    so reconstruction is bit-exact for normal f32 — the same decomposition
    XLA's HIGHEST algorithm uses, but HIGHEST must split *both* operands
    into 6 passes; a one-hot matrix is exactly representable in bf16, so
    3 passes suffice).  The one-hot is built *transposed* — (n, tile_q),
    query index broadcast over sublanes — which needs no lane↔sublane
    relayout of the index vector; the contraction then runs over the
    sublane axis of both operands (the MXU's Aᵀ·B form).

    With ``exact=False`` only the leading bf16 term is contracted — one
    MXU pass, values bf16-rounded (the in-VMEM analog of the XLA 'onehot'
    turbo gather; same documented value deviation).
    """

    def kernel(tbl_ref, idx_ref, out_ref):
        t = tbl_ref[0]        # (n_pad, c_pad) f32
        idx = idx_ref[0]      # (1, tq) int32
        n_pad = t.shape[0]
        tq = idx.shape[-1]

        # masked-truncation split (_bf16_terms): immune to the
        # excess-precision convert fold in any compiler
        t1, t2, t3 = _bf16_terms(t)

        rows = jax.lax.broadcasted_iota(jnp.int32, (n_pad, tq), 0)
        ohT = (rows == idx).astype(jnp.bfloat16)   # (n_pad, tq)

        dn = (((0,), (0,)), ((), ()))  # contract sublane axis of both
        acc = jax.lax.dot_general(
            ohT, t1, dn, preferred_element_type=jnp.float32
        )
        if exact:
            acc = acc + jax.lax.dot_general(
                ohT, t2, dn, preferred_element_type=jnp.float32
            )
            acc = acc + jax.lax.dot_general(
                ohT, t3, dn, preferred_element_type=jnp.float32
            )
        out_ref[0] = acc  # (tq, c_pad)

    return kernel


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def gather_rows_pallas(
    table: jnp.ndarray,
    idx: jnp.ndarray,
    tile_q: int = 512,
    interpret: bool = False,
    exact: bool = True,
):
    """Bit-exact ``table[b, idx[b]]`` on the MXU, resident in VMEM.

    Args:
      table: (b, n, c) float32 feature rows (n·c + n·tile_q must fit VMEM —
        fine for n ≤ ~4096, c ≤ ~512).
      idx: (b, q) int32 row indices.
      tile_q: queries per grid step.
      exact: 3-pass bit-exact (default); False = single bf16 pass (turbo,
        values bf16-rounded like the XLA 'onehot' gather).  NOTE: no
        production path dispatches exact=False — measured at the refiner
        shapes it only ties the native gather and loses to the XLA
        one-hot einsum (PERFORMANCE.md "VMEM Pallas gather"); it is kept
        for the measurement scripts (scripts/profile_r3j.py) and the
        interpret-mode kernel test.

    Returns:
      (b, q, c) float32, bit-identical to ``jax.vmap(lambda t, i: t[i])``
      for normal f32 values (f32-subnormal table entries may flush).

    Replaces the native TPU gather (~60 GB/s effective) and the XLA
    HIGHEST one-hot contraction (6 MXU passes) with 3 MXU passes; the
    one-hot never leaves VMEM.  Parity: ref:tf_ops/grouping/
    tf_grouping_g.cu:38-78 (group_point is this gather per neighborhood).
    """
    b, n, c = table.shape
    q = idx.shape[1]
    n_pad = _round_up(max(n, 8), 8)
    c_pad = _round_up(max(c, 128), 128)
    tile_q = min(tile_q, _round_up(max(q, 128), 128))
    q_pad = _round_up(max(q, tile_q), tile_q)

    tbl = jnp.zeros((b, n_pad, c_pad), jnp.float32)
    tbl = tbl.at[:, :n, :c].set(table.astype(jnp.float32))
    ix = jnp.zeros((b, 1, q_pad), jnp.int32)
    ix = ix.at[:, 0, :q].set(idx.astype(jnp.int32))

    out = pl.pallas_call(
        _make_gather_kernel(exact),
        grid=(b, q_pad // tile_q),
        in_specs=[
            pl.BlockSpec((1, n_pad, c_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_q), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_q, c_pad), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, q_pad, c_pad), jnp.float32),
        interpret=interpret,
    )(tbl, ix)
    return out[:, :q, :c]


def _make_scatter_kernel():
    """Row scatter-add (the gather transpose) as a standard MXU matmul.

    out[n, c] = Σ_q [idx[q] == n] · g[q, c] — i.e. ohT(n, q) @ g(q, c).
    The cotangent is split into three exact bf16 terms (same decomposition
    as the forward) and accumulated in f32 across query tiles; the output
    block stays resident in VMEM while the grid walks the q axis.
    """

    def kernel(g_ref, idx_ref, out_ref):
        j = pl.program_id(1)
        g = g_ref[0]          # (tq, c_pad) f32
        idx = idx_ref[0]      # (1, tq) int32
        n_pad = out_ref.shape[1]

        rows = jax.lax.broadcasted_iota(jnp.int32, (n_pad, g.shape[0]), 0)
        ohT = (rows == idx).astype(jnp.bfloat16)

        g1, g2, g3 = _bf16_terms(g)  # masked-truncation split (exact)

        dn = (((1,), (0,)), ((), ()))
        acc = jax.lax.dot_general(
            ohT, g1, dn, preferred_element_type=jnp.float32)
        acc = acc + jax.lax.dot_general(
            ohT, g2, dn, preferred_element_type=jnp.float32)
        acc = acc + jax.lax.dot_general(
            ohT, g3, dn, preferred_element_type=jnp.float32)

        @pl.when(j == 0)
        def _init():
            out_ref[0] = acc

        @pl.when(j != 0)
        def _accum():
            out_ref[0] = out_ref[0] + acc

    return kernel


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def scatter_rows_pallas(
    g: jnp.ndarray,
    idx: jnp.ndarray,
    n: int,
    tile_q: int = 512,
    interpret: bool = False,
):
    """``zeros((b, n, c)).at[idx].add(g)`` on the MXU (deterministic).

    Args:
      g: (b, q, c) float32 values to scatter.
      idx: (b, q) int32 destination rows in [0, n).
      n: number of output rows (static).

    Returns:
      (b, n, c) float32.  Used as the training-time backward of
      :func:`gather_rows_pallas`; per-element sums accumulate in f32 in
      fixed tile order (deterministic, no atomics — unlike the reference's
      CUDA ``atomicAdd`` grads, ref:tf_ops/grouping/tf_grouping_g.cu:60-78).
    """
    b, q, c = g.shape
    n_pad = _round_up(max(n, 8), 8)
    c_pad = _round_up(max(c, 128), 128)
    tile_q = min(tile_q, _round_up(max(q, 128), 128))
    q_pad = _round_up(max(q, tile_q), tile_q)

    gp = jnp.zeros((b, q_pad, c_pad), jnp.float32)
    gp = gp.at[:, :q, :c].set(g.astype(jnp.float32))
    ix = jnp.zeros((b, 1, q_pad), jnp.int32)
    ix = ix.at[:, 0, :q].set(idx.astype(jnp.int32))

    out = pl.pallas_call(
        _make_scatter_kernel(),
        grid=(b, q_pad // tile_q),
        in_specs=[
            pl.BlockSpec((1, tile_q, c_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_q), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_pad, c_pad), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, c_pad), jnp.float32),
        interpret=interpret,
    )(gp, ix)
    return out[:, :n, :c]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def gather_rows_pallas_diff(
    table: jnp.ndarray,
    idx: jnp.ndarray,
    tile_q: int = 512,
    interpret: bool = False,
):
    """Differentiable ``gather_rows_pallas`` (pallas_call has no AD rule).

    Backward is the deterministic scatter-add ``zeros.at[idx].add(g)`` —
    exactly what autodiff of the native gather produces.
    """
    return gather_rows_pallas(table, idx, tile_q, interpret)


def _gather_rows_fwd(table, idx, tile_q, interpret):
    return gather_rows_pallas(table, idx, tile_q, interpret), (
        jnp.zeros_like(table), idx)


def _gather_rows_bwd(tile_q, interpret, res, g):
    zeros, idx = res
    n = zeros.shape[1]
    if zeros.dtype == jnp.float32 and (
            interpret or jax.default_backend() not in ("cpu", "gpu")):
        d_table = scatter_rows_pallas(
            g.astype(jnp.float32), idx, n, tile_q, interpret)
        return d_table.astype(zeros.dtype), None
    d_table = jax.vmap(
        lambda z, i, u: z.at[i].add(u)
    )(zeros, idx, g.astype(zeros.dtype))
    return d_table, None


gather_rows_pallas_diff.defvjp(_gather_rows_fwd, _gather_rows_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 4, 5))
def knn_pallas_diff(
    k: int,
    points: jnp.ndarray,
    queries: jnp.ndarray,
    column_bias: jnp.ndarray,
    interpret: bool = False,
    variant: str = "auto",
):
    """Differentiable wrapper around ``knn_pallas``.

    ``pallas_call`` has no autodiff rule, so without this the fused kernel
    would fail reverse-mode linearization inside a train step.  The VJP
    treats the selection as fixed (exactly what autodiff of
    ``top_k(pairwise)`` produces, and what TF's top_k gradient does in the
    reference): the distance cotangent flows to the query point and its
    selected neighbors; the column bias gets no gradient.
    """
    return knn_pallas(
        k,
        jax.lax.stop_gradient(points),
        jax.lax.stop_gradient(queries),
        column_bias,
        256,
        interpret,
        variant,
    )


def _knn_diff_fwd(k, points, queries, column_bias, interpret, variant):
    dist, idx = knn_pallas_diff(
        k, points, queries, column_bias, interpret, variant
    )
    return (dist, idx), (points, queries, idx)


def _knn_diff_bwd(k, interpret, variant, res, cotangents):
    points, queries, idx = res
    g_dist, _ = cotangents
    neighbors = jax.vmap(lambda p, i: p[i])(points, idx)
    diff = queries[:, :, None, :] - neighbors  # (b, m, k, c)
    contrib = 2.0 * g_dist[..., None] * diff
    d_queries = jnp.sum(contrib, axis=2)
    d_points = jax.vmap(
        lambda z, i, u: z.at[i.reshape(-1)].add(u.reshape(-1, u.shape[-1]))
    )(jnp.zeros_like(points), idx, -contrib)
    d_bias = jnp.zeros(points.shape[:-1], points.dtype)
    return d_points, d_queries, d_bias


knn_pallas_diff.defvjp(_knn_diff_fwd, _knn_diff_bwd)


def _make_knn_group_kernel(k: int, exact: bool, with_xyz: bool,
                           drop_first: bool):
    """Fused kNN + neighborhood gather: selection drives per-round MXU
    gathers, so the (b, m, k, [3+]c) grouped tensor never needs a separate
    index round-trip or wide gather pass.

    One grid step = (one cloud, one query tile).  The selection is the
    statically-unrolled mask-out loop (bit-identical sequence to every
    exact ``knn_pallas`` variant); each round's knockout mask
    ``lane == sel`` IS the one-hot row of the selected neighbor, so it is
    reused — cast to bf16 — as the left operand of the round's gather
    matmuls:

    * features: 3 exact bf16 terms (``exact=True``, bit-identical to the
      native gather — same decomposition argument as
      :func:`_make_gather_kernel`) or the single leading term
      (``exact=False`` — values bf16-rounded exactly like the XLA
      'onehot' turbo gather);
    * xyz (``with_xyz``): ALWAYS exact, via three narrow matmuls against
      per-term 16-lane tables, accumulated in f32 INSIDE the kernel —
      structurally identical to the exact feature path.  (Round 3 packed
      the three terms side-by-side in one 9-column table and summed
      term-major after the kernel; on real hardware the t2/t3 lanes did
      not survive that path — measured bf16-grade 2.1e-3 deviation —
      while the feature path's in-kernel accumulation measured exact to
      f32 round-off, so xyz now takes the same route.)

    ``drop_first`` runs k+1 selection rounds and keeps rounds 1..k —
    the edge-conv composition ``knn_unique(k+1)[:, :, 1:]`` (self column
    dropped) in one kernel, with no gather on the dropped round.

    Kept rounds collect their gather results in Python lists (the loop
    is statically unrolled) and land in the refs via ONE concatenate per
    output — features lane-concatenated into (tm, k·cf) (128-aligned
    blocks), xyz stacked plane-major into (k, tm, 16).  No
    dynamic_update_slice: Mosaic has no TPU lowering for it (the
    original accumulator formulation failed real-chip compilation even
    with static offsets), and each ref is still written exactly once.

    This is the statically UNROLLED formulation (n_pad ≤ 2048 — the
    knockout chain keeps ~10 (tm, n) f32 tiles live); large n rides
    :func:`_make_knn_group_loop_kernel`.

    Replaces ``knn_pallas`` + the combined [xyz|feature] ``group_point``
    of ``ops.grouping.grouping`` (ref:Common/ops.py:154-179) and the
    edge-conv neighborhood build (ref:Common/ops.py:1856-1877): the
    native TPU gather there is row-count-bound (~17 ms for 32·4096·16
    rows at the 16x second-pass scale regardless of width), while these
    matmuls ride the MXU concurrently with the VPU selection rounds.
    """

    def kernel(pts_ref, q_ref, bias_ref, *rest):
        pos = 3 if with_xyz else 0
        nft = 3 if exact else 1
        ft_refs = rest[pos:pos + nft]
        out_refs = rest[pos + nft:]
        idx_ref, dist_ref, feat_ref = out_refs[:3]
        p = pts_ref[0]    # (n_pad, c_pad)
        q = q_ref[0]      # (tm, c_pad)
        n_pad = p.shape[0]
        tm = q.shape[0]
        k_pad = idx_ref.shape[-1]
        cf = ft_refs[0].shape[-1]  # feature lane width (c_pad_f)

        p2 = jnp.sum(p * p, axis=1)[None, :]
        q2 = jnp.sum(q * q, axis=1)[:, None]
        qp = jnp.dot(
            q, p.T,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        d = jnp.maximum(q2 - 2.0 * qp + p2, 0.0) + bias_ref[0]

        lane = jax.lax.broadcasted_iota(jnp.int32, (tm, n_pad), 1)
        lane_k = jax.lax.broadcasted_iota(jnp.int32, (tm, k_pad), 1)

        fts = [r[0] for r in ft_refs]
        dn = (((1,), (0,)), ((), ()))  # (tm, n) @ (n, c): contract n

        idx_acc = jnp.zeros((tm, k_pad), jnp.int32)
        dist_acc = jnp.zeros((tm, k_pad), jnp.float32)
        feat_parts = []  # k × (tm, cf); one lane-concat at the end
        if with_xyz:
            xts = [r[0] for r in rest[:3]]  # 3 × (n_pad, 16) bf16 terms
            x9_parts = []  # k × (tm, 16); one plane-stack at the end
        rounds = k + 1 if drop_first else k

        def _gather(onehot):
            g = jax.lax.dot_general(
                onehot, fts[0], dn, preferred_element_type=jnp.float32)
            for ft in fts[1:]:
                g = g + jax.lax.dot_general(
                    onehot, ft, dn, preferred_element_type=jnp.float32)
            feat_parts.append(g)
            if with_xyz:
                g9 = jax.lax.dot_general(
                    onehot, xts[0], dn, preferred_element_type=jnp.float32)
                for xt in xts[1:]:
                    g9 = g9 + jax.lax.dot_general(
                        onehot, xt, dn, preferred_element_type=jnp.float32)
                x9_parts.append(g9)

        dc = d
        for j in range(rounds):
            mv2 = jnp.min(dc, axis=1, keepdims=True)
            hit = jnp.where(dc == mv2, lane, n_pad)
            sel2 = jnp.min(hit, axis=1, keepdims=True)
            if j + 1 < rounds:
                dc = jnp.where(lane == sel2, _KNN_SENTINEL, dc)
            slot = j - 1 if drop_first else j
            if slot < 0:
                continue  # self column: selected, knocked out, no gather
            idx_acc = jnp.where(lane_k == slot, sel2, idx_acc)
            dist_acc = jnp.where(lane_k == slot, mv2, dist_acc)
            _gather((lane == sel2).astype(jnp.bfloat16))
        idx_ref[0] = idx_acc
        dist_ref[0] = dist_acc
        feat_ref[0] = jnp.concatenate(feat_parts, axis=1)
        if with_xyz:
            out_refs[3][0] = jnp.stack(x9_parts, axis=0)

    return kernel


def _make_knn_group_loop_kernel(k: int, exact: bool, with_xyz: bool,
                                drop_first: bool):
    """Large-n fused kNN+gather: selection AND gathers in one fori_loop.

    The unrolled form's knockout chain keeps ~10 (tm, n) f32 tiles live
    (measured 17.4 MiB stacks at n=4096 — the round-3 VMEM wall), so
    here the chain is the double-buffered loop carry and each round's
    knockout mask doubles as its gather one-hot exactly as in the
    unrolled form; gather results accumulate into plane-major
    (k, tm, lanes) carries via an iota-select on the plane index
    (write-once per plane — gathered rows always match the returned
    idx exactly).  Two further VMEM cuts vs the unrolled layout, both
    probed via the chipless AOT compiler (a post-loop one-hot-rebuild
    variant measured 28.34 MiB; in-loop gathers with the unrolled
    tables still 27.18 MiB — the double-buffered input tables
    dominate):

    * the kNN keys arrive as TRANSPOSED coordinate planes (8, n_pad)
      f32 (128 KiB at n=4096 vs the 2 MiB (n_pad, 128) row table), with
      ``p2``/``q2`` precomputed host-side — the distance matmul
      contracts K=8 instead of K=128 over the same three nonzero
      coordinate lanes.  The values agree with the unrolled form to
      ~1 ulp but NOT bitwise (see ``knn_group_pallas``'s ``select``
      doc — cross-program bit-identity is not compiler-stable);
    * the three bf16 xyz term tables (each lane-padded 16→128) pack
      into ONE (n_pad, 16) table, lanes 0:9 = [t1|t2|t3]: one gather
      matmul per round accumulates all three terms' rows in f32
      per-lane, and the caller sums the term lanes post-kernel —
      (g1+g2)+g3 of exactly-gathered f32 terms reproduces the exact
      row by the ``_bf16_terms`` invariant, the same argument as the
      in-kernel feature-term accumulation.

    Ref order: pT (1, 8, n_pad) f32, q (1, tm, 8) f32, bias+p2 each
    (1, 1, n_pad) f32, q2 (1, tm, 1) f32 (host-side, explicit
    (x²+y²)+z² order — an in-kernel 8-lane reduce associated
    differently under jit), [x9 table (1, n_pad, 16) bf16],
    features × nft (1, n_pad, cf) bf16, then outs idx/dist
    (1, tm, k_pad), feat (1, k, tm, cf), [x9 (1, k, tm, 16)].
    """

    def kernel(pt_ref, q_ref, bias_ref, p2_ref, q2_ref, *rest):
        pos = 1 if with_xyz else 0
        nft = 3 if exact else 1
        ft_refs = rest[pos:pos + nft]
        out_refs = rest[pos + nft:]
        idx_ref, dist_ref, feat_ref = out_refs[:3]
        pt = pt_ref[0]    # (8, n_pad) coordinate planes
        q = q_ref[0]      # (tm, 8)
        n_pad = pt.shape[1]
        tm = q.shape[0]
        k_pad = idx_ref.shape[-1]
        cf = ft_refs[0].shape[-1]

        q2 = q2_ref[0]    # (tm, 1) host-side explicit-order squares
        qp = jax.lax.dot_general(
            q, pt, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        d = jnp.maximum(q2 - 2.0 * qp + p2_ref[0], 0.0) + bias_ref[0]

        lane = jax.lax.broadcasted_iota(jnp.int32, (tm, n_pad), 1)
        lane_k = jax.lax.broadcasted_iota(jnp.int32, (tm, k_pad), 1)
        plane_f = jax.lax.broadcasted_iota(jnp.int32, (k, tm, cf), 0)
        fts = [r[0] for r in ft_refs]
        if with_xyz:
            x9t = rest[0][0]  # (n_pad, 16) bf16, lanes 0:9 = t1|t2|t3
            plane_x = jax.lax.broadcasted_iota(jnp.int32, (k, tm, 16), 0)
        dn = (((1,), (0,)), ((), ()))  # (tm, n) @ (n, c): contract n
        if drop_first:
            # Peel the self round out of the loop: selection + knockout
            # only — running it inside the loop would pay the full
            # gather matmuls for a slot that matches no plane (their
            # results discarded), one wasted MXU pass per term.
            mv2 = jnp.min(d, axis=1, keepdims=True)
            hit = jnp.where(d == mv2, lane, n_pad)
            sel2 = jnp.min(hit, axis=1, keepdims=True)
            d = jnp.where(lane == sel2, _KNN_SENTINEL, d)

        def body(j, carry):
            if with_xyz:
                dc, idx_a, dist_a, feat_a, x9_a = carry
            else:
                dc, idx_a, dist_a, feat_a = carry
            mv2 = jnp.min(dc, axis=1, keepdims=True)
            hit = jnp.where(dc == mv2, lane, n_pad)
            sel2 = jnp.min(hit, axis=1, keepdims=True)
            hot = lane == sel2
            dc = jnp.where(hot, _KNN_SENTINEL, dc)
            slot = j
            idx_a = jnp.where(lane_k == slot, sel2, idx_a)
            dist_a = jnp.where(lane_k == slot, mv2, dist_a)
            onehot = hot.astype(jnp.bfloat16)
            g = jax.lax.dot_general(
                onehot, fts[0], dn, preferred_element_type=jnp.float32)
            for ft in fts[1:]:
                g = g + jax.lax.dot_general(
                    onehot, ft, dn, preferred_element_type=jnp.float32)
            feat_a = jnp.where(plane_f == slot, g[None], feat_a)
            if not with_xyz:
                return dc, idx_a, dist_a, feat_a
            g9 = jax.lax.dot_general(
                onehot, x9t, dn, preferred_element_type=jnp.float32)
            x9_a = jnp.where(plane_x == slot, g9[None], x9_a)
            return dc, idx_a, dist_a, feat_a, x9_a

        init = (d,
                jnp.zeros((tm, k_pad), jnp.int32),
                jnp.zeros((tm, k_pad), jnp.float32),
                jnp.zeros((k, tm, cf), jnp.float32))
        if with_xyz:
            init = init + (jnp.zeros((k, tm, 16), jnp.float32),)
        fin = jax.lax.fori_loop(0, k, body, init)
        idx_ref[0] = fin[1]
        dist_ref[0] = fin[2]
        feat_ref[0] = fin[3]
        if with_xyz:
            out_refs[3][0] = fin[4]

    return kernel


def _bf16_terms(x: jnp.ndarray):
    """Exact 3-term bf16 decomposition: t1 + t2 + t3 == x for normal f32
    (each term keeps the next ≤8 significant bits; partial sums are
    f32-representable — the invariant the exact one-hot gathers rely on).

    Implemented by integer mantissa masking (bitcast + and), NOT the
    textbook convert round-trip (``t = bf16(x); r = x - f32(t)``): the
    TPU toolchain here forces ``--xla_allow_excess_precision=true``,
    under which XLA may legally fold ``convert_f32(convert_bf16(v))``
    back to ``v`` — zeroing the residual terms.  Measured on chip
    (round 4): whether the fold fired depended on the surrounding
    fusion, silently degrading some fused gathers to bf16 grade
    (1.9e-3) while leaving others f32-exact in the same session.
    The integer path reproduces round-to-nearest-even exactly, so every
    term is BIT-IDENTICAL to the convert formulation (t1 == bf16(x) —
    the turbo paths' single-term contract is unchanged); the residual
    subtractions are exact in f32 regardless of intermediate precision,
    and every f32→bf16 convert below is exact because the low mantissa
    bits are already zero — there is no rounding for any optimizer to
    move.  Works identically inside Mosaic kernels (the gather/scatter
    kernels call it on VMEM-resident values) and in host XLA
    (kernel-operand table construction)."""
    mask = jnp.uint32(0xFFFF0000)

    def rne16(v):  # f32 -> f32 with the low 16 bits rounded away (RNE)
        vb = jax.lax.bitcast_convert_type(v, jnp.uint32)
        bias = jnp.uint32(0x7FFF) + ((vb >> jnp.uint32(16)) & jnp.uint32(1))
        r = jax.lax.bitcast_convert_type((vb + bias) & mask, jnp.float32)
        # The biased add would carry a NaN whose payload sits only in the
        # low 16 mantissa bits (e.g. 0x7F800001) into the exponent,
        # yielding +inf; converts keep NaN NaN, so pass NaNs through.
        return jnp.where(jnp.isnan(v), v, r)

    t1f = rne16(x)
    r1 = x - t1f  # exact: ≤16 significant bits remain
    t2f = rne16(r1)
    r2 = r1 - t2f  # exact: ≤8 significant bits remain (bf16-exact)
    return (t1f.astype(jnp.bfloat16), t2f.astype(jnp.bfloat16),
            r2.astype(jnp.bfloat16))


@functools.partial(jax.jit, static_argnums=(0, 5, 6, 7, 8, 9, 10))
def knn_group_pallas(
    k: int,
    points: jnp.ndarray,
    queries: jnp.ndarray,
    feats: jnp.ndarray,
    column_bias: jnp.ndarray | None = None,
    tile_m: int | None = None,
    interpret: bool = False,
    exact: bool = True,
    with_xyz: bool = True,
    drop_first: bool = False,
    select: str = "auto",
):
    """Fused exact kNN + neighborhood gather in one kernel.

    Args:
      k: neighbors (static) — KEPT neighbors when ``drop_first``.
      points: (b, n, ck) dataset points (the kNN keys; also the xyz
        table when ``with_xyz`` — ck = 3 then).
      queries: (b, m, ck) query points.
      feats: (b, n, c) per-point features to gather, c ≤ 384.
      column_bias: optional (b, n) additive distance-column bias
        (duplicate masking — biased columns sort last).
      tile_m: query rows per grid step; None = auto (256 below
        n_pad = 2048, else 128 — the (n=4096, c=128) refiner shape fills
        VMEM: tables ~5 MiB + the two knockout-chain tiles + the
        (tm, k·cf) accumulator).
      exact: 3-term f32-precision feature gather (default); False =
        single bf16 term (turbo — values round like
        ``group_point(impl='onehot')``).  NOTE: interpret mode
        reproduces ``group_point(impl='gather')`` bit-exactly; on REAL
        hardware the gathered values hold f32 round-off (features
        measured 5.1e-6 rel — in-kernel MXU accumulation order; xyz
        rides the same in-kernel 3-term accumulation since round 4 —
        the round-3 lane-packed form degraded to bf16 grade 2.1e-3 on
        chip).  ``bench.parity_guard`` prints and bounds both every
        session.  dists/idx ARE bit-identical in both modes.
      with_xyz: also gather the neighbor coordinate rows (exact).
      drop_first: run k+1 selection rounds and keep rounds 1..k — the
        ``knn_unique(k+1)[:, :, 1:]`` edge-conv composition
        (ref:Common/ops.py:1856-1877) without gathering the self column.
      select: selection formulation — 'unroll' (round-3 form: statically
        unrolled rounds whose knockout masks double as the gather
        one-hots; ~10 live (tm, n) f32 chain tiles, VMEM-bound to
        n_pad ≤ 2048), 'loop' (selection + gathers fused in one
        fori_loop — the double-buffered carry is the only (tm, n) live
        state, so n_pad = 4096 fits; gathers accumulate into
        plane-major carries via an iota-select per round), or
        'auto' (loop iff n_pad > 2048).  CONTRACT DIFFERENCE: the loop
        form's VMEM-lean distance layout (K=8 coordinate-plane matmul,
        host-side squared norms) evaluates the same quantity in a
        different order, so its DISTANCES may deviate from the
        unrolled/knn_pallas values by ~1 ulp, and selection may pick a
        different neighbor where two distances are within that ulp
        (bit-identity across different kernel programs is not
        compiler-stable: even a byte-identical distance section
        deviates once the surrounding program changes XLA's fusion —
        measured, round 4).  The gathered rows always match the
        RETURNED idx exactly (f32 round-off on chip).  The production
        dispatch never runs both forms at one shape (loop only above
        n_pad 2048, where `grouping` documents the fused path as a
        turbo-envelope surface); `bench.parity_guard` bounds the loop
        form's deviations on chip every session.  The exact (3-term)
        loop form additionally requires n_pad·cf ≤ 4096·128 (VMEM
        table residency — ValueError above it; turbo has no such
        limit up to n_pad 4096 / cf 256).

    Returns:
      (sq_dists, idx, grouped_xyz, grouped_feat):
      (b, m, k) f32 ascending, (b, m, k) int32, (b, m, k, ck) f32 exact
      (``None`` when not ``with_xyz``), (b, m, k, c) f32.  dists/idx are
      bit-identical to ``knn_pallas`` (rounds 1..k of k+1 when
      ``drop_first``).

    Parity: composes ref:Common/ops.py:154-179 (knn + group_point) —
    the host-nanoflann kNN and the CUDA gather
    (ref:tf_ops/grouping/tf_grouping_g.cu:38-78) in one on-device pass.
    """
    b, n, c3 = points.shape
    m = queries.shape[1]
    c = feats.shape[-1]
    if c > 384:
        raise ValueError(f"knn_group_pallas supports c <= 384, got {c}")
    if with_xyz and c3 != 3:
        raise ValueError(f"with_xyz needs 3-d points, got c={c3}")
    n_pad = _round_up(max(n, 128), 128)
    c_pad = _round_up(max(c3, 128), 128)
    cf = _round_up(max(c, 128), 128)
    k_pad = _round_up(max(k, 128), 128)
    if select == "auto":
        select = "loop" if n_pad > 2048 else "unroll"
    if select not in ("loop", "unroll"):
        raise ValueError(f"select must be auto|loop|unroll, got {select!r}")
    tile_auto = tile_m is None
    if tile_auto:
        # the (tm, k·cf) accumulator (plus its output block) scales with
        # k·cf — stay at 128 rows for wide gathers and big clouds
        tile_m = 256 if (n_pad <= 2048 and k * cf <= 2048) else 128
    tile_m = min(tile_m, _round_up(max(m, 8), 8))

    # Fit the scoped-VMEM envelope (16 MiB).  Resident, tile_m-independent
    # tables: points (n·c_pad f32), the bf16 feature terms (3 exact /
    # 1 turbo), x9, bias.  Per-query-row costs: the query block, the
    # unrolled selection's live (tm, n) f32 distance tiles, the
    # distance-matmul temporary, the (tm, k·cf) f32 gather accumulator,
    # idx/dist outputs and the xyz output, with j-varying in/out blocks
    # double-buffered.  The live-tile count is CALIBRATED, not derived:
    # Mosaic keeps several knockout-chain copies live across the unrolled
    # rounds — measured stack allocations were 17.44 MiB at
    # (32,4096,c128)/tile 128 and 17.25 MiB at (28,1024,c128)/tile 256
    # (both OOMed the 16 MiB limit on chip: scripts/profile_r3r.py and
    # r3u §C round 3) where a 2-tile model predicted 14.4/10.0 MiB; the
    # 10-tile coefficient below upper-bounds both observations.
    nft = 3 if exact else 1
    if select == "loop":
        # CALIBRATED envelope (chipless AOT compile probes at the 16x
        # second-pass shapes, PERFORMANCE.md round 4 — a linear
        # fixed+per-row model underpredicted the measured stacks by
        # ~2x, so the caps are measured, not derived):
        #   table bytes/2 = nft·n_pad·cf (bf16, double-buffered)
        #   exact (nft=3): (2304,c128) tm96 / (3072,c128) tm48 /
        #     (4096,c128) tm16 compile (tm24 16.18M FAILs);
        #     (4096,cf256) 26.9M > 16M at ANY tile — the three
        #     resident term tables no longer fit
        #   turbo (nft=1): (4096,cf128) tm96 (tm128 16.71M FAILs);
        #     (4096,cf256) tm48
        area = n_pad * cf
        if exact and area > 4096 * 128:
            raise ValueError(
                "knn_group_pallas select='loop' exact mode exceeds the"
                f" VMEM envelope at n_pad*cf = {area} (> {4096 * 128}):"
                " the three bf16 term tables cannot stay VMEM-resident;"
                " use exact=False (turbo) or the composed knn+gather"
                " path (ops.grouping)")
        if tile_auto:
            if exact:
                cap = (96 if area <= 2304 * 128
                       else 48 if area <= 3072 * 128 else 16)
            else:
                cap = 96 if area <= 4096 * 128 else 48
            tile_m = min(tile_m, cap)
        # explicit tile_m is the caller's experiment (compile may OOM)
        fixed, per_row = 0, 0  # calibrated caps replace the formula
    else:
        fixed = (n_pad * c_pad * 4 + nft * n_pad * cf * 2
                 + 3 * n_pad * 16 * 2 + n_pad * 4)
        # live (tm, n)-tile count: unrolled keeps ~10 knockout-chain
        # copies (CALIBRATED round 3, see above)
        per_row = (2 * c_pad * 4       # query block (double-buffered)
                   + 10 * n_pad * 4    # live (tm, n) f32 tiles (calib.)
                   + n_pad * 4         # distance-matmul temporary
                   + 2 * k * cf * 4    # gather accumulator + out block
                   + 2 * 2 * k_pad * 4  # idx + dist out (double-buffered)
                   + (2 * k * 16 * 4 if with_xyz else 0))
    budget = 15 * 2**20
    while tile_m > 8 and fixed + tile_m * per_row > budget:
        # halve along an 8-aligned lattice: a non-power-of-two start
        # (tile_m = round_up(m, 8), e.g. m=20 → 24) would otherwise halve
        # to 12 and violate the {×8, ×128} block-dim convention
        tile_m = max(8, (tile_m // 2) // 8 * 8)
    tile_m = max(8, tile_m)
    m_pad = _round_up(max(m, tile_m), tile_m)

    bias = jnp.full((b, 1, n_pad), 1e30, jnp.float32)
    if column_bias is None:
        bias = bias.at[:, 0, :n].set(0.0)
    else:
        bias = bias.at[:, 0, :n].set(column_bias.astype(jnp.float32))

    p32 = points.astype(jnp.float32)
    if select == "loop":
        # transposed coordinate planes + host-side p2 (the loop
        # kernel's VMEM-lean distance layout — same three nonzero
        # contraction lanes; values agree with the unrolled form to
        # ≤1 ulp, see the `select` docstring)
        ptp = jnp.zeros((b, 8, n_pad), jnp.float32)
        ptp = ptp.at[:, :c3, :n].set(jnp.transpose(p32, (0, 2, 1)))
        qs = jnp.zeros((b, m_pad, 8), jnp.float32)
        qs = qs.at[:, :m, :c3].set(queries.astype(jnp.float32))
        # explicit (x²+y²)+z² for BOTH squared-norm inputs — the
        # in-kernel padded-lane tree reduce's association; a fused sum
        # over few lanes is free to associate differently under jit
        # (observed 1-ulp dist deviations)
        def _sq_norm(x):
            sq = x * x
            s = sq[..., 0]
            for ci in range(1, c3):
                s = s + sq[..., ci]
            return s

        p2 = jnp.zeros((b, 1, n_pad), jnp.float32)
        p2 = p2.at[:, 0, :n].set(_sq_norm(p32))
        q2 = jnp.zeros((b, m_pad, 1), jnp.float32)
        q2 = q2.at[:, :m, 0].set(_sq_norm(queries.astype(jnp.float32)))
        inputs = [ptp, qs, bias, p2, q2]
        in_specs = [
            pl.BlockSpec((1, 8, n_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_m, 8), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_m, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ]
        if with_xyz:
            # ONE packed 16-lane table, lanes 0:9 = [t1|t2|t3]; the
            # caller sums the exactly-gathered term lanes post-kernel
            t1, t2, t3 = _bf16_terms(p32)
            xtbl = jnp.zeros((b, n_pad, 16), jnp.bfloat16)
            xtbl = (xtbl.at[:, :n, 0:3].set(t1)
                    .at[:, :n, 3:6].set(t2)
                    .at[:, :n, 6:9].set(t3))
            inputs.append(xtbl)
            in_specs.append(
                pl.BlockSpec((1, n_pad, 16), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM))
    else:
        pts = jnp.zeros((b, n_pad, c_pad), jnp.float32)
        pts = pts.at[:, :n, :c3].set(p32)
        qs = jnp.zeros((b, m_pad, c_pad), jnp.float32)
        qs = qs.at[:, :m, :c3].set(queries.astype(jnp.float32))
        inputs = [pts, qs, bias]
        in_specs = [
            pl.BlockSpec((1, n_pad, c_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_m, c_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        if with_xyz:
            # xyz 3-term decomposition, one 16-lane table per term —
            # the terms accumulate in f32 inside the kernel like the
            # exact feature path
            for xt in _bf16_terms(p32):
                xtbl = jnp.zeros((b, n_pad, 16), jnp.bfloat16)
                inputs.append(xtbl.at[:, :n, 0:3].set(xt))
                in_specs.append(
                    pl.BlockSpec((1, n_pad, 16), lambda i, j: (i, 0, 0),
                                 memory_space=pltpu.VMEM))

    f32 = feats.astype(jnp.float32)
    t1, t2, t3 = _bf16_terms(f32)
    tbl_spec = pl.BlockSpec((1, n_pad, cf), lambda i, j: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    for t in (t1, t2, t3) if exact else (t1,):
        ft = jnp.zeros((b, n_pad, cf), jnp.bfloat16)
        inputs.append(ft.at[:, :n, :c].set(t))
        in_specs.append(tbl_spec)

    out_specs = [
        pl.BlockSpec((1, tile_m, k_pad), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_m, k_pad), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, m_pad, k_pad), jnp.int32),
        jax.ShapeDtypeStruct((b, m_pad, k_pad), jnp.float32),
    ]
    if select == "loop":
        # plane-major feature carry (the in-loop accumulator's layout)
        out_specs.append(
            pl.BlockSpec((1, k, tile_m, cf), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((b, k, m_pad, cf), jnp.float32))
    else:
        out_specs.append(
            pl.BlockSpec((1, tile_m, k * cf), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((b, m_pad, k * cf), jnp.float32))
    if with_xyz:
        out_specs.append(
            pl.BlockSpec((1, k, tile_m, 16), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((b, k, m_pad, 16), jnp.float32))

    kernel = (_make_knn_group_loop_kernel(k, exact, with_xyz, drop_first)
              if select == "loop"
              else _make_knn_group_kernel(k, exact, with_xyz, drop_first))
    outs = pl.pallas_call(
        kernel,
        grid=(b, m_pad // tile_m),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*inputs)
    idx_out, dist_out, feat_out = outs[:3]

    dists = dist_out[:, :m, :k]
    idx = idx_out[:, :m, :k]
    if select == "loop":
        gfeat = jnp.transpose(feat_out, (0, 2, 1, 3))[:, :m, :, :c]
    else:
        gfeat = feat_out[:, :m].reshape(b, m, k, cf)[..., :c]
    gxyz = None
    if with_xyz:
        x9 = jnp.transpose(outs[3], (0, 2, 1, 3))[:, :m]
        if select == "loop":
            # packed-table lanes: per-term gathered rows, each exact —
            # (t1+t2)+t3 reproduces the exact coordinate by the
            # _bf16_terms invariant (partial sums f32-representable)
            gxyz = (x9[..., 0:3] + x9[..., 3:6]) + x9[..., 6:9]
        else:
            # terms already accumulated in f32 inside the kernel —
            # lanes 0:3 hold the coordinates
            gxyz = x9[..., 0:3]
    return dists, idx, gxyz, gfeat


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 5, 6, 7, 8))
def knn_group_pallas_diff(
    k: int,
    points: jnp.ndarray,
    queries: jnp.ndarray,
    feats: jnp.ndarray,
    column_bias: jnp.ndarray | None = None,
    interpret: bool = False,
    exact: bool = True,
    with_xyz: bool = True,
    drop_first: bool = False,
):
    """Differentiable :func:`knn_group_pallas` (pallas_call has no AD rule).

    The VJP treats the selection as fixed, exactly like the composed
    path's autodiff: distance cotangents flow to the query and its
    selected neighbors (the ``top_k(pairwise)`` gradient), and the
    grouped xyz/feature cotangents scatter-add back to ``points`` /
    ``feats`` at the selected indices (the gather transpose,
    deterministic — ref's CUDA grads use atomicAdd,
    ref:tf_ops/grouping/tf_grouping_g.cu:60-78).  The column bias gets
    no gradient.
    """
    return knn_group_pallas(
        k,
        jax.lax.stop_gradient(points),
        jax.lax.stop_gradient(queries),
        jax.lax.stop_gradient(feats),
        None if column_bias is None else jax.lax.stop_gradient(column_bias),
        None,
        interpret,
        exact,
        with_xyz,
        drop_first,
    )


def _knn_group_fwd(k, points, queries, feats, column_bias,
                   interpret, exact, with_xyz, drop_first):
    out = knn_group_pallas_diff(
        k, points, queries, feats, column_bias, interpret, exact,
        with_xyz, drop_first)
    _, idx, _, _ = out
    return out, (points, queries, feats, column_bias, idx)


def _knn_group_bwd(k, interpret, exact, with_xyz, drop_first,
                   res, cotangents):
    points, queries, feats, column_bias, idx = res
    g_dist, _, g_gxyz, g_gfeat = cotangents

    def scat(zeros, i, u):
        return jax.vmap(
            lambda z, ii, uu: z.at[ii.reshape(-1)].add(
                uu.reshape(-1, uu.shape[-1]))
        )(zeros, i, u)

    # gather transposes
    d_feats = scat(jnp.zeros_like(feats), idx,
                   g_gfeat.astype(feats.dtype))
    d_points = jnp.zeros_like(points)
    if with_xyz and g_gxyz is not None:
        d_points = scat(d_points, idx, g_gxyz.astype(points.dtype))
    # distance cotangent (selection fixed): d = |q - p_sel|^2
    neighbors = jax.vmap(lambda p, i: p[i])(points, idx)
    diff = queries[:, :, None, :] - neighbors
    contrib = 2.0 * g_dist[..., None] * diff
    d_queries = jnp.sum(contrib, axis=2)
    d_points = d_points + scat(jnp.zeros_like(points), idx, -contrib)
    d_bias = (None if column_bias is None
              else jnp.zeros_like(column_bias))
    return d_points, d_queries, d_feats, d_bias


knn_group_pallas_diff.defvjp(_knn_group_fwd, _knn_group_bwd)


def _make_attention_kernel(scale: float, nk: int):
    """Softmax attention for one (batch, query-tile) grid step.

    K and V for the whole cloud live in VMEM (bottleneck dims are small:
    nk·c ≤ 4096·64 f32 = 1 MB each at the refiner's scale), so every
    score row is complete in-register — no online/streaming softmax is
    needed, unlike FlashAttention over long sequences.  Matmuls run
    single-pass bf16 with f32 accumulation, matching what XLA's DEFAULT
    precision does for the einsum form this replaces; softmax stays f32.
    """

    def kernel(q_ref, k_ref, v_ref, o_ref):
        q = q_ref[0]                                 # (tq, c) bf16
        kt = k_ref[0]                                # (nk_pad, c) bf16
        s = jax.lax.dot_general(
            q, kt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                    # (tq, nk_pad)
        nk_pad = s.shape[-1]
        if nk_pad != nk:
            lane = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(lane < nk, s, -jnp.inf)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(jnp.bfloat16), v_ref[0],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                            # (tq, cv_pad)
        o_ref[0] = o / denom

    return kernel


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def attention_pallas(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float = 1.0,
    tile_q: int = 256,
    interpret: bool = False,
):
    """``softmax(scale · q kᵀ) v`` without materializing the map in HBM.

    The XLA einsum form writes the (b, nq, nk) attention map to HBM and
    reads it back through the softmax and the value matmul — 2.1 GB of
    round-trips at the refiner's 16× second-pass shape (32, 4096, 4096).
    Here the map never leaves VMEM: one grid step computes a full
    (tile_q, nk) score tile against the whole VMEM-resident K/V.

    Operands are cast bf16 on the host side (the contraction runs
    single-pass bf16 with f32 accumulation either way — exactly what
    XLA DEFAULT precision does to the einsum form — and bf16 K/V halve
    both HBM traffic and VMEM residency; the softmax stays f32).

    Args:
      q: (b, nq, c) float32 queries.
      k: (b, nk, c) float32 keys (nk·(c+cv) must fit VMEM — fine for
        nk ≤ ~8192 at the bottleneck widths used here).
      v: (b, nk, cv) float32 values.
      scale: score multiplier (the NL cell passes 1/sqrt(c)).
      tile_q: queries per grid step; the f32 score tile tile_q·nk_pad
        dominates the VMEM budget (256·4096·4 = 4 MB; 512 tiles blow the
        16 MB scoped limit at nk = 4096 — measured).  Internally clamped
        so the score tile stays ≤ 4 MB at any nk.

    Returns:
      (b, nq, cv) float32.  Values match the XLA einsum composition to
      bf16-matmul rounding (this is NN compute, not selection — the
      exactness policy allows it).

    Parity: ref:Common/ops.py:302-346 (the attention core of
    ``PointNonLocalCell``, mode='dot').
    """
    b, nq, c = q.shape
    nk, cv = v.shape[1], v.shape[2]
    nk_pad = _round_up(max(nk, 128), 128)
    # Clamp the query tile so the f32 score tile (tile_q · nk_pad · 4 B,
    # the dominant scoped-VMEM resident — the 16 MB limit is real:
    # tile_q=1024 at nk=4096 was rejected by Mosaic at 21.4 MB) stays
    # within ~4 MB, leaving room for K/V/q/o and double-buffering.
    vmem_cap = max(8, (4 * 1024 * 1024 // (nk_pad * 4)) // 8 * 8)
    tile_q = min(tile_q, vmem_cap, _round_up(max(nq, 8), 8))
    nq_pad = _round_up(max(nq, tile_q), tile_q)
    c_pad = _round_up(max(c, 128), 128)
    cv_pad = _round_up(max(cv, 128), 128)

    qp = jnp.zeros((b, nq_pad, c_pad), jnp.bfloat16)
    qp = qp.at[:, :nq, :c].set(q.astype(jnp.bfloat16))
    kp = jnp.zeros((b, nk_pad, c_pad), jnp.bfloat16)
    kp = kp.at[:, :nk, :c].set(k.astype(jnp.bfloat16))
    vp = jnp.zeros((b, nk_pad, cv_pad), jnp.bfloat16)
    vp = vp.at[:, :nk, :cv].set(v.astype(jnp.bfloat16))

    out = pl.pallas_call(
        _make_attention_kernel(float(scale), nk),
        grid=(b, nq_pad // tile_q),
        in_specs=[
            pl.BlockSpec((1, tile_q, c_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            # K/V block indices are constant in j, so Mosaic re-fetches
            # them only on batch changes
            pl.BlockSpec((1, nk_pad, c_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk_pad, cv_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_q, cv_pad), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nq_pad, cv_pad), jnp.float32),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :nq, :cv]


def attention_xla(q, k, v, scale):
    """The einsum composition the kernel replaces — the dispatched XLA
    fallback (nn.attention.global_attention) and the parity reference for
    the interpret-mode kernel tests."""
    s = jnp.einsum("bqc,bnc->bqn", q, k) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqn,bnc->bqc", p, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def attention_pallas_diff(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float = 1.0,
    tile_q: int = 256,
    interpret: bool = False,
):
    """Differentiable ``attention_pallas`` (pallas_call has no AD rule).

    Backward recomputes the map in XLA (standard softmax-attention VJP:
    dV = pᵀ·do, ds = p ∘ (do·vᵀ − Σ(do·vᵀ ∘ p)), dQ = scale·ds·k,
    dK = scale·dsᵀ·q) at DEFAULT matmul precision — the same bf16
    rounding the forward kernel uses, so forward/backward see the same
    map up to accumulation order.  Training shapes (nk ≤ 1024) keep the
    recomputed map small; serving, where the map is 2.1 GB, never calls
    the backward.
    """
    return attention_pallas(q, k, v, scale, tile_q, interpret)


def _attention_fwd(q, k, v, scale, tile_q, interpret):
    return attention_pallas(q, k, v, scale, tile_q, interpret), (q, k, v)


def _attention_bwd(scale, tile_q, interpret, res, do):
    q, k, v = res
    s = jnp.einsum("bqc,bnc->bqn", q, k) * scale
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("bqn,bqc->bnc", p, do)
    dp = jnp.einsum("bqc,bnc->bqn", do, v)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = scale * jnp.einsum("bqn,bnc->bqc", ds, k)
    dk = scale * jnp.einsum("bqn,bqc->bnc", ds, q)
    return dq, dk, dv


attention_pallas_diff.defvjp(_attention_fwd, _attention_bwd)


def nn_distance_chunked(xyz1: jnp.ndarray, xyz2: jnp.ndarray, chunk: int = 4096):
    """Streaming bidirectional NN distance for large clouds.

    Same results as ``dispu_tpu.ops.chamfer.nn_distance`` but never
    materializes more than (chunk, m) of the distance matrix — use for
    whole-cloud evaluation where n·m would exceed HBM.  No gradient (eval
    only).
    """
    from dispu_tpu.ops.geometry import pairwise_sq_dist

    def directed(a, b):
        n = a.shape[1]
        pad = (-n) % chunk
        a_pad = jnp.pad(a, ((0, 0), (0, pad), (0, 0))) if pad else a
        chunks = a_pad.reshape(a.shape[0], -1, chunk, 3)

        def body(carry, ach):
            d = pairwise_sq_dist(ach, b)  # (b, chunk, m)
            idx = jnp.argmin(d, axis=-1).astype(jnp.int32)
            nearest = jnp.take_along_axis(
                b, idx[..., None], axis=-2
            )
            dist = jnp.sum((ach - nearest) ** 2, axis=-1)
            return carry, (dist, idx)

        _, (dist, idx) = jax.lax.scan(
            body, None, jnp.swapaxes(chunks, 0, 1)
        )
        dist = jnp.swapaxes(dist, 0, 1).reshape(a.shape[0], -1)[:, :n]
        idx = jnp.swapaxes(idx, 0, 1).reshape(a.shape[0], -1)[:, :n]
        return dist, idx

    d1, i1 = directed(xyz1, xyz2)
    d2, i2 = directed(xyz2, xyz1)
    return d1, i1, d2, i2


# ---------------------------------------------------------------------------
# Fused refiner local branch (round 5, VERDICT r4 item 5)
# ---------------------------------------------------------------------------

def _make_refine_local_kernel(k: int, cf: int, c_mid: int, c_out: int):
    def kernel(g_ref, w0_ref, b0_ref, w1_ref, b1_ref, ww_ref, bw_ref,
               wsk_ref, bsk_ref, waf_ref, baf_ref, out_ref):
        """One grid step = (one cloud, one 128-point tile): the refiner's
        whole local branch — conv0 → conv1 → weight-net pooling →
        after_conv, plus the skip branch — without materializing any of
        the (b, n, k, ·) intermediates in HBM.

        The composed XLA path round-trips ~3.9 GB of (1M-row, 128-ch)
        activations through HBM at the b=64 refiner shape (conv0 out,
        conv1 in/out, pooling in/out, after_conv in); here every
        intermediate lives in VMEM for the tile's lifetime and HBM sees
        exactly one read of the grouped features and one write of the
        (nt, c_out) output.  ref:Common/ops.py:1012-1072 is the workload.

        g (1, nt, k, cf) VMEM — the grouped [centered_xyz | raw_xyz |
        features] tensor; weight-net BN is pre-folded into (ww, bw) by
        the wrapper (inference path: running stats are constants).
        waf arrives pre-permuted (k, c_mid, c_out) — t-major row blocks
        of the checkpoint's (c'·k, c_out) kernel, see
        nn.layers._PermutedRowDense — so the per-t accumulation
        ``acc += pool_t @ waf[t]`` IS after_conv on the t-major flatten.
        """
        nt = g_ref.shape[1]
        g = g_ref[0].reshape(nt * k, cf)

        h = jnp.dot(g, w0_ref[...], preferred_element_type=jnp.float32)
        h = jnp.maximum(h + b0_ref[...], 0.0)
        h = jnp.dot(h, w1_ref[...], preferred_element_type=jnp.float32)
        h = jnp.maximum(h + b1_ref[...], 0.0)          # (nt·k, c_mid)

        cen = g[:, :3]                                  # centered xyz
        w = jnp.dot(cen, ww_ref[...], preferred_element_type=jnp.float32)
        w = jnp.maximum(w + bw_ref[...], 0.0)           # (nt·k, k)

        h3 = h.reshape(nt, k, c_mid)
        w3 = w.reshape(nt, k, k)
        acc = jnp.zeros((nt, c_out), jnp.float32)
        for t in range(k):  # static unroll: k independent MXU passes
            pool_t = jnp.sum(h3 * w3[:, :, t][..., None], axis=1)
            acc = acc + jnp.dot(
                pool_t, waf_ref[t], preferred_element_type=jnp.float32
            )
        after = jnp.maximum(acc + baf_ref[...], 0.0)

        gmax = jnp.max(g_ref[0], axis=1)                # (nt, cf)
        skip = jnp.dot(gmax, wsk_ref[...], preferred_element_type=jnp.float32)
        skip = jnp.maximum(skip + bsk_ref[...], 0.0)

        out_ref[0] = after + skip

    return kernel


def refine_local_pallas(
    grouped: jnp.ndarray,
    w0, b0, w1, b1, ww, bw, wsk, bsk, waf, baf,
    interpret: bool = False,
    tile_n: int = 128,
):
    """Fused local+skip branch of PointShuffle2 (inference only — no
    autodiff rule; the training path keeps the composed XLA form).

    Args:
      grouped: (b, n, k, cf) grouped [centered_xyz(3) | raw_xyz(3) |
        features] tensor (n must be a multiple of ``tile_n``).
      w0/b0, w1/b1: conv0/conv1 Dense params (cf→c_mid→c_mid).
      ww/bw: weight-net Dense params with the inference BN affine folded
        in (3→k).
      wsk/bsk: skip Dense params (cf→c_out).
      waf: after_conv kernel pre-permuted to (k, c_mid, c_out) t-major
        blocks; baf its bias.

    Returns:
      (b, n, c_out) f32 — relu(after_conv(pool)) + relu(skip), exactly
      the sum PointShuffle2 feeds the non-local add.  Accuracy: in
      interpret mode (CPU) values match the composed XLA path to f32
      round-off (tests/test_pallas.py::TestRefineLocalPallas); ON REAL
      HARDWARE Mosaic lowers these ``jnp.dot``s to single bf16 MXU
      passes, so outputs measured bf16-grade (~2.6e-3 rel) against the
      composed path — one reason this kernel is a measured-negative
      OPTION, not the default (PERFORMANCE.md round-5; forcing
      precision=HIGHEST would triple the MXU passes and bury its
      already-marginal 1.15 ms isolated win).
    """
    b, n, k, cf = grouped.shape
    if n % tile_n:
        raise ValueError(f"n={n} must be a multiple of tile_n={tile_n}")
    c_mid = w1.shape[-1]
    c_out = wsk.shape[-1]
    f32 = jnp.float32
    args = [jnp.asarray(a, f32) for a in
            (w0, b0[None], w1, b1[None], ww, bw[None],
             wsk, bsk[None], waf, baf[None])]

    def full(shape):
        return pl.BlockSpec(shape, lambda i, j: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _make_refine_local_kernel(k, cf, c_mid, c_out),
        grid=(b, n // tile_n),
        in_specs=[
            pl.BlockSpec((1, tile_n, k, cf), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            full((cf, c_mid)), full((1, c_mid)),
            full((c_mid, c_mid)), full((1, c_mid)),
            full((3, k)), full((1, k)),
            full((cf, c_out)), full((1, c_out)),
            full((k, c_mid, c_out)), full((1, c_out)),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_n, c_out), lambda i, j: (i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, c_out), f32),
        interpret=interpret,
    )(jnp.asarray(grouped, f32), *args)
    return out


# ---------------------------------------------------------------------------
# Mega-fused refiner block: kNN + gathers + local MLP + skip (round 5)
# ---------------------------------------------------------------------------

def _make_refine_block_kernel(k: int, c_out: int):
    def kernel(pts_ref, q_ref, qx_ref, bias_ref, xt1_ref, xt2_ref, xt3_ref,
               ft_ref, w0x_ref, w0f_ref, b0_ref, w1_ref, b1_ref,
               wwx_ref, bw_ref, wskx_ref, wskf_ref, bsk_ref,
               waf_ref, baf_ref, out_ref):
        """One grid step = (one cloud, one query tile): exact kNN
        selection + per-round one-hot gathers + the refiner's whole
        local+skip branch, with NO (tm, k, ·) tensor ever existing.

        Each selection round's knockout mask is the one-hot of the
        chosen neighbor (as in _make_knn_group_kernel); the round
        gathers that neighbor's xyz (3-term exact) and features (single
        bf16 term — turbo grade) and immediately pushes the row through
        conv0/conv1/weight-net, accumulating the weighted pooling and
        the skip max — so the grouped tensor, conv activations, and
        pooling weights all live only as per-round (tm, ·) registers.
        after_conv folds in at the end as k matmuls against the t-major
        kernel blocks.  The [cen|raw|feat] row concat is avoided by
        splitting conv0/skip kernels into row blocks (cen/raw live in
        16-lane planes, features in their own matmul).

        Selection is bit-identical to knn_pallas (HIGHEST-precision
        distances, maskout + first-lane tie rule); the MLP arithmetic is
        TURBO grade (Mosaic lowers these dots to single bf16 passes).
        """
        p = pts_ref[0]          # (n_pad, c_pad) f32 — distance keys
        q = q_ref[0]            # (tm, c_pad)
        qx = qx_ref[0]          # (tm, 16) f32 — query xyz, lanes 0:3
        n_pad = p.shape[0]
        tm = q.shape[0]

        p2 = jnp.sum(p * p, axis=1)[None, :]
        q2 = jnp.sum(q * q, axis=1)[:, None]
        qp = jnp.dot(
            q, p.T,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        d = jnp.maximum(q2 - 2.0 * qp + p2, 0.0) + bias_ref[0]

        lane = jax.lax.broadcasted_iota(jnp.int32, (tm, n_pad), 1)
        dn = (((1,), (0,)), ((), ()))  # (tm, n) @ (n, c)

        xts = (xt1_ref[0], xt2_ref[0], xt3_ref[0])  # (n_pad, 16) bf16
        ft = ft_ref[0]                              # (n_pad, cf) bf16
        c_mid = w1_ref.shape[0]

        pool = [jnp.zeros((tm, c_mid), jnp.float32) for _ in range(k)]
        max_x = jnp.full((tm, 16), -jnp.inf, jnp.float32)
        max_c = jnp.full((tm, 16), -jnp.inf, jnp.float32)
        max_f = None

        dc = d
        for j in range(k):
            mv2 = jnp.min(dc, axis=1, keepdims=True)
            hit = jnp.where(dc == mv2, lane, n_pad)
            sel2 = jnp.min(hit, axis=1, keepdims=True)
            if j + 1 < k:
                dc = jnp.where(lane == sel2, _KNN_SENTINEL, dc)
            onehot = (lane == sel2).astype(jnp.bfloat16)

            g9 = jax.lax.dot_general(
                onehot, xts[0], dn, preferred_element_type=jnp.float32)
            for xt in xts[1:]:
                g9 = g9 + jax.lax.dot_general(
                    onehot, xt, dn, preferred_element_type=jnp.float32)
            gf = jax.lax.dot_general(
                onehot, ft, dn, preferred_element_type=jnp.float32)

            cen = g9 - qx                       # (tm, 16), lanes 0:3 live
            # conv0 on the split row: cen/raw ride 16-lane planes
            h = (jnp.dot(cen, w0x_ref[0], preferred_element_type=jnp.float32)
                 + jnp.dot(g9, w0x_ref[1], preferred_element_type=jnp.float32)
                 + jnp.dot(gf, w0f_ref[...], preferred_element_type=jnp.float32))
            h = jnp.maximum(h + b0_ref[...], 0.0)
            h = jnp.dot(h, w1_ref[...], preferred_element_type=jnp.float32)
            h = jnp.maximum(h + b1_ref[...], 0.0)   # (tm, c_mid)
            w = jnp.dot(cen, wwx_ref[...], preferred_element_type=jnp.float32)
            w = jnp.maximum(w + bw_ref[...], 0.0)   # (tm, k<=16 lanes)
            for t in range(k):
                pool[t] = pool[t] + w[:, t][:, None] * h
            max_x = jnp.maximum(max_x, cen)
            max_c = jnp.maximum(max_c, g9)
            max_f = gf if max_f is None else jnp.maximum(max_f, gf)

        acc = jnp.zeros((tm, c_out), jnp.float32)
        for t in range(k):
            acc = acc + jnp.dot(
                pool[t], waf_ref[t], preferred_element_type=jnp.float32)
        after = jnp.maximum(acc + baf_ref[...], 0.0)

        skip = (jnp.dot(max_x, wskx_ref[0], preferred_element_type=jnp.float32)
                + jnp.dot(max_c, wskx_ref[1],
                          preferred_element_type=jnp.float32)
                + jnp.dot(max_f, wskf_ref[...],
                          preferred_element_type=jnp.float32))
        skip = jnp.maximum(skip + bsk_ref[...], 0.0)

        out_ref[0] = after + skip

    return kernel


def refine_block_pallas(
    xyz: jnp.ndarray,
    feats: jnp.ndarray,
    w0, b0, w1, b1, ww, bw, wsk, bsk, waf, baf,
    tile_m: int = 128,
    interpret: bool = False,
):
    """Fused kNN + gathers + local MLP + skip for the refiner (TURBO).

    Args:
      xyz: (b, n, 3) coarse points (kNN keys AND queries — the refiner's
        self-neighborhood, k = ww.shape[-1]).
      feats: (b, n, c) per-point features.
      w0: (6+c, c_mid) conv0 kernel — rows [cen(3) | raw(3) | feat(c)],
        exactly the composed path's layout.
      ww/bw: weight-net Dense with the inference BN affine pre-folded
        (rows are the 3 centered-xyz channels; k columns).
      waf: (k, c_mid, c_out) t-major after_conv blocks (see
        refine_local_pallas).
      wsk: (6+c, c_out) skip kernel, same row layout as w0.

    Returns:
      (b, n, c_out) f32 — relu(after_conv(pool)) + relu(skip): the sum
      PointShuffle2 feeds the non-local add, with NO grouped tensor ever
      materialized (the composed path's (b, n, k, 6+c) neighborhood is
      ~0.56 GB at the b=64 bench shape).  Neighbor SELECTION is exact
      (bit-identical to knn_pallas); gathers and MLP arithmetic are
      turbo-grade bf16 on real hardware.  ref:Common/ops.py:154-179 +
      1012-1072 fused end to end.
    """
    b, n, _ = xyz.shape
    c = feats.shape[-1]
    k = ww.shape[-1]
    c_mid = w1.shape[-1]
    c_out = wsk.shape[-1]
    if w0.shape[0] != 6 + c or wsk.shape[0] != 6 + c:
        raise ValueError("w0/wsk rows must be [cen(3)|raw(3)|feat(c)]")
    if k > 16:
        raise ValueError("refine_block_pallas supports k <= 16")
    n_pad = _round_up(max(n, 128), 128)
    c_pad = 128
    cf = _round_up(max(c, 128), 128)
    m_pad = _round_up(max(n, tile_m), tile_m)
    f32 = jnp.float32

    p32 = jax.lax.stop_gradient(xyz).astype(f32)
    pts = jnp.zeros((b, n_pad, c_pad), f32).at[:, :n, :3].set(p32)
    qs = jnp.zeros((b, m_pad, c_pad), f32).at[:, :n, :3].set(p32)
    qx = jnp.zeros((b, m_pad, 16), f32).at[:, :n, :3].set(p32)
    bias = jnp.full((b, 1, n_pad), 1e30, f32).at[:, 0, :n].set(0.0)
    xt_tables = []
    for t in _bf16_terms(p32):
        xt_tables.append(
            jnp.zeros((b, n_pad, 16), jnp.bfloat16).at[:, :n, 0:3].set(t)
        )
    t1, _, _ = _bf16_terms(jax.lax.stop_gradient(feats).astype(f32))
    ftbl = jnp.zeros((b, n_pad, cf), jnp.bfloat16).at[:, :n, :c].set(t1)

    # split conv0/skip rows: [cen|raw] into two (16, c) planes, feat its
    # own matmul with rows zero-padded to the table's cf lanes
    def split16(wm):
        wx = jnp.zeros((2, 16, wm.shape[-1]), f32)
        wx = wx.at[0, 0:3].set(wm[0:3]).at[1, 0:3].set(wm[3:6])
        wf = jnp.zeros((cf, wm.shape[-1]), f32).at[:c].set(wm[6:])
        return wx, wf

    w0x, w0f = split16(jnp.asarray(w0, f32))
    wskx, wskf = split16(jnp.asarray(wsk, f32))
    wwx = jnp.zeros((16, 16), f32).at[0:3, :k].set(jnp.asarray(ww, f32))
    bw16 = jnp.zeros((1, 16), f32).at[0, :k].set(jnp.asarray(bw, f32))

    def full(shape):
        return pl.BlockSpec(shape, lambda i, j: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((1, n_pad, c_pad), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_m, c_pad), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_m, 16), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, n_pad), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec((1, n_pad, 16), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM)
    ] * 3 + [
        pl.BlockSpec((1, n_pad, cf), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        full((2, 16, c_mid)), full((cf, c_mid)), full((1, c_mid)),
        full((c_mid, c_mid)), full((1, c_mid)),
        full((16, 16)), full((1, 16)),
        full((2, 16, c_out)), full((cf, c_out)), full((1, c_out)),
        full((k, c_mid, c_out)), full((1, c_out)),
    ]
    out = pl.pallas_call(
        _make_refine_block_kernel(k, c_out),
        grid=(b, m_pad // tile_m),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, tile_m, c_out), lambda i, j: (i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, m_pad, c_out), f32),
        interpret=interpret,
    )(
        pts, qs, qx, bias, *xt_tables, ftbl,
        w0x, w0f, jnp.asarray(b0, f32)[None],
        jnp.asarray(w1, f32), jnp.asarray(b1, f32)[None],
        wwx, bw16,
        wskx, wskf, jnp.asarray(bsk, f32)[None],
        jnp.asarray(waf, f32), jnp.asarray(baf, f32)[None],
    )
    return out[:, :n]
