"""Neighborhood construction: ball query and index-based grouping.

TPU-native replacement for ref:tf_ops/grouping/ (CUDA) and the composite
``grouping`` helper (ref:Common/ops.py:154-179) that the reference routed
through a host-side nanoflann kNN (``tf.py_func``) — here everything stays
on device with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dispu_tpu.ops.geometry import pairwise_sq_dist
from dispu_tpu.ops.knn import knn_indices


def query_ball_point(
    radius,
    nsample: int,
    xyz: jnp.ndarray,
    new_xyz: jnp.ndarray,
    impl: str = "auto",
    return_dists: bool = False,
    select_smallest: int = 0,
):
    """First-``nsample`` dataset points within ``radius`` of each query.

    Args:
      radius: scalar or (b,) per-batch search radius (euclidean).
      nsample: max points per ball (static).
      xyz: (b, n, 3) dataset points.
      new_xyz: (b, m, 3) query points.
      impl: 'auto' (fused Pallas kernel on TPU when shapes fit, XLA
        otherwise), 'xla', or 'pallas'.

    Returns:
      idx: (b, m, nsample) int32 indices into ``xyz``.
      pts_cnt: (b, m) int32 number of in-ball points (capped at nsample).
      dists (only if ``return_dists``): (b, m, nsample) f32 squared
        distances of the selected hits in the hit test's expansion form —
        selection-grade values with no gradient (padded slots repeat the
        first hit's distance; empty balls give 0).  Lets callers rank
        neighbors without paying the per-row TPU gather for coordinates.
      sel_idx (only if ``select_smallest`` > 0): (b, m, select_smallest)
        int32 — the dataset indices of the lowest-distance hits, i.e.
        ``take_along(idx, top_k(-dists, k).indices)`` selected inside the
        kernel on TPU (no sort, no (b, m, nsample) round-trip).

    Parity: ref:tf_ops/grouping/tf_grouping_g.cu:1-36 — scans dataset points
    in index order, keeps the first ``nsample`` hits, and pads the remaining
    slots by repeating the first hit (lines 26-31).  The CUDA test is
    ``max(sqrt(d), 1e-20) < radius`` so the query point itself always counts;
    equivalent to ``d_sq < radius^2`` for any radius > 1e-20.  Per-batch
    radius tensors supported as in this fork (ref:tf_grouping.py:21-29).

    Implementation: rather than a sequential scan, the first-k-hits-in-index-
    order are extracted with one ``top_k`` over ``where(hit, index, n)`` —
    O(n log n) on-device, no host sync, fully batched.  On TPU the Pallas
    kernel replaces the sort with ``nsample`` masked-min rounds over the
    VMEM-resident key tile (bit-identical outputs; the repulsion/uniform
    losses and the discriminator's SA grouping sit on this op every step).
    """
    if select_smallest > nsample:
        raise ValueError(
            f"select_smallest={select_smallest} exceeds nsample={nsample}"
        )
    xyz = jnp.asarray(xyz)
    new_xyz = jnp.asarray(new_xyz)
    use_pallas = impl == "pallas" or (
        impl == "auto"
        and jax.default_backend() not in ("cpu", "gpu")
        and xyz.shape[1] <= 4096
        and xyz.shape[-1] <= 128
        and nsample <= 128
    )
    if use_pallas:
        from dispu_tpu.ops.pallas_kernels import query_ball_pallas

        return query_ball_pallas(
            radius, nsample, xyz, new_xyz,
            with_dists=return_dists, select_smallest=select_smallest,
        )
    b, n, _ = xyz.shape
    radius = jnp.broadcast_to(jnp.asarray(radius, xyz.dtype), (b,))
    d = pairwise_sq_dist(new_xyz, xyz)  # (b, m, n)
    hit = d < (radius**2)[:, None, None]
    key = jnp.where(hit, jnp.arange(n, dtype=jnp.int32)[None, None, :], n)
    k_eff = min(nsample, n)  # nsample may exceed the cloud size
    neg_small, _ = jax.lax.top_k(-key, k_eff)  # smallest keys first
    slots = -neg_small  # (b, m, k_eff), ascending hit indices, n = no hit
    if k_eff < nsample:
        pad_cols = jnp.full(slots.shape[:-1] + (nsample - k_eff,), n, slots.dtype)
        slots = jnp.concatenate([slots, pad_cols], axis=-1)
    valid = slots < n
    first = slots[..., :1]
    any_hit = valid[..., :1]
    pad = jnp.where(any_hit, first, 0)
    idx = jnp.where(valid, slots, pad).astype(jnp.int32)
    pts_cnt = jnp.minimum(jnp.sum(hit, axis=-1), nsample).astype(jnp.int32)
    if return_dists or select_smallest:
        d_sel = jnp.take_along_axis(d, jnp.where(valid, slots, 0), axis=-1)
        d_first = d_sel[..., :1]
        dists = jnp.where(valid, d_sel,
                          jnp.where(any_hit, d_first, 0.0))
        dists = jax.lax.stop_gradient(dists)
        extras = []
        if return_dists:
            extras.append(dists)
        if select_smallest:
            _, sub = jax.lax.top_k(-dists, select_smallest)
            extras.append(jnp.take_along_axis(idx, sub, axis=-1))
        return (idx, pts_cnt, *extras)
    return idx, pts_cnt


def selection_sort(dist: jnp.ndarray, k: int):
    """k smallest entries (values + indices) of each distance-matrix row.

    Parity: ref:tf_ops/grouping/tf_grouping_g.cu:80-123 (``selection_sort``
    — unused by the reference model; one ``top_k`` here).  Returns
    (dist_out, idx) of shape (..., k), ascending.
    """
    neg, idx = jax.lax.top_k(-dist, k)
    return -neg, idx


# exact-gather impl used when onehot_hp reroutes at n > 2048 (see
# group_point); measurement scripts may rebind it to A/B the reroute.
# 'gather' (native): wins isolated (33.74 vs onehot3's 47.59 ms at
# (32,4096,k16,c131), scripts/profile_r4c.py), TIES in-context (115.6
# vs 115.7 ms/fwd pass-2, scripts/profile_r4d.py — the gap hides under
# the refiner's other work), and is safe for eager callers (onehot3
# outside jit materializes the (b, m·k, n) one-hot as a ~16 GiB HBM
# argument; under jit XLA fuses it away).
_EXACT_BIG_GATHER = "gather"


@jax.custom_vjp
def _gather_onehot3(points: jnp.ndarray, onehot: jnp.ndarray):
    """Bit-exact one-hot gather in 3 bf16 MXU passes.

    The one-hot has a single exact 1.0 per row, so only the TABLE needs
    splitting: each pass gathers one ``_bf16_terms`` term's rows
    exactly (f32 accumulation), and ``(g1 + g2) + g3`` reconstructs the
    f32 rows bit-exactly — half of ``precision=HIGHEST``'s 6 passes
    (which must split both operands).  A custom VJP is required because
    the fold-proof integer-RNE ``_bf16_terms`` is built from bitcasts
    (no autodiff rule); the true gradient is the gather transpose —
    out is linear in ``points`` with exact-1.0 coefficients.
    """
    from dispu_tpu.ops.pallas_kernels import _bf16_terms

    g1, g2, g3 = (
        jnp.einsum("bqn,bnc->bqc", onehot, t,
                   preferred_element_type=jnp.float32)
        for t in _bf16_terms(points)
    )
    return (g1 + g2) + g3


def _gather_onehot3_fwd(points, onehot):
    return _gather_onehot3(points, onehot), onehot


def _gather_onehot3_bwd(onehot, g):
    # gather transpose: deterministic scatter-add as an exact f32
    # contraction (each product is 1.0 · g; HIGHEST keeps it exact)
    d_points = jnp.einsum(
        "bqn,bqc->bnc", onehot.astype(jnp.float32), g,
        precision=jax.lax.Precision.HIGHEST)
    return d_points, jnp.zeros_like(onehot)


_gather_onehot3.defvjp(_gather_onehot3_fwd, _gather_onehot3_bwd)


def group_point(
    points: jnp.ndarray, idx: jnp.ndarray, impl: str = "gather"
) -> jnp.ndarray:
    """Gather per-query neighborhoods by index.

    Args:
      points: (b, n, c).
      idx: (b, m, nsample) int32 indices into the n axis.
      impl: 'gather' (exact, default), 'onehot' — a bf16 one-hot matmul
        that XLA fuses into an MXU pass, ~2.8× faster than the TPU gather
        for (1024, 16, 128)-scale neighborhoods but bf16-rounds the
        gathered values — 'onehot_hp' — the same one-hot contraction at
        ``precision=HIGHEST``: each output element is a dot product with a
        single 1.0, and the 3-term bf16 decomposition of an f32 operand is
        exact, so the result is *bit-identical* to the native gather while
        still running on the MXU (verified on-chip each bench session) —
        'onehot3' — the one-hot is exact in bf16 so only the TABLE needs
        splitting: 3 bf16 MXU passes over the ``_bf16_terms``
        decomposition instead of HIGHEST's 6 (which splits both
        operands), same bit-exact contract — or 'pallas' — the fused
        VMEM-resident kernel
        (:func:`dispu_tpu.ops.pallas_kernels.gather_rows_pallas`): the same
        exact values in 3 MXU passes with the one-hot never materialized
        in HBM; falls back to the native gather off-TPU or for non-f32
        tables.

    Returns:
      (b, m, nsample, c).

    Parity: ref:tf_ops/grouping/tf_grouping_g.cu:38-78; the scatter-add
    gradient comes from autodiff (deterministic, no atomics) on every path
    (the one-hot paths transpose the same matmul).
    """
    if impl == "pallas":
        b, n, c = points.shape
        m, k = idx.shape[1], idx.shape[2]
        # working set per grid step: f32 table (n·c·4) + three bf16
        # decomposition copies (n·c·6) + transposed one-hot (n·tq·2) +
        # f32 accumulator — cap n·c so the total stays well under VMEM
        fits_vmem = n <= 4096 and c <= 256 and n * c <= 4096 * 128
        if (jax.default_backend() not in ("cpu", "gpu")
                and points.dtype == jnp.float32 and fits_vmem):
            from dispu_tpu.ops.pallas_kernels import gather_rows_pallas_diff

            out = gather_rows_pallas_diff(points, idx.reshape(b, m * k))
            return out.reshape(b, m, k, c)
        return jax.vmap(lambda p, i: p[i])(points, idx)
    if impl == "onehot_hp" and points.shape[-2] > 2048:
        # the HIGHEST-precision one-hot contraction does O(n) MXU work
        # PER GATHERED ROW in ~6 bf16 passes; at the refiner's second-pass
        # scale it loses to the row-count-bound native gather (47.50 vs
        # 33.74 ms at (32, 4096, 16, 131), scripts/profile_r4c.py).
        # 'onehot3' halves the passes (only the table needs splitting —
        # the one-hot is exact in bf16) but the one-hot operand traffic
        # dominates, so it only TIES the 6-pass form (47.59) and still
        # loses to native isolated; in-context the two reroute choices
        # tie exactly (scripts/profile_r4d.py).  _EXACT_BIG_GATHER is
        # module state only so the profile scripts can A/B the reroute;
        # bench.parity_guard asserts onehot3 ≡ gather on chip.
        impl = (_EXACT_BIG_GATHER
                if points.dtype == jnp.float32 else "gather")
    if impl in ("onehot", "onehot_hp", "onehot3"):
        b, n, c = points.shape
        m, k = idx.shape[1], idx.shape[2]
        if impl == "onehot":
            onehot = jax.nn.one_hot(
                idx.reshape(b, m * k), n, dtype=jnp.bfloat16
            )
            out = jnp.einsum(
                "bqn,bnc->bqc", onehot, points.astype(jnp.bfloat16)
            )
        elif impl == "onehot3":
            onehot = jax.nn.one_hot(
                idx.reshape(b, m * k), n, dtype=jnp.bfloat16
            )
            out = _gather_onehot3(points.astype(jnp.float32), onehot)
        else:
            # NOTE: a 3-term bf16 value split (exact, 3 passes instead of
            # HIGHEST's 6) measures faster in isolation (10.4 → 6.2 ms at
            # the refiner scale) but slightly *slower* inside the full
            # model (32.6 → 33.4 ms) — XLA fuses the plain HIGHEST
            # contraction with its consumers better.  Keeping the simple
            # form; revisit if the surrounding fusion changes.
            onehot = jax.nn.one_hot(idx.reshape(b, m * k), n, dtype=points.dtype)
            out = jnp.einsum(
                "bqn,bnc->bqc", onehot, points,
                precision=jax.lax.Precision.HIGHEST,
            )
        return out.reshape(b, m, k, c).astype(points.dtype)
    return jax.vmap(lambda p, i: p[i])(points, idx)


def grouping(
    feature: jnp.ndarray,
    k: int,
    src_xyz: jnp.ndarray,
    q_xyz: jnp.ndarray,
    use_xyz: bool = True,
    use_knn: bool = True,
    radius: float = 0.2,
    gather_impl: str = "gather",
    knn_variant: str = "auto",
):
    """kNN (or ball) neighborhoods of query points, with gathered features.

    Args:
      feature: (b, n, c) features aligned with ``src_xyz``.
      k: neighborhood size.
      src_xyz: (b, n, 3) dataset points.
      q_xyz: (b, m, 3) query points.
      use_xyz: prepend raw neighbor xyz to the gathered features.
      use_knn: exact kNN (reference used host nanoflann here); otherwise
        ball query with ``radius``.

    Returns:
      (grouped_xyz, grouped_feature, idx):
        (b, m, k, 3), (b, m, k, 3+c or c), (b, m, k).

    Parity: ref:Common/ops.py:154-179.  The reference's ``use_knn=False``
    branch is latently broken (uses an undefined ``idx`` at line 174); this
    implementation fixes it by gathering features with the ball-query
    indices, which is the evident intent.

    ``gather_impl='fused'`` routes the kNN *and* both gathers through one
    Pallas kernel (:func:`dispu_tpu.ops.pallas_kernels.knn_group_pallas`):
    the selection rounds' knockout masks double as one-hot gather operands
    on the MXU, so the grouped tensor costs no separate gather pass.
    kNN dists/idx are bit-identical to the composed path, and since the
    round-4 ``_bf16_terms`` fix the gathered features and xyz are
    bit-exact on real hardware too (``bench.parity_guard`` asserts all
    of this every session).  ``'fused_turbo'`` bf16-rounds the gathered
    FEATURES like ``impl='onehot'`` (documented value deviation), so
    only that mode is a TURBO-envelope path.  Both fall back to the
    composed path off-TPU and outside the measured win region (see the
    gate below).
    """
    if use_knn and gather_impl in ("fused", "fused_turbo"):
        # n ≤ 2048 rides the round-3 unrolled form.  HISTORY: r3u §K
        # measured it winning 19.1 → 13.8 ms exact at (64,1024,c128),
        # but the composed path has since overtaken it — the round-5
        # re-measurement (scripts/profile_r5c, same shape) reads
        # composed-onehot_hp 11.43 vs fused 13.10 ms isolated, forward
        # b=64 2229 vs 2090 patches/s, and the b=28 train step 37.2 vs
        # 58.3 ms — so the fused form is now a measured NEGATIVE at the
        # bench shape too (gathers still bit-exact, dev 0.0 on chip)
        # and stays strictly opt-in.  The round-4 fori_loop form
        # (select='loop') likewise loses at n=4096 (r4a: 82.65 vs
        # 45.50 ms); the dispatch gate stays at n ≤ 2048.
        fits = (
            jax.default_backend() not in ("cpu", "gpu")
            and src_xyz.shape[1] <= 2048
            and feature.shape[-1] <= 384
            and src_xyz.shape[-1] == 3
        )
        if fits:
            from dispu_tpu.ops.pallas_kernels import knn_group_pallas_diff

            _, idx, grouped_xyz, grouped_feature = knn_group_pallas_diff(
                k, src_xyz, q_xyz, feature,
                exact=(gather_impl == "fused"),
            )
            if use_xyz:
                grouped_feature = jnp.concatenate(
                    [grouped_xyz, grouped_feature], axis=-1
                )
            return grouped_xyz, grouped_feature, idx
        gather_impl = "onehot_hp" if gather_impl == "fused" else "onehot"
    if use_knn:
        idx = knn_indices(k, src_xyz, q_xyz, variant=knn_variant)
    else:
        idx, _ = query_ball_point(radius, k, src_xyz, q_xyz)
    if gather_impl != "onehot":
        # One combined [xyz | feature] gather: every exact impl gathers
        # rows bit-exactly, so xyz keeps full precision, and the native
        # gather's cost is row-count-bound, not width-bound (measured
        # 16.9 ms for c=3 vs 17.5 ms for c=128 at the 16x second-pass
        # shape, scripts/profile_r3k.py) — two same-index gathers cost
        # twice one combined gather.
        combined = group_point(
            jnp.concatenate([src_xyz, feature], axis=-1), idx,
            impl=gather_impl,
        )
        grouped_xyz = combined[..., :3]
        grouped_feature = combined if use_xyz else combined[..., 3:]
    else:
        # turbo bf16 path: features may round, xyz must stay exact —
        # keep the gathers separate
        grouped_xyz = group_point(src_xyz, idx)
        grouped_feature = group_point(feature, idx, impl=gather_impl)
        if use_xyz:
            grouped_feature = jnp.concatenate(
                [grouped_xyz, grouped_feature], axis=-1
            )
    return grouped_xyz, grouped_feature, idx


def dilat_group(
    xyz: jnp.ndarray,
    points: jnp.ndarray | None,
    k: int,
    dilation: int = 1,
    use_xyz: bool = False,
):
    """Dilated kNN grouping: every ``dilation``-th of the k·d+1 nearest.

    Parity: ref:Common/ops.py:139-152 — kNN with ``k·dilation + 1``
    neighbors, stride-``dilation`` selection starting after the self
    column, centered xyz; optionally concat centered xyz onto features.

    Returns (grouped_xyz, grouped_points, idx) with grouped_xyz centered.
    """
    idx_full = knn_indices(k * dilation + 1, xyz, xyz)
    idx = idx_full[:, :, 1::dilation]
    grouped_xyz = group_point(xyz, idx) - xyz[:, :, None, :]
    if points is not None:
        grouped_points = group_point(points, idx)
        if use_xyz:
            grouped_points = jnp.concatenate(
                [grouped_xyz, grouped_points], axis=-1
            )
    else:
        grouped_points = grouped_xyz
    return grouped_xyz, grouped_points, idx
