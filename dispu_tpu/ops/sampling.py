"""Point sampling ops: farthest-point sampling, gathers, categorical sampling.

TPU-native replacements for ref:tf_ops/sampling/ (CUDA) — see each function's
parity note.  FPS is inherently sequential in the number of samples; the
XLA version keeps the running min-distance vector live in registers/VMEM
across a ``lax.fori_loop`` (one fused (n,3) distance + min + argmax per
step), and a Pallas kernel (``dispu_tpu.ops.pallas_kernels.fps``) keeps the
whole loop on-core for large n.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def farthest_point_sample(
    npoint: int, xyz: jnp.ndarray, impl: str = "auto"
) -> jnp.ndarray:
    """Iterative farthest-point sampling.

    Args:
      npoint: number of points to select (static).
      xyz: (b, n, 3) input points.
      impl: 'auto' (on TPU: the wide Pallas kernel inside its measured
        VMEM envelope, the chunked-sweep kernel above it, XLA loop past
        both; XLA loop off-TPU), 'xla', 'pallas', 'chunked', or 'batch'
        ('batch' fuses all b clouds into ONE chunked kernel whose rounds
        advance every cloud together — the serial argmax chain is
        latency-bound, so independent clouds ride it nearly free; falls
        back to 'auto' when b == 1, off-TPU, or past the b×-scaled VMEM
        envelope.  Opt-in: the streaming inference API's merge stage).

    Returns:
      (b, npoint) int32 indices; the first selected index is always 0.

    Parity: ref:tf_ops/sampling/tf_sampling_g.cu:105-170 — seeds with index
    0 (line 114-116), keeps a per-point running min squared distance
    (init 1e38), and at each step picks the argmax of the updated vector.
    Gradient: none (ref:tf_ops/sampling/tf_sampling.py:57 NoGradient).
    The two implementations agree exactly except where f32 near-ties make
    the greedy argmax order ambiguous (both orders are valid FPS results;
    the CUDA reference has its own tie order too).
    """
    if impl == "batch":
        b = xyz.shape[0]
        if (
            b > 1
            and jax.default_backend() not in ("cpu", "gpu")
            and _fps_chunked_batch_fits(xyz.shape[1], npoint, b)
        ):
            from dispu_tpu.ops.pallas_kernels import fps_pallas_chunked_batch

            return fps_pallas_chunked_batch(npoint, xyz)
        impl = "auto"
    if impl == "auto":
        if jax.default_backend() in ("cpu", "gpu"):
            impl = "xla"
        elif _fps_pallas_fits(xyz.shape[1], npoint):
            impl = "pallas"
        elif _fps_chunked_fits(xyz.shape[1], npoint):
            impl = "chunked"
        else:
            impl = "xla"
    if impl == "pallas":
        from dispu_tpu.ops.pallas_kernels import fps_pallas

        return fps_pallas(npoint, xyz)
    if impl == "chunked":
        from dispu_tpu.ops.pallas_kernels import fps_pallas_chunked

        return fps_pallas_chunked(npoint, xyz)
    return _fps_xla(npoint, xyz)


def _fps_pallas_fits(n: int, npoint: int) -> bool:
    """Whether the VMEM-resident FPS kernel's scoped stack fits on chip.

    The kernel holds the whole cloud in VMEM (3 coordinate planes + the
    mindist scratch + iota/compare temps), so very large merges must fall
    back to the XLA loop.  Calibrated on chip: at n_pad=479232,
    m_pad=160000 (16x on a 10k-point cloud) Mosaic reports an 18.80 MiB
    scoped allocation against the 16 MiB limit — ~38 B/point + 8 B/sample;
    budget 15 MiB with those coefficients (round-3 merge scales sit at
    ~10 MiB and keep the measured kernel path).
    """
    n_pad = -(-max(n, 1024) // 1024) * 1024
    m_pad = -(-max(npoint, 128) // 128) * 128
    return 40 * n_pad + 8 * m_pad <= 15 * 2**20


def _fps_chunked_fits(n: int, npoint: int) -> bool:
    """Envelope for the chunked-sweep kernel (fps_pallas_chunked).

    Its temporaries are (8, 128)-sized, so the budget is VMEM-residency
    of the operands, not the scoped stack: coordinate planes (12 B/pt,
    double-buffered across grid steps) + the mindist scratch (4 B/pt) +
    the output rows.  Cap well under the 128 MiB v5e VMEM; the 16x merge
    on a 10k cloud (n_pad 479232) sits at ~14 MiB.
    """
    n_pad = -(-max(n, 1024) // 1024) * 1024
    m_pad = -(-max(npoint, 128) // 128) * 128
    return 28 * n_pad + 8 * m_pad <= 64 * 2**20


def _fps_chunked_batch_fits(n: int, npoint: int, b: int) -> bool:
    """Envelope for the batch-fused chunked kernel: the whole batch's
    coordinate planes + mindist scratch + output rows live in VMEM at
    once (one grid step), so the per-cloud budget scales by b.  The
    unrolled per-cloud carries also multiply live (8, width) registers,
    so b is additionally capped small (the streaming API's sweet spot is
    2-4 concurrent merges)."""
    if b > 4:
        return False
    n_pad = -(-max(n, 1024) // 1024) * 1024
    m_pad = -(-max(npoint, 128) // 128) * 128
    return b * (28 * n_pad + 8 * m_pad) <= 64 * 2**20


@functools.partial(jax.jit, static_argnums=0)
def _fps_xla(npoint: int, xyz: jnp.ndarray) -> jnp.ndarray:
    xyz = jnp.asarray(xyz, jnp.float32)
    b, n, _ = xyz.shape

    def one_cloud(pts):
        def body(i, state):
            mindist, last, idxs = state
            d = jnp.sum((pts - pts[last]) ** 2, axis=-1)
            mindist = jnp.minimum(mindist, d)
            nxt = jnp.argmax(mindist).astype(jnp.int32)
            return mindist, nxt, idxs.at[i].set(nxt)

        idxs0 = jnp.zeros((npoint,), jnp.int32)
        mindist0 = jnp.full((n,), 1e38, jnp.float32)
        _, _, idxs = jax.lax.fori_loop(
            1, npoint, body, (mindist0, jnp.int32(0), idxs0)
        )
        return idxs

    out = jax.vmap(one_cloud)(xyz)
    return jax.lax.stop_gradient(out)


def _morton_spread3(v: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of v so they occupy every 3rd bit."""
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def morton_codes(xyz: jnp.ndarray, bits: int = 10) -> jnp.ndarray:
    """Interleaved-bit (Z-order) spatial keys for a point set.

    Args:
      xyz: (n, 3) points (any range; normalized internally).

    Returns:
      (n,) int32 Morton codes — sorting by them yields a spatially
      coherent 1-D order (nearby points land in nearby ranks).
    """
    lo = jnp.min(xyz, axis=0, keepdims=True)
    hi = jnp.max(xyz, axis=0, keepdims=True)
    scale = (2**bits - 1) / jnp.maximum(hi - lo, 1e-12)
    q = jnp.clip(
        ((xyz - lo) * scale).astype(jnp.int32), 0, 2**bits - 1
    ).astype(jnp.uint32)
    code = (
        _morton_spread3(q[:, 0])
        | (_morton_spread3(q[:, 1]) << 1)
        | (_morton_spread3(q[:, 2]) << 2)
    )
    return code.astype(jnp.int32)


def morton_rank(
    codes: jnp.ndarray, n_bins: int, chunk: int = 2048
) -> jnp.ndarray:
    """Stable counting rank for small-alphabet int keys — sort-free.

    Computes each element's position in the stable ascending sort of
    ``codes`` (the inverse of ``jnp.argsort(codes)``) WITHOUT a sort: one
    ``lax.scan`` over fixed-size chunks carries a running per-bin
    histogram; within a chunk the stable intra-key offset is a
    strictly-lower-triangular equality count (a (chunk, chunk) compare +
    row-reduce — pure VPU work, no data-dependent control flow), and the
    global key bases are an exclusive cumsum of the total histogram.
    O(n·(chunk + n_bins)) elementwise work at sequential depth n/chunk,
    vs the XLA sort's comparator network (~12 ms of the 14 ms bucketed
    merge FPS at the 16× scale — PERFORMANCE.md).

    Args:
      codes: (n,) integer keys in [0, n_bins).
      n_bins: static alphabet size (4096 for ``morton_codes(bits=4)``).
      chunk: scan tile (static); n is padded to a multiple internally —
        padding keys rank strictly after every real element.

    Returns:
      (n,) int32 ``pos`` — element i sorts to position ``pos[i]``; a
      bijection onto [0, n), equal keys keeping their index order.
    """
    n = codes.shape[0]
    n_pad = -(-n // chunk) * chunk
    # padded keys use n_bins-1 but sit AFTER every real element, so real
    # positions are unchanged and padded positions land >= n
    ch = jnp.full((n_pad,), n_bins - 1, codes.dtype).at[:n].set(codes)
    ch = ch.reshape(n_pad // chunk, chunk)
    bins = jnp.arange(n_bins, dtype=codes.dtype)
    tri = jnp.arange(chunk)[:, None] > jnp.arange(chunk)[None, :]

    def body(run_hist, c):
        eq = c[:, None] == c[None, :]
        off = jnp.sum(jnp.logical_and(eq, tri), axis=1, dtype=jnp.int32)
        hist_c = jnp.sum(c[None, :] == bins[:, None], axis=1,
                         dtype=jnp.int32)
        return run_hist + hist_c, run_hist[c] + off

    hist, within = jax.lax.scan(
        body, jnp.zeros((n_bins,), jnp.int32), ch
    )
    start = jnp.cumsum(hist) - hist  # exclusive
    return (start[ch] + within).reshape(-1)[:n]


def _bucketed_local(m_b: int, buckets: jnp.ndarray, impl: str) -> jnp.ndarray:
    """Per-bucket FPS selections, (K', n_b, 3) → (K', m_b) local indices."""
    if impl == "auto":
        impl = "pallas" if jax.default_backend() not in ("cpu", "gpu") else "xla"
    if impl == "pallas":
        from dispu_tpu.ops.pallas_kernels import fps_bucketed_pallas

        return fps_bucketed_pallas(m_b, buckets)
    return _fps_xla(m_b, buckets)


def farthest_point_sample_bucketed(
    npoint: int,
    xyz: jnp.ndarray,
    n_buckets: int = 64,
    impl: str = "auto",
    mesh=None,
    rank_impl: str = "argsort",
    bits: int = 10,
) -> jnp.ndarray:
    """Approximate FPS via spatially-partitioned parallel selection.

    Exact FPS runs ``npoint`` strictly sequential rounds, each touching
    all ``n`` points — O(n·npoint) work at sequential depth ``npoint``
    (0.5+ s for the 16× whole-cloud merge, n≈240k → m=80k).  This mode
    Morton-sorts the cloud into ``n_buckets`` equal-count spatially
    coherent buckets and runs all bucket-local FPS loops simultaneously
    (one Pallas kernel round selects one point per bucket), cutting both
    the work and the sequential depth by ``n_buckets``×.

    Selection semantics (documented deviation from exact FPS, which stays
    the default everywhere — see ``InferenceConfig.merge_fps``):
      * within a bucket: textbook FPS (seed = bucket's first Morton rank,
        greedy max-min), bit-identical to the XLA loop on that bucket;
      * across buckets: no coordination — each bucket contributes exactly
        ``ceil(npoint / n_buckets)`` points, so the output point count per
        region tracks the INPUT density at bucket granularity instead of
        exact FPS's globally uniform spacing, and spacing is not enforced
        across bucket seams.  For the merge workload (patch-overlap dedup)
        the measured metric deltas are recorded in PERFORMANCE.md.

    Args:
      npoint: output count (static).
      xyz: (n, 3) single cloud.
      n_buckets: spatial buckets (static; sequential depth = npoint / K).
      impl: 'auto' (Pallas on TPU, XLA loop elsewhere), 'xla', 'pallas'.
      mesh: optional ``jax.sharding.Mesh`` — buckets are sharded over the
        mesh's ``data`` axis via ``shard_map`` and selected concurrently
        (the bucket loops are independent, so the only communication is
        the output all-gather); bit-identical to the single-device path.
        Requires ``n_buckets`` divisible by the data-axis size.
      rank_impl: how points are ranked into Morton order — 'argsort'
        (XLA sort of the codes, the measured 12 ms term) or 'radix'
        (sort-free counting rank via :func:`morton_rank` + one
        permutation scatter; needs ``bits`` ≤ 4 so the 2^(3·bits)
        alphabet fits one histogram).  Both are stable, so at EQUAL
        ``bits`` they produce bit-identical buckets; 'radix' at bits=4
        orders within each 16³ morton cell by original index instead of
        finer morton rank — bucket-boundary cell splits and bucket seeds
        shift, the same class of deviation the bucketed mode already
        documents across bucket seams.
      bits: morton quantization per axis (10 = the round-3 measured
        default; 'radix' requires ≤ 4).

    Returns:
      (npoint,) int32 indices into ``xyz``, ordered round-robin by bucket
      selection rank (coarse→fine, like exact FPS's ordering globally).
    """
    n = xyz.shape[0]
    K = n_buckets
    m_b = -(-npoint // K)  # ceil
    n_b = max(-(-n // K), m_b)
    pad = K * n_b - n

    codes = morton_codes(xyz, bits=bits)
    if rank_impl == "radix":
        if bits > 4:
            raise ValueError(
                f"rank_impl='radix' needs bits <= 4 (2^(3*bits) histogram "
                f"bins), got bits={bits}"
            )
        pos = morton_rank(codes, n_bins=1 << (3 * bits))
        order = (
            jnp.zeros((n,), jnp.int32)
            .at[pos]
            .set(jnp.arange(n, dtype=jnp.int32), unique_indices=True)
        )
    elif rank_impl == "argsort":
        order = jnp.argsort(codes)
    else:
        raise ValueError(f"unknown rank_impl {rank_impl!r}")
    if pad:
        order = jnp.concatenate(
            [order, jnp.broadcast_to(order[-1:], (pad,))]
        )
    buckets = xyz[order].reshape(K, n_b, 3)

    if mesh is None:
        local = _bucketed_local(m_b, buckets, impl)         # (K, m_b)
    else:
        from functools import partial

        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        n_dev = mesh.shape["data"]
        if K % n_dev:
            raise ValueError(
                f"n_buckets={K} must be divisible by the data axis "
                f"({n_dev} devices)"
            )
        body = partial(_bucketed_local, m_b, impl=impl)
        try:
            # the per-shard FPS loop carries device-invariant initials into
            # a varying loop — no collectives inside, so the varying-axis
            # check is safely skipped
            sharded = shard_map(
                body, mesh=mesh, in_specs=P("data"), out_specs=P("data"),
                check_vma=False,
            )
        except TypeError:  # older jax: the kwarg was check_rep
            sharded = shard_map(
                body, mesh=mesh, in_specs=P("data"), out_specs=P("data"),
                check_rep=False,
            )
        local = sharded(buckets)                            # (K, m_b)
    global_idx = jnp.take_along_axis(
        order.reshape(K, n_b), local, axis=1
    )                                                       # (K, m_b)
    # round-robin interleave: every bucket's j-th pick before any (j+1)-th
    return jax.lax.stop_gradient(
        jnp.swapaxes(global_idx, 0, 1).reshape(-1)[:npoint].astype(jnp.int32)
    )


def gather_point(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather rows of a per-batch point/feature array.

    Args:
      points: (b, n, c).
      idx: (b, m) int32.

    Returns:
      (b, m, c).

    Parity: ref:tf_ops/sampling/tf_sampling_g.cu:172-192 (gather + scatter-add
    gradient).  Here the scatter-add backward comes from JAX autodiff of
    ``take_along_axis`` and is deterministic (no CUDA atomics).
    """
    return jnp.take_along_axis(points, idx[..., None], axis=-2)


def prob_sample(inp: jnp.ndarray, inp_r: jnp.ndarray) -> jnp.ndarray:
    """Sample categorical indices by inverse-CDF lookup.

    Args:
      inp: (b, n) non-negative weights.
      inp_r: (b, m) uniform samples in [0, 1).

    Returns:
      (b, m) int32 indices distributed ∝ inp.

    Parity: ref:tf_ops/sampling/tf_sampling_g.cu:7-104,194-201 (blocked
    cumsum + binary search).  Unused by the reference model (only a
    commented demo, ref:tf_ops/sampling/tf_sampling.py:79-105); provided for
    capability parity.
    """
    cdf = jnp.cumsum(inp, axis=-1)
    total = cdf[..., -1:]
    targets = inp_r * total
    idx = jax.vmap(lambda c, t: jnp.searchsorted(c, t, side="right"))(cdf, targets)
    return jnp.clip(idx, 0, inp.shape[-1] - 1).astype(jnp.int32)


def nonuniform_sample_indices(
    key: jax.Array, num: int, sample_num: int
) -> jnp.ndarray:
    """Gaussian-biased sampling of ``sample_num`` distinct indices in [0, num).

    The reference (ref:Common/point_operation.py:10-18) rejection-samples
    ints from N(loc·num, 0.3·num) with loc ~ U(0.1, 0.9) until it has
    ``sample_num`` distinct values — a data-dependent host loop.  The
    fixed-shape TPU equivalent is Gumbel-top-k: drawing k distinct indices
    with Gumbel-perturbed log-density argmax is exactly weighted sampling
    without replacement from the same (truncated, discretized) normal
    density, so the marginal bias profile matches while shapes stay static.

    Returns:
      (sample_num,) int32 distinct indices.
    """
    k_loc, k_gumbel = jax.random.split(key)
    loc = jax.random.uniform(k_loc) * 0.8 + 0.1
    positions = (jnp.arange(num, dtype=jnp.float32) + 0.5) / num
    log_density = -((positions - loc) ** 2) / (2.0 * 0.3**2)
    gumbel = jax.random.gumbel(k_gumbel, (num,))
    _, idx = jax.lax.top_k(log_density + gumbel, sample_num)
    return idx.astype(jnp.int32)
