"""Numeric-parity tests for dispu_tpu.ops against independent numpy oracles.

These encode the reference semantics documented in SURVEY.md §2.1 (padding,
FPS seed-0, squared distances, duplicate masking) — the per-kernel parity
harness the reference itself never had.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dispu_tpu import ops


# ---------------------------------------------------------------- oracles


def np_fps(xyz, npoint):
    """Greedy FPS, seed index 0 (ref:tf_sampling_g.cu:105-170)."""
    n = xyz.shape[0]
    idxs = np.zeros(npoint, np.int32)
    mindist = np.full(n, np.inf)
    last = 0
    for i in range(1, npoint):
        d = np.sum((xyz - xyz[last]) ** 2, axis=-1)
        mindist = np.minimum(mindist, d)
        last = int(np.argmax(mindist))
        idxs[i] = last
    return idxs


def np_ball_query(radius, nsample, xyz, new_xyz):
    """Index-order scan with repeat-first-hit padding (ref:tf_grouping_g.cu:1-36)."""
    m = new_xyz.shape[0]
    idx = np.zeros((m, nsample), np.int32)
    cnt = np.zeros(m, np.int32)
    for j in range(m):
        c = 0
        for k in range(xyz.shape[0]):
            if c == nsample:
                break
            d = max(np.sqrt(np.sum((xyz[k] - new_xyz[j]) ** 2)), 1e-20)
            if d < radius:
                if c == 0:
                    idx[j, :] = k
                idx[j, c] = k
                c += 1
        cnt[j] = c
    return idx, cnt


def np_nn_distance(a, b):
    d = np.sum((a[:, None, :] - b[None, :, :]) ** 2, axis=-1)
    return d.min(axis=1), d.argmin(axis=1)


# ------------------------------------------------------------------ tests


class TestGeometry:
    def test_pairwise_sq_dist(self, rng):
        x = rng.randn(2, 64, 3).astype(np.float32)
        y = rng.randn(2, 48, 3).astype(np.float32)
        got = np.asarray(ops.pairwise_sq_dist(x, y))
        want = np.sum((x[:, :, None] - y[:, None, :]) ** 2, axis=-1)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_normalize(self, rng):
        pc = (rng.randn(3, 100, 3) * 4 + 1).astype(np.float32)
        out, centroid, furthest = ops.normalize_point_cloud(pc)
        out = np.asarray(out)
        np.testing.assert_allclose(out.mean(axis=1), 0.0, atol=1e-5)
        radii = np.sqrt((out**2).sum(-1)).max(axis=1)
        np.testing.assert_allclose(radii, 1.0, atol=1e-5)
        # round trip
        np.testing.assert_allclose(
            out * np.asarray(furthest) + np.asarray(centroid), pc, atol=1e-4
        )

    def test_gen_grid(self):
        g = np.asarray(ops.gen_grid(4))
        assert g.shape == (4, 2)
        # 2x2 grid over [-0.2, 0.2]
        np.testing.assert_allclose(sorted(set(np.round(g[:, 0], 5))), [-0.2, 0.2])

    def test_gen_grid_nonsquare(self):
        g = np.asarray(ops.gen_grid(2))
        assert g.shape == (2, 2)


class TestKnn:
    def test_knn_matches_bruteforce(self, rng):
        pts = rng.randn(2, 128, 3).astype(np.float32)
        q = rng.randn(2, 32, 3).astype(np.float32)
        dist, idx = ops.knn(8, pts, q)
        dist, idx = np.asarray(dist), np.asarray(idx)
        for b in range(2):
            d = np.sum((q[b][:, None] - pts[b][None]) ** 2, axis=-1)
            order = np.argsort(d, axis=1)[:, :8]
            np.testing.assert_allclose(
                np.take_along_axis(d, idx[b], axis=1),
                np.take_along_axis(d, order, axis=1),
                atol=1e-5,
            )

    def test_knn_self_first(self, rng):
        pts = rng.randn(1, 64, 3).astype(np.float32)
        _, idx = ops.knn(4, pts, pts)
        np.testing.assert_array_equal(np.asarray(idx)[0, :, 0], np.arange(64))

    def test_duplicate_mask(self):
        pts = np.array([[[0, 0, 0], [1, 1, 1], [0, 0, 0], [1, 1, 1], [2, 2, 2]]],
                       np.float32)
        mask = np.asarray(ops.mask_duplicate_rows(pts))
        np.testing.assert_array_equal(mask[0], [False, False, True, True, False])

    def test_mask_duplicate_rows_loop_branch(self, rng):
        """The n>2048 fori_loop formulation must equal the broadcast one.

        Every shipping test shape takes the broadcast branch, so the loop
        path (selected on-device at the 4096-point second-pass shapes) is
        exercised here directly at small n with heavy duplication."""
        from dispu_tpu.ops.knn import _mask_dup_broadcast, _mask_dup_loop

        base = rng.randn(2, 16, 5).astype(np.float32)
        pts = np.concatenate([base, base[:, ::2], base[:, :8]], axis=1)
        perm = rng.permutation(pts.shape[1])
        pts = pts[:, perm]
        np.testing.assert_array_equal(
            np.asarray(_mask_dup_loop(pts)),
            np.asarray(_mask_dup_broadcast(pts)),
        )

    def test_knn_unique_skips_duplicates(self):
        pts = np.array(
            [[[0, 0, 0], [0, 0, 0], [1, 0, 0], [2, 0, 0], [3, 0, 0]]], np.float32
        )
        _, idx = ops.knn_unique(3, pts, pts[:, :1])
        idx = np.asarray(idx)[0, 0]
        # duplicate of index 0 (index 1) must not appear among top-3
        assert 1 not in idx
        assert list(idx) == [0, 2, 3]


class TestSampling:
    def test_fps_matches_oracle(self, rng):
        xyz = rng.randn(3, 100, 3).astype(np.float32)
        got = np.asarray(ops.farthest_point_sample(16, xyz))
        for b in range(3):
            np.testing.assert_array_equal(got[b], np_fps(xyz[b], 16))

    def test_fps_seed_zero(self, rng):
        xyz = rng.randn(2, 50, 3).astype(np.float32)
        got = np.asarray(ops.farthest_point_sample(8, xyz))
        assert (got[:, 0] == 0).all()

    def test_fps_pallas_vmem_gate(self):
        """auto must fall back to the XLA loop above the kernel's VMEM
        envelope (the 16x merge on a 10k-point cloud compiles to an
        18.8 MiB scoped stack vs the 16 MiB limit — a compile-time OOM
        without the gate)."""
        from dispu_tpu.ops.sampling import _fps_pallas_fits

        assert _fps_pallas_fits(1024, 256)  # patch-scale
        assert _fps_pallas_fits(237568, 80000)  # 16x merge, 5k cloud
        assert not _fps_pallas_fits(479232, 160000)  # 16x merge, 10k cloud

    def test_fps_chunked_envelope(self):
        """Shapes above the wide kernel's envelope route to the chunked
        kernel, which must cover the 16x merge on a 10k cloud."""
        from dispu_tpu.ops.sampling import _fps_chunked_fits

        assert _fps_chunked_fits(479232, 160000)
        assert not _fps_chunked_fits(4_000_000, 160000)

    def test_fps_chunked_impl_matches_xla(self, rng):
        xyz = rng.randn(2, 200, 3).astype(np.float32)
        want = np.asarray(ops.farthest_point_sample(32, xyz, impl="xla"))
        from dispu_tpu.ops.pallas_kernels import fps_pallas_chunked

        got = np.asarray(
            fps_pallas_chunked(32, jnp.asarray(xyz), interpret=True))
        np.testing.assert_array_equal(got, want)

    def test_bucketed_fps_covers_like_exact(self, rng):
        """Golden quality check for the documented-approximate merge mode
        (farthest_point_sample_bucketed): on a patchy overlapping cloud —
        the merge workload's density profile — the bucketed selection's
        coverage radius (max distance from any input point to its nearest
        selected point) stays within 2x of exact FPS, all indices are
        valid and unique, and the ordering is round-robin by bucket."""
        # overlapping clusters mimic merged patch overlap (2-3x density)
        centers = rng.randn(12, 3).astype(np.float32)
        pts = np.concatenate(
            [c + 0.35 * rng.randn(340, 3).astype(np.float32) for c in centers]
        )  # (4080, 3)
        n, m, K = pts.shape[0], 512, 16
        xyz = jnp.asarray(pts)

        sel_b = np.asarray(ops.farthest_point_sample_bucketed(m, xyz, K))
        sel_e = np.asarray(ops.farthest_point_sample(m, xyz[None]))[0]

        assert sel_b.shape == (m,)
        assert sel_b.min() >= 0 and sel_b.max() < n
        assert len(set(sel_b.tolist())) == m  # no duplicates at this fill

        def coverage(sel):
            d = np.linalg.norm(pts[:, None] - pts[sel][None], axis=-1)
            return d.min(axis=1).max()

        cov_b, cov_e = coverage(sel_b), coverage(sel_e)
        assert cov_b <= 2.0 * cov_e, (cov_b, cov_e)

        # round-robin ordering: the first K selections are the K bucket
        # seeds — spread out, like exact FPS's coarse-to-fine prefix
        assert coverage(sel_b[: 2 * K]) <= 3.5 * coverage(sel_e[: 2 * K])

    def test_bucketed_fps_xla_equals_pallas_interpret(self, rng):
        """The dispatchable impls agree end-to-end (same buckets, same
        local selections, same mapping)."""
        from dispu_tpu.ops import pallas_kernels as pk

        xyz = jnp.asarray(rng.randn(1000, 3).astype(np.float32))
        a = np.asarray(ops.farthest_point_sample_bucketed(96, xyz, 8, impl="xla"))
        # route the pallas impl through interpret mode
        orig = pk.fps_bucketed_pallas
        try:
            pk.fps_bucketed_pallas = lambda m, b: orig(m, b, interpret=True)
            b_ = np.asarray(
                ops.farthest_point_sample_bucketed(96, xyz, 8, impl="pallas")
            )
        finally:
            pk.fps_bucketed_pallas = orig
        np.testing.assert_array_equal(a, b_)

    def test_morton_rank_matches_stable_argsort(self, rng):
        """morton_rank is the inverse of jnp.argsort (stable) — exactly,
        including heavy duplicate keys and n not a multiple of the scan
        chunk (padding must not disturb real positions)."""
        from dispu_tpu.ops.sampling import morton_rank

        for n, n_bins, chunk in ((4096, 4096, 2048), (5000, 4096, 2048),
                                 (300, 64, 256), (2048, 16, 512)):
            codes = jnp.asarray(
                rng.randint(0, n_bins, size=(n,)), jnp.int32)
            pos = np.asarray(jax.jit(
                lambda c: morton_rank(c, n_bins=n_bins, chunk=chunk)
            )(codes))
            # a bijection onto [0, n)
            assert sorted(pos.tolist()) == list(range(n))
            order = np.asarray(jnp.argsort(codes))  # stable by default
            expect = np.empty(n, np.int64)
            expect[order] = np.arange(n)
            np.testing.assert_array_equal(pos, expect)

    def test_bucketed_fps_radix_rank_equals_argsort_at_equal_bits(
            self, rng):
        """'radix' and 'argsort' ranking are both stable, so at the SAME
        morton quantization they must produce bit-identical selections —
        the only semantic delta of the radix mode is bits 10 → 4."""
        xyz = jnp.asarray(rng.randn(3000, 3).astype(np.float32))
        a = np.asarray(ops.farthest_point_sample_bucketed(
            256, xyz, 16, rank_impl="argsort", bits=4))
        b = np.asarray(ops.farthest_point_sample_bucketed(
            256, xyz, 16, rank_impl="radix", bits=4))
        np.testing.assert_array_equal(a, b)
        with pytest.raises(ValueError):
            ops.farthest_point_sample_bucketed(
                256, xyz, 16, rank_impl="radix", bits=10)
        with pytest.raises(ValueError):
            ops.farthest_point_sample_bucketed(
                256, xyz, 16, rank_impl="quick")

    def test_bucketed_fps_radix_covers_like_exact(self, rng):
        """The radix mode's bits=4 quantization keeps the same coverage
        contract the bucketed mode documents (patchy merge-like cloud)."""
        centers = rng.randn(12, 3).astype(np.float32)
        pts = np.concatenate(
            [c + 0.35 * rng.randn(340, 3).astype(np.float32)
             for c in centers])
        xyz, m = jnp.asarray(pts), 512
        sel_r = np.asarray(ops.farthest_point_sample_bucketed(
            m, xyz, 16, rank_impl="radix", bits=4))
        sel_e = np.asarray(ops.farthest_point_sample(m, xyz[None]))[0]
        assert len(set(sel_r.tolist())) == m

        def coverage(sel):
            d = np.linalg.norm(pts[:, None] - pts[sel][None], axis=-1)
            return d.min(axis=1).max()

        assert coverage(sel_r) <= 2.0 * coverage(sel_e)

    def test_bucketed_fps_sharded_matches_single(self, rng):
        """shard_map over the bucket axis (8-device mesh): bit-identical
        to the single-device path — the merge stage's multi-chip form."""
        from dispu_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
        xyz = jnp.asarray(rng.randn(2000, 3).astype(np.float32))
        single = ops.farthest_point_sample_bucketed(256, xyz, 16)
        sharded = ops.farthest_point_sample_bucketed(256, xyz, 16, mesh=mesh)
        np.testing.assert_array_equal(np.asarray(single), np.asarray(sharded))
        with pytest.raises(ValueError):
            ops.farthest_point_sample_bucketed(256, xyz, 12, mesh=mesh)

    def test_gather_point(self, rng):
        pts = rng.randn(2, 20, 3).astype(np.float32)
        idx = rng.randint(0, 20, size=(2, 7)).astype(np.int32)
        got = np.asarray(ops.gather_point(pts, idx))
        for b in range(2):
            np.testing.assert_allclose(got[b], pts[b][idx[b]])

    def test_gather_point_grad_is_scatter_add(self, rng):
        pts = jnp.asarray(rng.randn(1, 5, 3).astype(np.float32))
        idx = jnp.asarray([[1, 1, 3]], dtype=jnp.int32)
        g = jax.grad(lambda p: jnp.sum(ops.gather_point(p, idx)))(pts)
        want = np.zeros((1, 5, 3), np.float32)
        want[0, 1] = 2.0
        want[0, 3] = 1.0
        np.testing.assert_allclose(np.asarray(g), want)

    def test_prob_sample_distribution(self):
        key = jax.random.PRNGKey(0)
        w = jnp.asarray([[0.0, 1.0, 3.0, 0.0]])
        r = jax.random.uniform(key, (1, 4000))
        idx = np.asarray(ops.prob_sample(w, r))
        counts = np.bincount(idx[0], minlength=4) / 4000
        np.testing.assert_allclose(counts, [0, 0.25, 0.75, 0], atol=0.03)

    def test_nonuniform_sampling_distinct(self):
        idx = np.asarray(
            ops.nonuniform_sample_indices(jax.random.PRNGKey(1), 1024, 256)
        )
        assert len(set(idx.tolist())) == 256
        assert idx.min() >= 0 and idx.max() < 1024


class TestGrouping:
    def test_ball_query_matches_oracle(self, rng):
        xyz = rng.rand(2, 64, 3).astype(np.float32)
        q = rng.rand(2, 16, 3).astype(np.float32)
        idx, cnt = ops.query_ball_point(0.3, 8, xyz, q)
        idx, cnt = np.asarray(idx), np.asarray(cnt)
        for b in range(2):
            widx, wcnt = np_ball_query(0.3, 8, xyz[b], q[b])
            np.testing.assert_array_equal(cnt[b], wcnt)
            np.testing.assert_array_equal(idx[b], widx)

    def test_ball_query_per_batch_radius(self, rng):
        xyz = rng.rand(2, 64, 3).astype(np.float32)
        radii = np.array([0.2, 0.5], np.float32)
        idx, cnt = ops.query_ball_point(radii, 8, xyz, xyz)
        cnt = np.asarray(cnt)
        for b in range(2):
            _, wcnt = np_ball_query(radii[b], 8, xyz[b], xyz[b])
            np.testing.assert_array_equal(cnt[b], wcnt)

    def test_group_point(self, rng):
        pts = rng.randn(2, 32, 4).astype(np.float32)
        idx = rng.randint(0, 32, size=(2, 10, 5)).astype(np.int32)
        got = np.asarray(ops.group_point(pts, idx))
        for b in range(2):
            np.testing.assert_allclose(got[b], pts[b][idx[b]])

    def test_group_point_gradient(self, rng):
        # mirrors ref:tf_ops/grouping/tf_grouping_op_test.py — numeric grad check
        pts = jnp.asarray(rng.randn(1, 32, 4).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, 32, size=(1, 8, 3)).astype(np.int32))

        def f(p):
            return jnp.sum(jnp.sin(ops.group_point(p, idx)))

        g = jax.grad(f)(pts)
        eps = 1e-3
        p0 = np.asarray(pts)
        for (bi, ni, ci) in [(0, 3, 1), (0, 17, 0), (0, 31, 3)]:
            pp = p0.copy(); pp[bi, ni, ci] += eps
            pm = p0.copy(); pm[bi, ni, ci] -= eps
            num = (f(jnp.asarray(pp)) - f(jnp.asarray(pm))) / (2 * eps)
            np.testing.assert_allclose(np.asarray(g)[bi, ni, ci], num, atol=1e-2)

    def test_group_point_onehot3_bit_exact(self, rng):
        """The 3-pass bf16-split MXU gather (the n>2048 exact reroute
        target) must equal the native gather bit for bit — its terms
        come from the fold-proof integer-RNE _bf16_terms split, and
        each one-hot pass gathers its term's rows exactly."""
        pts = (rng.randn(2, 64, 9).astype(np.float32)
               * 10.0 ** rng.uniform(-8, 8, (2, 64, 9)).astype(np.float32))
        idx = rng.randint(0, 64, size=(2, 20, 5)).astype(np.int32)
        ref = np.asarray(ops.group_point(pts, idx))
        got = np.asarray(jax.jit(
            lambda p, i: ops.group_point(p, i, impl="onehot3"))(pts, idx))
        np.testing.assert_array_equal(got, ref)
        # grad flows through the einsum transpose (same scatter-add
        # semantics as the native path)
        g = jax.grad(lambda p: jnp.sum(
            ops.group_point(p, jnp.asarray(idx), impl="onehot3")))(
                jnp.asarray(pts))
        gn = jax.grad(lambda p: jnp.sum(
            ops.group_point(p, jnp.asarray(idx))))(jnp.asarray(pts))
        np.testing.assert_allclose(np.asarray(g), np.asarray(gn),
                                   rtol=1e-6, atol=0)

    def test_grouping_composite(self, rng):
        xyz = rng.randn(1, 40, 3).astype(np.float32)
        feat = rng.randn(1, 40, 7).astype(np.float32)
        gxyz, gfeat, idx = ops.grouping(feat, 6, xyz, xyz)
        assert gxyz.shape == (1, 40, 6, 3)
        assert gfeat.shape == (1, 40, 6, 10)  # use_xyz prepends 3
        np.testing.assert_allclose(
            np.asarray(gfeat)[..., :3], np.asarray(gxyz), atol=1e-6
        )


class TestChamfer:
    def test_nn_distance_matches_oracle(self, rng):
        a = rng.randn(2, 50, 3).astype(np.float32)
        b = rng.randn(2, 70, 3).astype(np.float32)
        d1, i1, d2, i2 = [np.asarray(x) for x in ops.nn_distance(a, b)]
        for k in range(2):
            wd1, wi1 = np_nn_distance(a[k], b[k])
            wd2, wi2 = np_nn_distance(b[k], a[k])
            np.testing.assert_allclose(d1[k], wd1, atol=1e-4)
            np.testing.assert_allclose(d2[k], wd2, atol=1e-4)
            np.testing.assert_array_equal(i1[k], wi1)
            np.testing.assert_array_equal(i2[k], wi2)

    def test_nn_distance_gradient_numeric(self, rng):
        # mirrors the reference's train-loop grad check style
        # (ref:tf_ops/nn_distance/tf_nndistance.py:40-66) but as a numeric check
        a = jnp.asarray(rng.randn(1, 12, 3).astype(np.float32))
        b = jnp.asarray(rng.randn(1, 15, 3).astype(np.float32))

        def loss(a_, b_):
            d1, _, d2, _ = ops.nn_distance(a_, b_)
            return jnp.sum(d1) + 0.5 * jnp.sum(d2)

        ga, gb = jax.grad(loss, argnums=(0, 1))(a, b)
        eps = 1e-3

        a0, b0 = np.asarray(a), np.asarray(b)
        for (ni, ci) in [(0, 0), (5, 2), (11, 1)]:
            ap = a0.copy(); ap[0, ni, ci] += eps
            am = a0.copy(); am[0, ni, ci] -= eps
            num = (loss(jnp.asarray(ap), b) - loss(jnp.asarray(am), b)) / (2 * eps)
            np.testing.assert_allclose(np.asarray(ga)[0, ni, ci], num, atol=5e-2)
        for (ni, ci) in [(0, 1), (7, 0), (14, 2)]:
            bp = b0.copy(); bp[0, ni, ci] += eps
            bm = b0.copy(); bm[0, ni, ci] -= eps
            num = (loss(a, jnp.asarray(bp)) - loss(a, jnp.asarray(bm))) / (2 * eps)
            np.testing.assert_allclose(np.asarray(gb)[0, ni, ci], num, atol=5e-2)

    def test_chamfer_zero_for_identical(self, rng):
        a = rng.randn(2, 64, 3).astype(np.float32)
        assert float(ops.chamfer_distance(a, a)) < 1e-10


class TestEMD:
    def test_match_is_doubly_stochastic(self, rng):
        a = rng.rand(2, 32, 3).astype(np.float32)
        b = rng.rand(2, 32, 3).astype(np.float32)
        match = np.asarray(ops.approx_match(a, b))
        # equal sizes: row and column sums should each approach 1
        np.testing.assert_allclose(match.sum(axis=1), 1.0, atol=0.05)
        np.testing.assert_allclose(match.sum(axis=2), 1.0, atol=0.05)

    def test_match_recovers_permutation(self, rng):
        # well-separated points: the approximate match should be the identity
        base = np.stack(np.meshgrid(np.arange(4), np.arange(4)), -1).reshape(-1, 2)
        a = np.concatenate([base, np.zeros((16, 1))], -1)[None].astype(np.float32)
        perm = rng.permutation(16)
        b = a[:, perm]
        match = np.asarray(ops.approx_match(a, b))[0]  # (m, n)
        assign = match.argmax(axis=1)
        np.testing.assert_array_equal(assign, perm)

    def test_emd_cost_against_exact(self, rng):
        from scipy.optimize import linear_sum_assignment

        a = rng.rand(1, 24, 3).astype(np.float32)
        b = rng.rand(1, 24, 3).astype(np.float32)
        cost = float(ops.earth_mover_cost(a, b))
        d = np.sqrt(np.sum((a[0][:, None] - b[0][None]) ** 2, -1))
        ri, ci = linear_sum_assignment(d)
        exact = d[ri, ci].sum() / 24
        assert cost >= exact - 1e-4  # approximation can't beat the optimum
        assert cost <= exact * 1.6 + 1e-3  # but should be in the ballpark

    def test_emd_gradient_ignores_match(self, rng):
        a = jnp.asarray(rng.rand(1, 16, 3).astype(np.float32))
        b = jnp.asarray(rng.rand(1, 16, 3).astype(np.float32))
        g = jax.grad(lambda x: ops.earth_mover_cost(x, b))(a)
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.abs(g).sum()) > 0


class TestInterpolate:
    def test_three_nn(self, rng):
        q = rng.randn(1, 20, 3).astype(np.float32)
        d = rng.randn(1, 30, 3).astype(np.float32)
        dist, idx = ops.three_nn(q, d)
        dist, idx = np.asarray(dist), np.asarray(idx)
        full = np.sum((q[0][:, None] - d[0][None]) ** 2, -1)
        want_idx = np.argsort(full, axis=1)[:, :3]
        np.testing.assert_allclose(
            dist[0], np.take_along_axis(full, want_idx, 1), atol=1e-5
        )

    def test_three_interpolate_gradcheck(self, rng):
        # mirrors ref:tf_ops/interpolation/tf_interpolate_op_test.py
        pts = jnp.asarray(rng.randn(1, 8, 16).astype(np.float32))
        tmp = rng.randn(1, 32, 3).astype(np.float32)
        src = rng.randn(1, 8, 3).astype(np.float32)
        dist, idx = ops.three_nn(jnp.asarray(tmp), jnp.asarray(src))
        from dispu_tpu.ops.interpolate import inverse_distance_weights

        w = inverse_distance_weights(dist)

        def f(p):
            return jnp.sum(jnp.cos(ops.three_interpolate(p, idx, w)))

        g = jax.grad(f)(pts)
        eps, p0 = 1e-2, np.asarray(pts)
        for (ni, ci) in [(0, 0), (4, 7), (7, 15)]:
            pp = p0.copy(); pp[0, ni, ci] += eps
            pm = p0.copy(); pm[0, ni, ci] -= eps
            num = (f(jnp.asarray(pp)) - f(jnp.asarray(pm))) / (2 * eps)
            np.testing.assert_allclose(np.asarray(g)[0, ni, ci], num, atol=1e-2)

    def test_interpolation_exact_at_source(self, rng):
        # querying the dataset points themselves reproduces their features
        xyz = rng.randn(1, 16, 3).astype(np.float32)
        feat = rng.randn(1, 16, 5).astype(np.float32)
        dist, idx = ops.three_nn(jnp.asarray(xyz), jnp.asarray(xyz))
        from dispu_tpu.ops.interpolate import inverse_distance_weights

        w = inverse_distance_weights(dist)
        out = np.asarray(ops.three_interpolate(jnp.asarray(feat), idx, w))
        np.testing.assert_allclose(out, feat, atol=1e-4)
