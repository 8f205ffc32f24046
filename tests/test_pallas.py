"""Pallas kernel correctness (interpreter mode on CPU) vs jnp reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dispu_tpu.ops.chamfer import nn_distance
from dispu_tpu.ops.pallas_kernels import fps_pallas, nn_distance_chunked
from dispu_tpu.ops.sampling import farthest_point_sample


class TestFPSPallas:
    @pytest.mark.parametrize("n,npoint", [(100, 16), (128, 32), (300, 64)])
    def test_matches_xla_fps(self, rng, n, npoint):
        xyz = rng.randn(2, n, 3).astype(np.float32)
        want = np.asarray(farthest_point_sample(npoint, jnp.asarray(xyz)))
        got = np.asarray(fps_pallas(npoint, jnp.asarray(xyz), interpret=True))
        np.testing.assert_array_equal(got, want)

    def test_padding_never_selected(self, rng):
        # n = 130 pads to 256; padded lanes must never appear in the output
        xyz = rng.randn(1, 130, 3).astype(np.float32)
        got = np.asarray(fps_pallas(64, jnp.asarray(xyz), interpret=True))
        assert got.max() < 130
        assert got[0, 0] == 0
        assert len(set(got[0].tolist())) == 64  # all distinct


class TestFPSLitePallas:
    @pytest.mark.parametrize(
        "n,npoint", [(100, 16), (128, 32), (300, 64), (1500, 200)]
    )
    def test_matches_xla_fps(self, rng, n, npoint):
        from dispu_tpu.ops.pallas_kernels import fps_pallas_lite
        from dispu_tpu.ops.sampling import _fps_xla

        xyz = rng.randn(2, n, 3).astype(np.float32)
        want = np.asarray(_fps_xla(npoint, jnp.asarray(xyz)))
        got = np.asarray(
            fps_pallas_lite(npoint, jnp.asarray(xyz), interpret=True)
        )
        np.testing.assert_array_equal(got, want)

    def test_tie_order_with_duplicates(self, rng):
        """Equal-distance ties must resolve first-occurrence; the lite
        form drops the per-round valid re-mask and extracts coordinates
        via a dynamic row slice, neither of which may change selection."""
        from dispu_tpu.ops.pallas_kernels import fps_pallas_lite
        from dispu_tpu.ops.sampling import _fps_xla

        base = rng.randn(64, 3).astype(np.float32)
        xyz = np.tile(base, (20, 1))[None]  # (1, 1280, 3) with duplicates
        want = np.asarray(_fps_xla(96, jnp.asarray(xyz)))
        got = np.asarray(
            fps_pallas_lite(96, jnp.asarray(xyz), interpret=True)
        )
        np.testing.assert_array_equal(got, want)

    def test_padding_and_row_boundary(self, rng):
        """n = 1030 pads to 2048 (nr 256): padded slots never selected;
        npoint 300 > 128 exercises the dynamic-sublane output rows."""
        from dispu_tpu.ops.pallas_kernels import fps_pallas_lite
        from dispu_tpu.ops.sampling import _fps_xla

        xyz = rng.randn(1, 1030, 3).astype(np.float32)
        want = np.asarray(_fps_xla(300, jnp.asarray(xyz)))
        got = np.asarray(
            fps_pallas_lite(300, jnp.asarray(xyz), interpret=True)
        )
        np.testing.assert_array_equal(got, want)
        assert got.max() < 1030


class TestFPSChunkedPallas:
    @pytest.mark.parametrize(
        "n,npoint", [(100, 16), (1024, 128), (1500, 200), (2300, 150)]
    )
    def test_matches_xla_fps(self, rng, n, npoint):
        from dispu_tpu.ops.pallas_kernels import fps_pallas_chunked
        from dispu_tpu.ops.sampling import _fps_xla

        xyz = rng.randn(2, n, 3).astype(np.float32)
        want = np.asarray(_fps_xla(npoint, jnp.asarray(xyz)))
        got = np.asarray(
            fps_pallas_chunked(npoint, jnp.asarray(xyz), interpret=True)
        )
        np.testing.assert_array_equal(got, want)

    def test_tie_order_with_duplicates(self, rng):
        """Exact-distance ties (duplicated points) must resolve to the
        first-occurrence index, matching jnp.argmax in the XLA loop —
        the running strict-> argmax keeps the earliest chunk and the
        final reduction the minimum flat index."""
        from dispu_tpu.ops.pallas_kernels import fps_pallas_chunked
        from dispu_tpu.ops.sampling import _fps_xla

        base = rng.randn(40, 3).astype(np.float32)
        # tile the same 40 points across 3 chunks' worth of slots
        xyz = np.tile(base, (52, 1))[None]  # (1, 2080, 3) -> nc=3
        want = np.asarray(_fps_xla(64, jnp.asarray(xyz)))
        got = np.asarray(
            fps_pallas_chunked(64, jnp.asarray(xyz), interpret=True)
        )
        np.testing.assert_array_equal(got, want)

    def test_padding_never_selected(self, rng):
        from dispu_tpu.ops.pallas_kernels import fps_pallas_chunked

        # n = 1030 pads to 2048; padded slots must never be selected
        xyz = rng.randn(1, 1030, 3).astype(np.float32)
        got = np.asarray(
            fps_pallas_chunked(256, jnp.asarray(xyz), interpret=True)
        )
        assert got.max() < 1030
        assert got[0, 0] == 0
        assert len(set(got[0].tolist())) == 256


class TestFPSChunkedBatch:
    """Batch-fused chunked FPS (VERDICT r4 item 6): all b clouds advance
    per round; selections per cloud must be bit-identical to the XLA
    loop (and thus to the single-cloud chunked kernel)."""

    @pytest.mark.parametrize("b,n,npoint", [(2, 1024, 128), (3, 1500, 200)])
    def test_matches_xla_fps(self, rng, b, n, npoint):
        from dispu_tpu.ops.pallas_kernels import fps_pallas_chunked_batch
        from dispu_tpu.ops.sampling import _fps_xla

        xyz = rng.randn(b, n, 3).astype(np.float32)
        want = np.asarray(_fps_xla(npoint, jnp.asarray(xyz)))
        got = np.asarray(
            fps_pallas_chunked_batch(npoint, jnp.asarray(xyz),
                                     interpret=True)
        )
        np.testing.assert_array_equal(got, want)

    def test_tie_order_with_duplicates(self, rng):
        from dispu_tpu.ops.pallas_kernels import fps_pallas_chunked_batch
        from dispu_tpu.ops.sampling import _fps_xla

        base = rng.randn(40, 3).astype(np.float32)
        xyz = np.stack([
            np.tile(base, (52, 1)),                   # ties across chunks
            np.tile(rng.randn(40, 3).astype(np.float32), (52, 1)),
        ])  # (2, 2080, 3) -> nc=3
        want = np.asarray(_fps_xla(64, jnp.asarray(xyz)))
        got = np.asarray(
            fps_pallas_chunked_batch(64, jnp.asarray(xyz), interpret=True)
        )
        np.testing.assert_array_equal(got, want)

    def test_padding_never_selected_and_clouds_independent(self, rng):
        from dispu_tpu.ops.pallas_kernels import (
            fps_pallas_chunked,
            fps_pallas_chunked_batch,
        )

        xyz = rng.randn(3, 1030, 3).astype(np.float32)
        got = np.asarray(
            fps_pallas_chunked_batch(256, jnp.asarray(xyz), interpret=True)
        )
        assert got.max() < 1030
        # batch fusion must not couple clouds: each row equals its own
        # single-cloud kernel run
        for v in range(3):
            solo = np.asarray(fps_pallas_chunked(
                256, jnp.asarray(xyz[v: v + 1]), interpret=True
            ))[0]
            np.testing.assert_array_equal(got[v], solo)

    def test_dispatch_gate(self):
        from dispu_tpu.ops.sampling import _fps_chunked_batch_fits

        assert _fps_chunked_batch_fits(237_568, 80_000, 2)
        assert not _fps_chunked_batch_fits(237_568, 80_000, 5)  # b cap
        assert not _fps_chunked_batch_fits(3_000_000, 80_000, 3)  # VMEM


class TestRefineBlockPallas:
    """Mega-fused refiner block (round 5): kNN + gathers + local MLP +
    skip in one kernel, no grouped tensor."""

    def _mods(self, local_impl=None, gather_impl="onehot"):
        from dispu_tpu.nn.refine import PointShuffle2

        kwargs = dict(nsample=8, mlp=(32, 32, 64),
                      gather_impl=gather_impl)
        if local_impl:
            kwargs["local_impl"] = local_impl
        return PointShuffle2(**kwargs)

    def test_module_matches_composed_turbo_gather(self, rng):
        """local_impl='megafused' equals the composed path with the
        bf16-rounded ('onehot') feature gather: exact selection + exact
        xyz, turbo features, identical MLP math (interpret mode)."""
        import jax

        xyz = jnp.asarray(rng.randn(2, 256, 3), jnp.float32)
        feat = jnp.asarray(rng.randn(2, 256, 16), jnp.float32)
        ref = self._mods()
        variables = ref.init(jax.random.PRNGKey(0), xyz, feat, train=False)
        bn = variables["batch_stats"]["weight_net"]["wconv0"]["bn"]
        bn["mean"] = bn["mean"] + 0.05
        bn["var"] = bn["var"] * 1.3
        _, want = ref.apply(variables, xyz, feat, train=False)
        _, got = self._mods("megafused").apply(
            variables, xyz, feat, train=False
        )
        scale = float(jnp.abs(want).max())
        assert float(jnp.abs(got - want).max()) < 1e-5 * max(scale, 1.0)

    def test_unaligned_n_pads(self, rng):
        """n not a multiple of the tile pads internally (m_pad grid)."""
        import jax

        xyz = jnp.asarray(rng.randn(1, 200, 3), jnp.float32)
        feat = jnp.asarray(rng.randn(1, 200, 16), jnp.float32)
        ref = self._mods()
        variables = ref.init(jax.random.PRNGKey(1), xyz, feat, train=False)
        _, want = ref.apply(variables, xyz, feat, train=False)
        _, got = self._mods("megafused").apply(
            variables, xyz, feat, train=False
        )
        assert got.shape == want.shape
        scale = float(jnp.abs(want).max())
        assert float(jnp.abs(got - want).max()) < 1e-5 * max(scale, 1.0)

    def test_train_and_grads_keep_composed_path(self, rng):
        import jax

        from dispu_tpu.nn.refine import PointShuffle2

        xyz = jnp.asarray(rng.randn(1, 128, 3), jnp.float32)
        feat = jnp.asarray(rng.randn(1, 128, 16), jnp.float32)
        mod = PointShuffle2(nsample=8, mlp=(32, 32, 64),
                            gather_impl="gather", local_impl="megafused")
        variables = mod.init(jax.random.PRNGKey(0), xyz, feat, train=False)

        def loss(params):
            (_, out), _ = mod.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                xyz, feat, train=True, mutable=["batch_stats"],
            )
            return jnp.sum(out ** 2)

        g = jax.grad(loss)(variables["params"])
        flat = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(x)).all() for x in flat)
        assert any(float(jnp.abs(x).max()) > 0 for x in flat)


class TestRefineLocalPallas:
    """Fused refiner local+skip branch (VERDICT r4 item 5)."""

    def _params(self, rng, cf=38, c_mid=32, c_out=48, k=8):
        r = lambda *s: rng.randn(*s).astype(np.float32) * 0.2  # noqa: E731
        return dict(
            w0=r(cf, c_mid), b0=r(c_mid), w1=r(c_mid, c_mid), b1=r(c_mid),
            ww=r(3, k), bw=r(k), wsk=r(cf, c_out), bsk=r(c_out),
            waf=r(k, c_mid, c_out), baf=r(c_out),
        )

    @staticmethod
    def _composed(g, p):
        """The XLA path's math on the same (pre-folded) params."""
        relu = lambda x: np.maximum(x, 0.0)  # noqa: E731
        h = relu(relu(g @ p["w0"] + p["b0"]) @ p["w1"] + p["b1"])
        w = relu(g[..., :3] @ p["ww"] + p["bw"])
        pool = np.einsum("bnkt,bnkc->bntc", w, h)
        b, n = g.shape[:2]
        waf2 = p["waf"].reshape(-1, p["waf"].shape[-1])
        after = relu(pool.reshape(b, n, -1) @ waf2 + p["baf"])
        skip = relu(g.max(axis=2) @ p["wsk"] + p["bsk"])
        return after + skip

    def test_matches_composed(self, rng):
        from dispu_tpu.ops.pallas_kernels import refine_local_pallas

        g = rng.randn(2, 256, 8, 38).astype(np.float32)
        p = self._params(rng)
        want = self._composed(g, p)
        got = np.asarray(refine_local_pallas(
            jnp.asarray(g), **{k: jnp.asarray(v) for k, v in p.items()},
            interpret=True,
        ))
        scale = np.abs(want).max()
        assert np.abs(got - want).max() < 1e-5 * max(scale, 1.0)

    def test_rejects_unaligned_n(self, rng):
        from dispu_tpu.ops.pallas_kernels import refine_local_pallas

        g = rng.randn(1, 200, 8, 38).astype(np.float32)
        p = self._params(rng)
        with pytest.raises(ValueError):
            refine_local_pallas(
                jnp.asarray(g),
                **{k: jnp.asarray(v) for k, v in p.items()},
                interpret=True,
            )

    def test_module_flag_equivalence(self, rng):
        """PointShuffle2 local_impl='fused' matches 'xla' on the SAME
        variables at inference (f32 matmul round-off only), including
        the weight-net BN fold."""
        import jax

        from dispu_tpu.nn.refine import PointShuffle2

        xyz = jnp.asarray(rng.randn(2, 128, 3), jnp.float32)
        feat = jnp.asarray(rng.randn(2, 128, 16), jnp.float32)
        kwargs = dict(nsample=8, mlp=(32, 32, 64), gather_impl="gather")
        ref_mod = PointShuffle2(**kwargs)
        variables = ref_mod.init(jax.random.PRNGKey(0), xyz, feat,
                                 train=False)
        # nudge BN stats off init so the fold is actually exercised
        bn = variables["batch_stats"]["weight_net"]["wconv0"]["bn"]
        bn["mean"] = bn["mean"] + 0.1
        bn["var"] = bn["var"] * 1.7
        _, want = ref_mod.apply(variables, xyz, feat, train=False)
        _, got = PointShuffle2(local_impl="fused", **kwargs).apply(
            variables, xyz, feat, train=False
        )
        scale = float(jnp.abs(want).max())
        assert float(jnp.abs(got - want).max()) < 1e-5 * max(scale, 1.0)

    def test_train_keeps_composed_path(self, rng):
        """train=True must not touch the kernel (no autodiff rule): the
        fused-flagged module still produces gradients."""
        import jax

        from dispu_tpu.nn.refine import PointShuffle2

        xyz = jnp.asarray(rng.randn(1, 128, 3), jnp.float32)
        feat = jnp.asarray(rng.randn(1, 128, 16), jnp.float32)
        mod = PointShuffle2(nsample=8, mlp=(32, 32, 64),
                            gather_impl="gather", local_impl="fused")
        variables = mod.init(jax.random.PRNGKey(0), xyz, feat, train=False)

        def loss(params):
            (_, out), _ = mod.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                xyz, feat, train=True, mutable=["batch_stats"],
            )
            return jnp.sum(out ** 2)

        g = jax.grad(loss)(variables["params"])
        flat = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(x)).all() for x in flat)
        assert any(float(jnp.abs(x).max()) > 0 for x in flat)

    def test_npoint_over_row_boundary(self, rng):
        """npoint > 128 exercises the dynamic-sublane output row writes."""
        from dispu_tpu.ops.pallas_kernels import fps_pallas_chunked
        from dispu_tpu.ops.sampling import _fps_xla

        xyz = rng.randn(1, 400, 3).astype(np.float32)
        want = np.asarray(_fps_xla(300, jnp.asarray(xyz)))
        got = np.asarray(
            fps_pallas_chunked(300, jnp.asarray(xyz), interpret=True)
        )
        np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize("width", [256, 512])
    def test_wider_chunks_match_xla(self, rng, width):
        """width > 128 (fewer serialized loop iterations per round) must
        keep selection bit-identical — flats follow the same natural
        point order under the coarser (nc, 8, width) reshape."""
        from dispu_tpu.ops.pallas_kernels import fps_pallas_chunked
        from dispu_tpu.ops.sampling import _fps_xla

        # 3000 pads to 4096 at width 256 and to 4096 at width 512 —
        # multiple chunks at 256, a single chunk at 512
        xyz = rng.randn(2, 3000, 3).astype(np.float32)
        want = np.asarray(_fps_xla(200, jnp.asarray(xyz)))
        got = np.asarray(fps_pallas_chunked(
            200, jnp.asarray(xyz), interpret=True, width=width))
        np.testing.assert_array_equal(got, want)


class TestFPSBucketedPallas:
    @pytest.mark.parametrize("K,nb,mb", [(8, 128, 16), (16, 256, 32)])
    def test_matches_per_bucket_xla_fps(self, rng, K, nb, mb):
        """Each bucket row's selection must be bit-identical to the XLA
        FPS loop run on that bucket alone."""
        from dispu_tpu.ops.pallas_kernels import fps_bucketed_pallas
        from dispu_tpu.ops.sampling import _fps_xla

        buckets = rng.randn(K, nb, 3).astype(np.float32)
        want = np.asarray(_fps_xla(mb, jnp.asarray(buckets)))
        got = np.asarray(
            fps_bucketed_pallas(mb, jnp.asarray(buckets), interpret=True)
        )
        np.testing.assert_array_equal(got, want)

    def test_nonaligned_shapes(self, rng):
        # K and n_b off the (8, 128) tile grid exercise the edge padding
        from dispu_tpu.ops.pallas_kernels import fps_bucketed_pallas
        from dispu_tpu.ops.sampling import _fps_xla

        buckets = rng.randn(5, 130, 3).astype(np.float32)
        want = np.asarray(_fps_xla(12, jnp.asarray(buckets)))
        got = np.asarray(
            fps_bucketed_pallas(12, jnp.asarray(buckets), interpret=True)
        )
        np.testing.assert_array_equal(got, want)


class TestKernelShapeSweep:
    """Randomized shape sweep: every kernel must match its XLA reference
    on arbitrary (non-tile-aligned) shapes — hardens the padding edges
    beyond the hand-picked cases above."""

    def test_knn_and_ball_random_shapes(self):
        from dispu_tpu.ops.grouping import query_ball_point
        from dispu_tpu.ops.knn import knn
        from dispu_tpu.ops.pallas_kernels import knn_pallas, query_ball_pallas

        rng = np.random.RandomState(42)
        for trial in range(8):
            b = int(rng.randint(1, 4))
            n = int(rng.randint(5, 400))
            m = int(rng.randint(3, 300))
            k = int(rng.randint(1, min(n, 40) + 1))
            pts = rng.randn(b, n, 3).astype(np.float32) * 0.5
            qs = rng.randn(b, m, 3).astype(np.float32) * 0.5

            d_x, i_x = knn(k, jnp.asarray(pts), jnp.asarray(qs), impl="xla")
            d_p, i_p = knn_pallas(
                k, jnp.asarray(pts), jnp.asarray(qs), interpret=True
            )
            np.testing.assert_array_equal(
                np.asarray(i_x), np.asarray(i_p),
                err_msg=f"knn idx trial {trial} b={b} n={n} m={m} k={k}",
            )

            ns = int(rng.randint(1, 24))
            r = float(rng.uniform(0.2, 0.8))
            i_x2, c_x = query_ball_point(
                r, ns, jnp.asarray(pts), jnp.asarray(qs), impl="xla"
            )
            i_p2, c_p = query_ball_pallas(
                r, ns, jnp.asarray(pts), jnp.asarray(qs), interpret=True
            )
            np.testing.assert_array_equal(
                np.asarray(i_x2), np.asarray(i_p2),
                err_msg=f"ball idx trial {trial} b={b} n={n} m={m} ns={ns}",
            )
            np.testing.assert_array_equal(np.asarray(c_x), np.asarray(c_p))

    def test_fps_random_shapes(self):
        from dispu_tpu.ops.pallas_kernels import fps_pallas
        from dispu_tpu.ops.sampling import _fps_xla

        rng = np.random.RandomState(43)
        for trial in range(6):
            b = int(rng.randint(1, 3))
            n = int(rng.randint(4, 500))
            m = int(rng.randint(1, n + 1))
            pts = rng.randn(b, n, 3).astype(np.float32)
            want = np.asarray(_fps_xla(m, jnp.asarray(pts)))
            got = np.asarray(fps_pallas(m, jnp.asarray(pts), interpret=True))
            np.testing.assert_array_equal(
                got, want, err_msg=f"fps trial {trial} b={b} n={n} m={m}"
            )


class TestKnnPallas:
    def test_matches_xla_knn(self, rng):
        from dispu_tpu.ops.knn import knn
        from dispu_tpu.ops.pallas_kernels import knn_pallas

        pts = jnp.asarray(rng.randn(2, 300, 3), np.float32)
        q = jnp.asarray(rng.randn(2, 100, 3), np.float32)
        d_ref, i_ref = knn(8, pts, q, impl="xla")
        d_got, i_got = knn_pallas(8, pts, q, interpret=True)
        np.testing.assert_array_equal(np.asarray(i_got), np.asarray(i_ref))
        np.testing.assert_allclose(
            np.asarray(d_got), np.asarray(d_ref), atol=1e-5
        )

    def test_selection_variants_bit_identical(self):
        """'maskout' (min + sentinel knockout), 'walk' (threshold scan)
        and 'unroll' (static SSA knockout chain) must realize the same
        lexicographic (value, lane) order — bit-identical indices AND
        distances, ties, bias and padding included."""
        from dispu_tpu.ops.knn import mask_duplicate_rows
        from dispu_tpu.ops.pallas_kernels import knn_pallas

        rng = np.random.RandomState(7)
        for trial in range(6):
            b = int(rng.randint(1, 3))
            n = int(rng.randint(8, 350))
            m = int(rng.randint(3, 200))
            k = int(rng.randint(1, min(n, 24) + 1))
            c = int(rng.choice([3, 24]))
            # quantized coords force exact distance ties
            pts = np.round(rng.randn(b, n, c) * 2).astype(np.float32) / 2
            qs = np.round(rng.randn(b, m, c) * 2).astype(np.float32) / 2
            bias = None
            if trial % 2:
                bias = mask_duplicate_rows(
                    jnp.asarray(pts)).astype(jnp.float32) * 1e30
            d_w, i_w = knn_pallas(k, jnp.asarray(pts), jnp.asarray(qs),
                                  bias, interpret=True, variant="walk")
            for variant in ("maskout", "unroll"):
                d_m, i_m = knn_pallas(k, jnp.asarray(pts), jnp.asarray(qs),
                                      bias, interpret=True, variant=variant)
                np.testing.assert_array_equal(
                    np.asarray(i_w), np.asarray(i_m),
                    err_msg=(f"idx trial {trial} b={b} n={n} m={m} k={k} "
                             f"c={c} variant={variant}"))
                np.testing.assert_array_equal(
                    np.asarray(d_w), np.asarray(d_m),
                    err_msg=f"dist trial {trial} variant={variant}")

    def test_packed_turbo_variant(self, rng):
        """'packed' (turbo) ranks by (truncated distance bits, lane).

        At THIS size (2×120 queries, k=9, lane_bits=9) no two of this
        seed's distances agree in the kept top bits, so indices equal the
        exact variants' — but that is a property of the instance, not of
        random clouds in general (bench.py's seed at 4×1024×k16/lb=10 has
        22 truncation-tie swaps; its guard asserts the contract instead).
        Distances are the keys truncated to the kept bits (relative error
        ≤ 2^-(23-lane_bits)).  Exact ties (duplicate points) must still
        resolve by lane order like the exact variants."""
        from dispu_tpu.ops.pallas_kernels import knn_pallas

        pts = np.asarray(rng.randn(2, 300, 3), np.float32)
        pts[0, 7] = pts[0, 3]  # exact duplicate → exact distance tie
        qs = np.asarray(rng.randn(2, 120, 3), np.float32)
        d_e, i_e = knn_pallas(9, jnp.asarray(pts), jnp.asarray(qs),
                              interpret=True, variant="maskout")
        d_p, i_p = knn_pallas(9, jnp.asarray(pts), jnp.asarray(qs),
                              interpret=True, variant="packed")
        np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_e))
        # n_pad=384 → lane_bits=9 → rel err ≤ 2^-14; dist truncates down
        d_e, d_p = np.asarray(d_e), np.asarray(d_p)
        assert np.all(d_p <= d_e + 1e-30)
        np.testing.assert_allclose(d_p, d_e, rtol=2.0**-13, atol=1e-6)

    def test_packed_duplicate_bias(self, rng):
        """The knn_unique 1e30 duplicate bias must work under 'packed':
        biased columns all truncate to the same huge high bits, so they
        sort last AND among themselves by lane — exactly the exact
        variants' order (1e30 + d == 1e30 in f32, so they tie there too).
        fast_knn routes edge_feature's knn_unique through this path."""
        from dispu_tpu.ops.knn import mask_duplicate_rows
        from dispu_tpu.ops.pallas_kernels import knn_pallas

        pts = np.asarray(rng.randn(2, 40, 3), np.float32)
        pts[0, 5] = pts[0, 2]   # duplicates to push to the end
        pts[1, 9] = pts[1, 1]
        pts[0, 11] = pts[0, 2]  # a triple
        bias = mask_duplicate_rows(jnp.asarray(pts)).astype(jnp.float32) * 1e30
        # k > distinct count in no trial here; k reaches into the biased
        # tail so the biased ordering itself is exercised
        d_e, i_e = knn_pallas(39, jnp.asarray(pts), jnp.asarray(pts),
                              bias, interpret=True, variant="maskout")
        d_p, i_p = knn_pallas(39, jnp.asarray(pts), jnp.asarray(pts),
                              bias, interpret=True, variant="packed")
        np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_e))

    def test_unique_bias_excludes_duplicates(self, rng):
        from dispu_tpu.ops.knn import mask_duplicate_rows
        from dispu_tpu.ops.pallas_kernels import knn_pallas

        pts = rng.randn(1, 50, 3).astype(np.float32)
        pts[:, 1] = pts[:, 0]
        bias = mask_duplicate_rows(jnp.asarray(pts)).astype(jnp.float32) * 1e30
        _, idx = knn_pallas(
            5, jnp.asarray(pts), jnp.asarray(pts), bias, interpret=True
        )
        assert 1 not in np.asarray(idx)[0, 0]

    def test_gradients_match_xla_path(self, rng):
        """The custom VJP must reproduce autodiff-of-top_k gradients —
        training on TPU differentiates through the fused kernel."""
        from dispu_tpu.ops.knn import knn
        from dispu_tpu.ops.pallas_kernels import knn_pallas_diff

        pts = jnp.asarray(rng.randn(1, 40, 3), np.float32)
        q = jnp.asarray(rng.randn(1, 20, 3), np.float32)
        zero_bias = jnp.zeros((1, 40), jnp.float32)

        def loss_pallas(p, q_):
            d, _ = knn_pallas_diff(4, p, q_, zero_bias, True)
            return jnp.sum(jnp.sin(d))

        def loss_xla(p, q_):
            d, _ = knn(4, p, q_, impl="xla")
            return jnp.sum(jnp.sin(d))

        gp_p, gq_p = jax.grad(loss_pallas, argnums=(0, 1))(pts, q)
        gp_x, gq_x = jax.grad(loss_xla, argnums=(0, 1))(pts, q)
        np.testing.assert_allclose(
            np.asarray(gp_p), np.asarray(gp_x), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(gq_p), np.asarray(gq_x), atol=1e-4
        )

    def test_fps_pallas_under_grad_context(self, rng):
        """FPS in a differentiated computation must not break linearization."""
        from dispu_tpu.ops.pallas_kernels import fps_pallas

        pts = jnp.asarray(rng.randn(1, 64, 3), np.float32)

        def f(p):
            idx = fps_pallas(8, p, interpret=True)
            sel = jnp.take_along_axis(p, idx[..., None], axis=1)
            return jnp.sum(sel**2)

        g = jax.grad(f)(pts)
        assert np.isfinite(np.asarray(g)).all()


class TestQueryBallPallas:
    def _parity(self, radius, nsample, pts, q):
        from dispu_tpu.ops.grouping import query_ball_point
        from dispu_tpu.ops.pallas_kernels import query_ball_pallas

        idx_ref, cnt_ref = query_ball_point(radius, nsample, pts, q,
                                            impl="xla")
        idx_got, cnt_got = query_ball_pallas(radius, nsample, pts, q,
                                             interpret=True)
        np.testing.assert_array_equal(np.asarray(idx_got),
                                      np.asarray(idx_ref))
        np.testing.assert_array_equal(np.asarray(cnt_got),
                                      np.asarray(cnt_ref))

    def test_scalar_radius(self, rng):
        pts = jnp.asarray(rng.randn(2, 300, 3), np.float32)
        q = jnp.asarray(rng.randn(2, 100, 3), np.float32)
        self._parity(0.8, 16, pts, q)

    def test_per_batch_radius(self, rng):
        pts = jnp.asarray(rng.randn(3, 200, 3), np.float32)
        q = jnp.asarray(rng.randn(3, 50, 3), np.float32)
        self._parity(jnp.asarray([0.3, 0.8, 2.0], jnp.float32), 8, pts, q)

    def test_empty_and_overfull_balls(self, rng):
        pts = jnp.asarray(rng.randn(2, 128, 3), np.float32)
        q = jnp.asarray(rng.randn(2, 40, 3), np.float32)
        self._parity(1e-4, 8, pts, q)   # nothing in radius → pad 0
        self._parity(100.0, 8, pts, q)  # everything hits → first 8 indices

    def test_nsample_exceeds_cloud(self, rng):
        pts = jnp.asarray(rng.randn(1, 20, 3), np.float32)
        q = jnp.asarray(rng.randn(1, 10, 3), np.float32)
        self._parity(1.5, 32, pts, q)

    def test_with_dists_matches_xla(self, rng):
        from dispu_tpu.ops.grouping import query_ball_point
        from dispu_tpu.ops.pallas_kernels import query_ball_pallas

        pts = jnp.asarray(rng.randn(2, 200, 3), np.float32)
        q = jnp.asarray(rng.randn(2, 60, 3), np.float32)
        for radius in (1e-4, 0.9, 50.0):
            i_r, c_r, d_r = query_ball_point(
                radius, 8, pts, q, impl="xla", return_dists=True)
            i_g, c_g, d_g = query_ball_pallas(
                radius, 8, pts, q, interpret=True, with_dists=True)
            np.testing.assert_array_equal(np.asarray(i_g), np.asarray(i_r))
            np.testing.assert_array_equal(np.asarray(c_g), np.asarray(c_r))
            np.testing.assert_allclose(
                np.asarray(d_g), np.asarray(d_r), atol=1e-6)

    def test_select_smallest_matches_composed_topk(self, rng):
        """In-kernel k-lowest-distance selection must equal the composed
        top_k(-dists, k) + take_along of the padded outputs."""
        from dispu_tpu.ops.grouping import query_ball_point
        from dispu_tpu.ops.pallas_kernels import query_ball_pallas

        for radius, scale in ((0.5, 1.0), (1e-4, 1.0), (50.0, 1.0),
                              (0.5, 0.0)):  # 0.0 → all-identical points
            pts = jnp.asarray(rng.randn(2, 150, 3) * scale, np.float32)
            q = jnp.asarray(rng.randn(2, 60, 3) * scale, np.float32)
            _, _, want = query_ball_point(
                radius, 12, pts, q, impl="xla", select_smallest=5)
            _, _, got = query_ball_pallas(
                radius, 12, pts, q, interpret=True, select_smallest=5)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_select_smallest_small_cloud(self, rng):
        """n < nsample: pad positions must repeat the first hit's distance
        (composed-path semantics), not fall out of the selection."""
        from dispu_tpu.ops.grouping import query_ball_point
        from dispu_tpu.ops.pallas_kernels import query_ball_pallas

        pts = jnp.asarray(rng.randn(2, 3, 3), np.float32)
        q = jnp.asarray(rng.randn(2, 6, 3), np.float32)
        _, _, want = query_ball_point(
            100.0, 20, pts, q, impl="xla", select_smallest=5)
        _, _, got = query_ball_pallas(
            100.0, 20, pts, q, interpret=True, select_smallest=5)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_select_smallest_exceeding_nsample_raises(self, rng):
        from dispu_tpu.ops.grouping import query_ball_point

        pts = jnp.asarray(rng.randn(1, 30, 3), np.float32)
        with pytest.raises(ValueError):
            query_ball_point(0.5, 4, pts, pts, select_smallest=5)

    def test_select_smallest_with_dists_together(self, rng):
        from dispu_tpu.ops.pallas_kernels import query_ball_pallas

        pts = jnp.asarray(rng.randn(1, 90, 3), np.float32)
        outs = query_ball_pallas(
            0.8, 10, pts, pts, interpret=True,
            with_dists=True, select_smallest=4)
        idx, cnt, dists, sel = outs
        assert dists.shape == (1, 90, 10) and sel.shape == (1, 90, 4)
        # both extras must match their composed equivalents
        _, sub = jax.lax.top_k(-dists, 4)
        want = jnp.take_along_axis(idx, sub, axis=-1)
        np.testing.assert_array_equal(np.asarray(sel), np.asarray(want))

    def test_under_grad_context(self, rng):
        """A loss built on pallas ball-query neighborhoods must
        differentiate (pallas_call has no JVP rule; the query stops input
        tangents — indices carry no gradient, as in the CUDA reference)."""
        from dispu_tpu.ops.pallas_kernels import query_ball_pallas

        pts = jnp.asarray(rng.randn(1, 64, 3), np.float32)

        def f(p):
            idx, _ = query_ball_pallas(0.8, 4, p, p, interpret=True)
            grouped = jax.vmap(lambda pp, ii: pp[ii])(p, idx)
            return jnp.sum((grouped - p[:, :, None, :]) ** 2)

        g = jax.grad(f)(pts)
        assert np.isfinite(np.asarray(g)).all()


class TestBf16Terms:
    """The 3-term split behind every exact bf16 one-hot gather.

    It is implemented with integer RNE (bitcast + add + mask) rather
    than the textbook convert round-trip, because XLA under
    --xla_allow_excess_precision=true (forced by the TPU toolchain
    here) may fold convert_f32(convert_bf16(v)) -> v and zero the
    residual terms — observed on chip in round 4, fusion-dependently.
    These tests pin the integer path to the convert semantics bit for
    bit; the on-chip regression net is bench.parity_guard."""

    def test_terms_match_convert_roundtrip_bitwise(self, rng):
        from dispu_tpu.ops.pallas_kernels import _bf16_terms

        # exponent range keeps the second residual's magnitude
        # (~|x|·2^-18) above the f32/bf16 subnormal boundary, where
        # XLA's convert flushes but ml_dtypes does not (the documented
        # normal-f32 contract edge)
        x = np.asarray(
            rng.randn(4096).astype(np.float32)
            * 10.0 ** rng.uniform(-25, 25, 4096).astype(np.float32))
        # numpy oracle: the textbook convert formulation (numpy cannot
        # elide it — no excess-precision rewriter)
        import ml_dtypes
        t1o = x.astype(ml_dtypes.bfloat16)
        r1 = x - t1o.astype(np.float32)
        t2o = r1.astype(ml_dtypes.bfloat16)
        t3o = (r1 - t2o.astype(np.float32)).astype(ml_dtypes.bfloat16)

        t1, t2, t3 = (np.asarray(t) for t in
                      jax.jit(_bf16_terms)(jnp.asarray(x)))
        np.testing.assert_array_equal(t1.view(np.uint16), t1o.view(np.uint16))
        np.testing.assert_array_equal(t2.view(np.uint16), t2o.view(np.uint16))
        np.testing.assert_array_equal(t3.view(np.uint16), t3o.view(np.uint16))

    def test_exact_reconstruction_and_partial_sums(self, rng):
        from dispu_tpu.ops.pallas_kernels import _bf16_terms

        x = np.asarray(rng.randn(2048).astype(np.float32)
                       * 10.0 ** rng.uniform(-20, 20, 2048))
        x = x.astype(np.float32)
        t1, t2, t3 = (np.asarray(t).astype(np.float32) for t in
                      _bf16_terms(jnp.asarray(x)))
        # (t1 + t2) + t3 == x exactly, in this association (the kernels'
        # f32 accumulation order)
        np.testing.assert_array_equal((t1 + t2) + t3, x)
        assert np.abs(t2[x != 0]).max() > 0  # residuals actually carry bits

    def test_nonfinite_pass_through(self):
        from dispu_tpu.ops.pallas_kernels import _bf16_terms

        # NaNs whose payload sits only in the low 16 mantissa bits would
        # be carried to +inf by the biased integer add; rne16 must pass
        # them through (converts keep NaN NaN).
        x = np.concatenate([
            np.array([np.inf, -np.inf, 0.0, -0.0], np.float32),
            np.array([0x7F800001, 0xFF800001, 0x7FC00000],
                     np.uint32).view(np.float32),
        ])
        t1, _, _ = (np.asarray(t) for t in
                    jax.jit(_bf16_terms)(jnp.asarray(x)))
        t1f = t1.astype(np.float32)
        np.testing.assert_array_equal(np.isnan(t1f), np.isnan(x))
        np.testing.assert_array_equal(t1f[:4], x[:4])


class TestGatherRowsPallas:
    def test_bit_identical_to_native_gather(self, rng):
        from dispu_tpu.ops.pallas_kernels import gather_rows_pallas

        tbl = jnp.asarray(rng.randn(3, 300, 37), np.float32)
        idx = jnp.asarray(rng.randint(0, 300, (3, 155)), np.int32)
        ref = jax.vmap(lambda t, i: t[i])(tbl, idx)
        got = gather_rows_pallas(tbl, idx, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_extreme_magnitudes_stay_exact(self, rng):
        """The 3-term bf16 split must reconstruct f32 exactly across the
        normal exponent range (the residuals carry <=8 fresh mantissa bits
        each, so every partial sum is representable)."""
        from dispu_tpu.ops.pallas_kernels import gather_rows_pallas

        vals = (rng.randn(1, 40, 16) *
                10.0 ** rng.uniform(-30, 30, (1, 40, 16)))
        tbl = jnp.asarray(vals, np.float32)
        idx = jnp.asarray(rng.randint(0, 40, (1, 64)), np.int32)
        ref = jax.vmap(lambda t, i: t[i])(tbl, idx)
        got = gather_rows_pallas(tbl, idx, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_turbo_single_pass_matches_xla_onehot(self, rng):
        """exact=False contracts only the leading bf16 term — the in-VMEM
        analog of the XLA 'onehot' turbo gather.  Values must match that
        path bit-for-bit (same bf16 rounding, same f32 accumulation)."""
        from dispu_tpu.ops.pallas_kernels import gather_rows_pallas

        tbl = jnp.asarray(rng.randn(3, 300, 37), np.float32)
        idx = jnp.asarray(rng.randint(0, 300, (3, 155)), np.int32)
        oh = jax.nn.one_hot(idx, 300, dtype=jnp.bfloat16)
        ref = jnp.einsum(
            "bqn,bnc->bqc", oh, tbl.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        got = gather_rows_pallas(tbl, idx, interpret=True, exact=False)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_grad_matches_native_gather(self, rng):
        from dispu_tpu.ops.pallas_kernels import gather_rows_pallas_diff

        tbl = jnp.asarray(rng.randn(2, 60, 9), np.float32)
        idx = jnp.asarray(rng.randint(0, 60, (2, 33)), np.int32)

        def loss_pallas(t):
            return jnp.sum(
                jnp.sin(gather_rows_pallas_diff(t, idx, 512, True)))

        def loss_native(t):
            return jnp.sum(jnp.sin(jax.vmap(lambda tt, i: tt[i])(t, idx)))

        g_p = jax.grad(loss_pallas)(tbl)
        g_n = jax.grad(loss_native)(tbl)
        np.testing.assert_allclose(
            np.asarray(g_p), np.asarray(g_n), atol=1e-6
        )

class TestKnnGroupPallas:
    """Fused kNN + neighborhood gather vs the composed exact path."""

    @pytest.mark.parametrize("n,m,c,k", [(64, 48, 7, 5), (130, 130, 128, 16),
                                         (200, 64, 64, 4)])
    def test_exact_matches_composed_path(self, rng, n, m, c, k):
        from dispu_tpu.ops.pallas_kernels import knn_group_pallas, knn_pallas

        pts = jnp.asarray(rng.randn(2, n, 3), np.float32)
        q = jnp.asarray(rng.randn(2, m, 3), np.float32)
        fe = jnp.asarray(rng.randn(2, n, c), np.float32)

        d, i, gx, gf = knn_group_pallas(k, pts, q, fe, interpret=True)
        d0, i0 = knn_pallas(k, pts, q, interpret=True)
        assert np.array_equal(np.asarray(i), np.asarray(i0))
        assert np.array_equal(np.asarray(d), np.asarray(d0))
        gx0 = jax.vmap(lambda p, ii: p[ii])(pts, i0)
        gf0 = jax.vmap(lambda p, ii: p[ii])(fe, i0)
        # bit-identical gathers: xyz and features (3-term exact bf16)
        assert np.array_equal(np.asarray(gx), np.asarray(gx0))
        assert np.array_equal(np.asarray(gf), np.asarray(gf0))

    def test_turbo_features_match_onehot_semantics(self, rng):
        """exact=False bf16-rounds features exactly like impl='onehot';
        xyz stays bit-exact."""
        from dispu_tpu.ops.pallas_kernels import knn_group_pallas, knn_pallas

        pts = jnp.asarray(rng.randn(2, 100, 3), np.float32)
        q = jnp.asarray(rng.randn(2, 60, 3), np.float32)
        fe = jnp.asarray(rng.randn(2, 100, 33), np.float32)

        _, i, gx, gf = knn_group_pallas(
            5, pts, q, fe, interpret=True, exact=False)
        _, i0 = knn_pallas(5, pts, q, interpret=True)
        assert np.array_equal(np.asarray(i), np.asarray(i0))
        gx0 = jax.vmap(lambda p, ii: p[ii])(pts, i0)
        assert np.array_equal(np.asarray(gx), np.asarray(gx0))
        gf_bf16 = jax.vmap(lambda p, ii: p[ii])(
            fe.astype(jnp.bfloat16).astype(jnp.float32), i0)
        assert np.array_equal(np.asarray(gf), np.asarray(gf_bf16))

    def test_extreme_magnitudes_stay_exact(self, rng):
        """The 3-term decomposition argument must hold across magnitudes
        (same contract as gather_rows_pallas)."""
        from dispu_tpu.ops.pallas_kernels import knn_group_pallas

        fe = jnp.asarray(
            rng.randn(1, 50, 9) * np.exp(rng.uniform(-30, 30, (1, 50, 9))),
            np.float32,
        )
        pts = jnp.asarray(rng.randn(1, 50, 3), np.float32)
        q = jnp.asarray(rng.randn(1, 20, 3), np.float32)
        _, i, _, gf = knn_group_pallas(4, pts, q, fe, interpret=True)
        gf0 = jax.vmap(lambda p, ii: p[ii])(fe, i)
        assert np.array_equal(np.asarray(gf), np.asarray(gf0))

    def test_column_bias_masks_duplicates(self, rng):
        from dispu_tpu.ops.pallas_kernels import knn_group_pallas, knn_pallas

        pts = jnp.asarray(rng.randn(1, 40, 3), np.float32)
        q = jnp.asarray(rng.randn(1, 16, 3), np.float32)
        fe = jnp.asarray(rng.randn(1, 40, 6), np.float32)
        bias = jnp.zeros((1, 40), np.float32).at[:, ::2].set(1e10)

        _, i, _, _ = knn_group_pallas(4, pts, q, fe, bias, interpret=True)
        _, i0 = knn_pallas(4, pts, q, bias, interpret=True)
        assert np.array_equal(np.asarray(i), np.asarray(i0))
        assert (np.asarray(i) % 2 == 1).all()  # biased columns sort last

    @staticmethod
    def _check_loop_contract(outs_u, outs_l, pts, fe, exact,
                             rel=3e-6):
        """The loop form's contract vs the unrolled form (the two never
        compete at one production shape — see knn_group_pallas's
        `select` doc): distances within ~1 ulp (its VMEM-lean distance
        layout evaluates the same quantity in a different order, and
        cross-program bit-identity is not compiler-stable), idx equal
        except where the unrolled distances tie within that ulp, and
        gathered rows BIT-EXACT for the loop's OWN indices (interpret
        mode; the gather matmul operands are exact one-hots)."""
        d_u, i_u, gx_u, gf_u = (np.asarray(o) for o in outs_u)
        d_l, i_l, gx_l, gf_l = (np.asarray(o) for o in outs_l)
        scale = np.abs(d_u).max()
        assert np.max(np.abs(d_u - d_l)) <= rel * scale
        mism = i_u != i_l
        if mism.any():
            # every index swap must be a near-tie of the distances
            assert np.abs(d_u[mism] - d_l[mism]).max() <= rel * scale
        # self-consistency: gathers reproduce the table rows of i_l
        pts_n, fe_n = np.asarray(pts), np.asarray(fe)
        for b in range(i_l.shape[0]):
            assert np.array_equal(gx_l[b], pts_n[b][i_l[b]])
            if exact:
                assert np.array_equal(gf_l[b], fe_n[b][i_l[b]])
            else:
                t1 = np.asarray(jnp.asarray(fe_n[b]).astype(
                    jnp.bfloat16).astype(jnp.float32))
                assert np.array_equal(gf_l[b], t1[i_l[b]])

    @pytest.mark.parametrize("n,m,c,k,exact,drop_first", [
        (300, 100, 37, 8, True, False),
        (2304, 64, 128, 16, True, True),   # n > 2048: auto picks 'loop'
        (150, 150, 5, 4, False, False),
    ])
    def test_loop_select_contract(self, rng, n, m, c, k, exact,
                                  drop_first):
        """The fused fori_loop selection+gather body (the large-n
        formulation that breaks the round-3 n<=2048 VMEM wall) must
        satisfy the documented near-exact contract vs the unrolled
        form (idx/gathers exact modulo ulp-level distance ties)."""
        from dispu_tpu.ops.pallas_kernels import knn_group_pallas

        pts = jnp.asarray(rng.randn(2, n, 3), np.float32)
        q = jnp.asarray(rng.randn(2, m, 3), np.float32)
        fe = jnp.asarray(rng.randn(2, n, c), np.float32)
        outs_u = knn_group_pallas(k, pts, q, fe, interpret=True,
                                  exact=exact, drop_first=drop_first,
                                  select="unroll")
        outs_l = knn_group_pallas(k, pts, q, fe, interpret=True,
                                  exact=exact, drop_first=drop_first,
                                  select="loop")
        self._check_loop_contract(outs_u, outs_l, pts, fe, exact)

    def test_loop_select_with_column_bias(self, rng):
        """Biased (duplicate-masked) columns must sort last in the loop
        form exactly as in the unrolled form."""
        from dispu_tpu.ops.pallas_kernels import knn_group_pallas

        pts = jnp.asarray(rng.randn(1, 40, 3), np.float32)
        q = jnp.asarray(rng.randn(1, 16, 3), np.float32)
        fe = jnp.asarray(rng.randn(1, 40, 6), np.float32)
        bias = jnp.zeros((1, 40), np.float32).at[:, ::2].set(1e10)
        outs_u = knn_group_pallas(4, pts, q, fe, bias, interpret=True,
                                  select="unroll")
        outs_l = knn_group_pallas(4, pts, q, fe, bias, interpret=True,
                                  select="loop")
        self._check_loop_contract(outs_u, outs_l, pts, fe, True)
        assert (np.asarray(outs_l[1]) % 2 == 1).all()  # biased sort last

    def test_loop_select_exact_envelope_error(self, rng):
        """The exact loop form raises above the calibrated VMEM table
        envelope (n_pad*cf > 4096*128) instead of OOMing at compile."""
        from dispu_tpu.ops.pallas_kernels import knn_group_pallas

        pts = jnp.asarray(rng.randn(1, 4096, 3), np.float32)
        q = jnp.asarray(rng.randn(1, 8, 3), np.float32)
        fe = jnp.asarray(rng.randn(1, 4096, 131), np.float32)
        with pytest.raises(ValueError, match="VMEM envelope"):
            knn_group_pallas(16, pts, q, fe, interpret=True,
                             select="loop")

    def test_grad_matches_composed_autodiff(self, rng):
        """The custom VJP must equal autodiff of the composed
        top_k + gather path — the refiner trains through this op."""
        from dispu_tpu.ops.knn import knn
        from dispu_tpu.ops.pallas_kernels import knn_group_pallas_diff

        pts = jnp.asarray(rng.randn(1, 40, 3), np.float32)
        q = jnp.asarray(rng.randn(1, 20, 3), np.float32)
        fe = jnp.asarray(rng.randn(1, 40, 8), np.float32)

        def loss_fused(p, q_, f):
            d, _, gx, gf = knn_group_pallas_diff(4, p, q_, f, None, True)
            return (jnp.sum(jnp.sin(d)) + jnp.sum(gx * gx)
                    + jnp.sum(jnp.cos(gf)))

        def loss_composed(p, q_, f):
            d, i = knn(4, p, q_, impl="xla")
            gx = jax.vmap(lambda t, ii: t[ii])(p, jax.lax.stop_gradient(i))
            gf = jax.vmap(lambda t, ii: t[ii])(f, jax.lax.stop_gradient(i))
            return (jnp.sum(jnp.sin(d)) + jnp.sum(gx * gx)
                    + jnp.sum(jnp.cos(gf)))

        g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(pts, q, fe)
        g_c = jax.grad(loss_composed, argnums=(0, 1, 2))(pts, q, fe)
        for a, b in zip(g_f, g_c):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4)

    def test_drop_first_matches_knn_unique_composition(self, rng):
        """drop_first=True ≡ knn_unique(k+1)[:, :, 1:] + gather — the
        edge-conv neighborhood build (ref:Common/ops.py:1856-1877)."""
        from dispu_tpu.ops.knn import knn_unique, mask_duplicate_rows
        from dispu_tpu.ops.pallas_kernels import knn_group_pallas

        fe = jnp.asarray(rng.randn(2, 90, 48), np.float32)
        # exact duplicate rows to exercise the unique bias
        fe = fe.at[:, 7].set(fe[:, 3]).at[:, 11].set(fe[:, 3])
        dup = mask_duplicate_rows(fe)

        d, i, gx, gf = knn_group_pallas(
            6, fe, fe, fe, dup.astype(jnp.float32) * 1e30,
            interpret=True, with_xyz=False, drop_first=True)
        assert gx is None
        d0, i0 = knn_unique(7, fe, fe, impl="xla")
        assert np.array_equal(np.asarray(i), np.asarray(i0[:, :, 1:]))
        gf0 = jax.vmap(lambda t, ii: t[ii])(fe, i0[:, :, 1:])
        assert np.array_equal(np.asarray(gf), np.asarray(gf0))

    def test_wide_features_exact(self, rng):
        """c > 128 (multi-lane-block tables) stays bit-exact."""
        from dispu_tpu.ops.pallas_kernels import knn_group_pallas

        pts = jnp.asarray(rng.randn(1, 70, 3), np.float32)
        q = jnp.asarray(rng.randn(1, 30, 3), np.float32)
        fe = jnp.asarray(rng.randn(1, 70, 200), np.float32)
        _, i, _, gf = knn_group_pallas(5, pts, q, fe, interpret=True)
        gf0 = jax.vmap(lambda t, ii: t[ii])(fe, i)
        assert np.array_equal(np.asarray(gf), np.asarray(gf0))

    def test_edge_feature_fused_falls_back_off_tpu(self, rng):
        """edge_feature with fused impls must equal the composed path on
        CPU (dispatch falls back) — and with precomputed idx too."""
        from dispu_tpu.nn.edgeconv import edge_feature

        fe = jnp.asarray(rng.randn(2, 80, 24), np.float32)
        e0, i0 = edge_feature(fe, 8, gather_impl="gather")
        e1, i1 = edge_feature(fe, 8, gather_impl="fused")
        assert np.array_equal(np.asarray(i0), np.asarray(i1))
        assert np.array_equal(np.asarray(e0), np.asarray(e1))
        e2, _ = edge_feature(fe, 8, idx=i0, gather_impl="fused")
        assert np.array_equal(np.asarray(e0), np.asarray(e2))

    def test_grouping_fused_falls_back_off_tpu(self, rng):
        """On CPU the 'fused' gather_impl must dispatch to the composed
        exact path (and 'fused_turbo' to the onehot turbo path)."""
        from dispu_tpu.ops.grouping import grouping

        fe = jnp.asarray(rng.randn(2, 50, 16), np.float32)
        xyz = jnp.asarray(rng.randn(2, 50, 3), np.float32)

        gx, gf, i = grouping(fe, 6, xyz, xyz, gather_impl="fused")
        gx0, gf0, i0 = grouping(fe, 6, xyz, xyz, gather_impl="gather")
        assert np.array_equal(np.asarray(i), np.asarray(i0))
        assert np.array_equal(np.asarray(gx), np.asarray(gx0))
        assert np.array_equal(np.asarray(gf), np.asarray(gf0))


class TestAttentionPallas:
    def _ref(self, q, k, v, scale):
        s = jnp.einsum("bqc,bnc->bqn", q, k,
                       precision=jax.lax.Precision.HIGHEST) * scale
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bqn,bnc->bqc", p, v,
                          precision=jax.lax.Precision.HIGHEST)

    @pytest.mark.parametrize("nq,nk,c,cv", [
        (64, 64, 16, 16),       # tiny, fully padded
        (300, 200, 64, 64),     # nq not a tile multiple, nk not x128
        (1024, 1024, 64, 64),   # the pass-1 NL shape (b small)
    ])
    def test_matches_einsum_composition(self, rng, nq, nk, c, cv):
        from dispu_tpu.ops.pallas_kernels import attention_pallas

        q = jnp.asarray(rng.randn(2, nq, c), np.float32)
        k = jnp.asarray(rng.randn(2, nk, c), np.float32)
        v = jnp.asarray(rng.randn(2, nk, cv), np.float32)
        want = np.asarray(self._ref(q, k, v, 0.125))
        got = np.asarray(
            attention_pallas(q, k, v, 0.125, 256, True))
        # interpret mode contracts bf16 operands like the TPU kernel;
        # softmax weights bound the output by max|v|, so absolute
        # tolerance at bf16 epsilon x |v| covers it
        np.testing.assert_allclose(got, want, atol=3e-2, rtol=1e-2)

    def test_padded_keys_get_zero_weight(self, rng):
        """nk=200 pads to 256: padded key columns must be masked to -inf
        before the softmax, not contribute exp(0) weight."""
        from dispu_tpu.ops.pallas_kernels import attention_pallas

        q = jnp.asarray(rng.randn(1, 64, 32), np.float32)
        k = jnp.asarray(rng.randn(1, 200, 32), np.float32)
        # all-equal values: any weight leakage to padded (zero) values
        # would pull the output below 1
        v = jnp.ones((1, 200, 8), np.float32)
        got = np.asarray(attention_pallas(q, k, v, 0.1, 256, True))
        # bf16 p@V rounding leaves ~3e-4 wiggle; leakage of the 56 padded
        # exp(0) columns would drag the output toward ~0.7
        np.testing.assert_allclose(got, 1.0, atol=2e-3)

    def test_grad_matches_einsum_composition(self, rng):
        from dispu_tpu.ops.pallas_kernels import attention_pallas_diff

        q = jnp.asarray(rng.randn(1, 96, 16), np.float32)
        k = jnp.asarray(rng.randn(1, 80, 16), np.float32)
        v = jnp.asarray(rng.randn(1, 80, 16), np.float32)

        def loss_p(q, k, v):
            return jnp.sum(
                jnp.sin(attention_pallas_diff(q, k, v, 0.25, 256, True)))

        def loss_x(q, k, v):
            return jnp.sum(jnp.sin(self._ref(q, k, v, 0.25)))

        gp = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
        gx = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gp, gx):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-2, rtol=5e-2)

    def test_nl_cell_dispatch_matches_xla_path(self, rng):
        """PointNonLocalCell with attn_impl='pallas' (interpret on CPU)
        must agree with the einsum path on the same params."""
        from dispu_tpu.nn.attention import PointNonLocalCell

        feature = jnp.asarray(rng.randn(2, 128, 32), np.float32)
        new_point = jnp.asarray(rng.randn(2, 1, 128, 32), np.float32)
        cells = {
            impl: PointNonLocalCell(bottleneck=32, out_features=64,
                                    attn_impl=impl)
            for impl in ("xla", "pallas")
        }
        vs = cells["xla"].init(jax.random.PRNGKey(0), feature, new_point)
        outs = {
            impl: np.asarray(cell.apply(vs, feature, new_point))
            for impl, cell in cells.items()
        }
        np.testing.assert_allclose(
            outs["pallas"], outs["xla"], atol=3e-2, rtol=1e-2)


class TestGatherRowsPallasDispatch:
    def test_group_point_pallas_impl_falls_back_off_tpu(self, rng):
        """impl='pallas' must route to the exact native gather on CPU."""
        from dispu_tpu.ops.grouping import group_point

        pts = jnp.asarray(rng.randn(2, 50, 7), np.float32)
        idx = jnp.asarray(rng.randint(0, 50, (2, 20, 4)), np.int32)
        ref = group_point(pts, idx)
        got = group_point(pts, idx, impl="pallas")
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


class TestChunkedNN:
    def test_matches_dense(self, rng):
        a = rng.randn(2, 300, 3).astype(np.float32)
        b = rng.randn(2, 200, 3).astype(np.float32)
        want = nn_distance(jnp.asarray(a), jnp.asarray(b))
        got = nn_distance_chunked(jnp.asarray(a), jnp.asarray(b), chunk=128)
        for w, g in zip(want, got):
            np.testing.assert_allclose(
                np.asarray(w), np.asarray(g), atol=1e-5
            )


class TestChamferViaKnnKernel:
    def test_k1_selection_matches_argmin(self, rng):
        """nn_distance's TPU path picks the nearest neighbor with the
        fused kNN kernel at k=1; index selection must equal the XLA
        argmin (first occurrence) on the same expansion distances."""
        from dispu_tpu.ops.geometry import pairwise_sq_dist
        from dispu_tpu.ops.pallas_kernels import knn_pallas

        a = jnp.asarray(rng.randn(3, 100, 3), np.float32)
        b = jnp.asarray(rng.randn(3, 140, 3), np.float32)
        d = pairwise_sq_dist(a, b)
        idx_ref = jnp.argmin(d, axis=-1).astype(np.int32)
        _, idx_k = knn_pallas(1, b, a, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(idx_k[..., 0]), np.asarray(idx_ref))

        # tie-heavy: duplicated dataset points
        b2 = jnp.concatenate([b[:, :70], b[:, :70]], axis=1)
        d2 = pairwise_sq_dist(a, b2)
        idx_ref2 = jnp.argmin(d2, axis=-1).astype(np.int32)
        _, idx_k2 = knn_pallas(1, b2, a, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(idx_k2[..., 0]), np.asarray(idx_ref2))
