"""Whole-cloud inference pipeline tests (incl. mesh-sharded patches)."""

import jax
import numpy as np
import pytest

from dispu_tpu.config import GeneratorConfig, InferenceConfig, TrainConfig
from dispu_tpu.inference import PatchUpsampler
from dispu_tpu.parallel.mesh import make_mesh
from dispu_tpu.train.state import create_generator_state

GEN = GeneratorConfig(num_points=64, knn=8, refine_nsample=8)


@pytest.fixture(scope="module")
def variables():
    state = create_generator_state(jax.random.PRNGKey(0), GEN, TrainConfig())
    return {"params": state.params, "batch_stats": state.batch_stats}


class TestPatchUpsampler:
    def test_4x_shapes_and_finiteness(self, rng, variables):
        up = PatchUpsampler(
            variables, gen_cfg=GEN,
            inf_cfg=InferenceConfig(final_ratio=4, patch_num_point=64,
                                    patch_batch=8),
        )
        pc = rng.randn(500, 3).astype(np.float32)
        out = up.upsample(pc)
        assert out.shape == (2000, 3)
        assert np.isfinite(out).all()

    def test_patch_batch_larger_than_seed_count(self, rng, variables):
        # regression: pad > seed_num previously under-padded and produced
        # zero batches (hit on Icosahedron with patch_batch=64)
        up = PatchUpsampler(
            variables, gen_cfg=GEN,
            inf_cfg=InferenceConfig(final_ratio=4, patch_num_point=64,
                                    patch_batch=32),
        )
        pc = rng.randn(150, 3).astype(np.float32)  # 7 seeds < batch 32
        out = up.upsample(pc)
        assert out.shape == (600, 3)
        assert np.isfinite(out).all()

    def test_bucketed_merge_rank_impls_route(self, rng, variables):
        """merge_fps='bucketed' routes merge_fps_rank through the
        bucketed FPS: both rank impls produce a valid full-size output,
        and (same seed cloud) they differ only by the documented
        within-cell reordering — identical shapes, same bounding zone."""
        pc = rng.randn(500, 3).astype(np.float32)
        outs = []
        for rank in ("argsort", "radix"):
            up = PatchUpsampler(
                variables, gen_cfg=GEN,
                inf_cfg=InferenceConfig(
                    final_ratio=4, patch_num_point=64, patch_batch=8,
                    merge_fps="bucketed", merge_fps_buckets=16,
                    merge_fps_rank=rank),
            )
            out = up.upsample(pc)
            assert out.shape == (2000, 3)
            assert np.isfinite(out).all()
            outs.append(out)
        # both selections draw from the same merged candidate set
        assert abs(np.abs(outs[0]).max() - np.abs(outs[1]).max()) < 1.0

    def test_output_covers_input_region(self, rng, variables):
        # upsampled cloud must stay in the (normalized) input's bounding zone
        up = PatchUpsampler(
            variables, gen_cfg=GEN,
            inf_cfg=InferenceConfig(final_ratio=4, patch_num_point=64,
                                    patch_batch=8),
        )
        pc = rng.randn(300, 3).astype(np.float32)
        out = up.upsample(pc)
        in_r = np.abs(pc).max()
        assert np.abs(out).max() < in_r * 2.5

    def test_bf16_compute_dtype(self, rng, variables):
        """InferenceConfig.compute_dtype='bfloat16' must run the whole
        pipeline with bf16 NN compute (f32 geometry) and stay close to
        the f32 path — same shapes, bounded deviation."""
        inf32 = InferenceConfig(final_ratio=4, patch_num_point=64,
                                patch_batch=8)
        import dataclasses

        inf16 = dataclasses.replace(inf32, compute_dtype="bfloat16")
        pc = rng.randn(300, 3).astype(np.float32)
        out32 = PatchUpsampler(variables, gen_cfg=GEN,
                               inf_cfg=inf32).upsample(pc)
        out16 = PatchUpsampler(variables, gen_cfg=GEN,
                               inf_cfg=inf16).upsample(pc)
        assert out16.shape == out32.shape
        assert out16.dtype == np.float32
        assert np.isfinite(out16).all()
        # the merge FPS selects different points once upstream values
        # shift, so pointwise comparison is meaningless — compare as
        # SETS: symmetric mean NN distance small vs the cloud scale
        d = np.linalg.norm(out16[:, None] - out32[None], axis=-1)
        cd = 0.5 * (d.min(1).mean() + d.min(0).mean())
        assert cd < 0.05 * np.abs(out32).max(), cd

    def test_mesh_fused_matches_unsharded(self, rng, variables):
        """The SPMD single-jit pipeline (mesh_fused: chunk sharding
        constraints inside one dispatch) must reproduce the single-device
        fused pipeline exactly — same program, sharding only."""
        pc = rng.randn(400, 3).astype(np.float32)
        inf = InferenceConfig(final_ratio=4, patch_num_point=64,
                              patch_batch=8)
        single = PatchUpsampler(variables, gen_cfg=GEN, inf_cfg=inf)
        fused = PatchUpsampler(variables, gen_cfg=GEN, inf_cfg=inf,
                               mesh=make_mesh(), mesh_fused=True)
        a = single.upsample(pc)
        b = fused.upsample(pc)
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)

    def test_mesh_sharded_matches_unsharded(self, rng, variables):
        pc = rng.randn(400, 3).astype(np.float32)
        up1 = PatchUpsampler(
            variables, gen_cfg=GEN,
            inf_cfg=InferenceConfig(final_ratio=4, patch_num_point=64,
                                    patch_batch=8),
        )
        out1 = up1.upsample(pc)
        mesh = make_mesh()
        up2 = PatchUpsampler(
            variables, gen_cfg=GEN,
            inf_cfg=InferenceConfig(final_ratio=4, patch_num_point=64,
                                    patch_batch=8),
            mesh=mesh,
        )
        out2 = up2.upsample(pc)
        assert out2.shape == out1.shape
        np.testing.assert_allclose(out1, out2, atol=1e-4)


class TestUpsampleMany:
    """Streaming batch API (VERDICT r4 item 6): B same-size clouds in one
    program with a batch-fused merge."""

    def test_shapes_and_quality_vs_single(self, rng, variables):
        up = PatchUpsampler(
            variables, gen_cfg=GEN,
            inf_cfg=InferenceConfig(final_ratio=4, patch_num_point=64,
                                    patch_batch=8),
        )
        pcs = rng.randn(2, 300, 3).astype(np.float32)
        out = up.upsample_many(pcs)
        assert out.shape == (2, 1200, 3)
        assert np.isfinite(out).all()
        # not bit-equal to per-cloud upsample (batch composition changes
        # f32 reduction orders), but geometrically equivalent: every
        # batched output point lies near the single-path output set
        for v in range(2):
            solo = up.upsample(pcs[v])
            d = np.linalg.norm(
                out[v][:, None] - solo[None], axis=-1
            ).min(axis=1)
            assert d.max() < 0.15, d.max()

    def test_16x_two_pass(self, rng, variables):
        up = PatchUpsampler(
            variables, gen_cfg=GEN,
            inf_cfg=InferenceConfig(final_ratio=16, patch_num_point=64,
                                    patch_batch=8),
        )
        pcs = rng.randn(3, 200, 3).astype(np.float32)
        out = up.upsample_many(pcs)
        assert out.shape == (3, 3200, 3)
        assert np.isfinite(out).all()

    def test_staged_mesh_path_rejected(self, rng, variables):
        mesh = make_mesh()
        up = PatchUpsampler(
            variables, gen_cfg=GEN,
            inf_cfg=InferenceConfig(final_ratio=4, patch_num_point=64),
            mesh=mesh, mesh_fused=False,
        )
        with pytest.raises(ValueError):
            up.upsample_many(rng.randn(2, 200, 3).astype(np.float32))

    def test_mesh_fused_many(self, rng, variables):
        mesh = make_mesh()
        up = PatchUpsampler(
            variables, gen_cfg=GEN,
            inf_cfg=InferenceConfig(final_ratio=4, patch_num_point=64,
                                    patch_batch=8),
            mesh=mesh, mesh_fused=True,
        )
        pcs = rng.randn(2, 300, 3).astype(np.float32)
        out = up.upsample_many(pcs)
        assert out.shape == (2, 1200, 3)
        assert np.isfinite(out).all()


class TestDegenerateInputs:
    """Identical/near-identical points must not produce NaNs anywhere in
    the pipeline (zero pairwise distances exercise the clamped distance
    expansion, duplicate masking, and the normalization guards)."""

    def test_identical_points_forward_finite(self, variables):
        from dispu_tpu.models.generator import DisPUGenerator
        import jax.numpy as jnp

        model = DisPUGenerator(cfg=GEN)
        x = jnp.ones((2, 64, 3), jnp.float32)
        c, f = model.apply(variables, x, train=False)
        assert bool(jnp.isfinite(c).all() and jnp.isfinite(f).all())

    def test_degenerate_cloud_upsamples_finite(self, variables):
        up = PatchUpsampler(
            variables, gen_cfg=GEN,
            inf_cfg=InferenceConfig(patch_num_point=64),
        )
        out = up.upsample(np.ones((500, 3), np.float32))
        assert out.shape == (2000, 3)
        assert np.isfinite(out).all()


def test_fused_pipeline_matches_staged(variables, rng):
    """The one-jit pipeline must reproduce the stage-by-stage flow."""
    import jax.numpy as jnp

    up = PatchUpsampler(
        variables, gen_cfg=GEN,
        inf_cfg=InferenceConfig(patch_num_point=64, patch_batch=4),
    )
    pc = rng.randn(300, 3).astype(np.float32)
    fused = up.upsample(pc)

    # staged reference composition (what the mesh path runs)
    from dispu_tpu.ops.geometry import normalize_point_cloud
    pc_n, centroid, furthest = normalize_point_cloud(jnp.asarray(pc))
    seed_num = max(int(300 / 64 * 3), 1)
    patches, p_c, p_f = up._prepare(pc_n, seed_num=seed_num)
    pad = (-seed_num) % 4
    if pad:
        patches = jnp.concatenate(
            [patches, jnp.broadcast_to(patches[:1],
                                       (pad,) + patches.shape[1:])], 0)
    preds = [up._upsample_batch(patches[i * 4:(i + 1) * 4])
             for i in range(patches.shape[0] // 4)]
    pred = jnp.concatenate(preds, 0)[:seed_num] * p_f + p_c
    staged = up._merge(pred.reshape(-1, 3), out_num=1200)
    staged = np.asarray(staged * furthest[0] + centroid[0])

    assert fused.shape == staged.shape == (1200, 3)
    np.testing.assert_allclose(fused, staged, atol=1e-5)
