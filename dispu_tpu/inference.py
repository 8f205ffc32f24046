"""Whole-cloud upsampling via batched patch pipeline.

Parity: ref:DisPU/model.py:306-381 — FPS seeds (3× oversampled), kNN
patches of 256 points, per-patch normalization, generator, un-normalize,
merge, final FPS down to N·ratio.

TPU redesign: the reference ran ONE patch per ``sess.run`` with sklearn
KD-tree patch extraction on host (ref:DisPU/model.py:331,306-313).  Here
patch extraction (FPS + kNN) runs on device, patches are processed in
*batches* through one jitted generator call, and 16× runs the generator
twice inside the same jit (ref:DisPU/model.py:116-118 chains passes).
Patch counts are padded to a multiple of the batch so every shape is
static; one compile per distinct input size.
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp
import numpy as np

from dispu_tpu.config import GeneratorConfig, InferenceConfig
from dispu_tpu.models.generator import DisPUGenerator
from dispu_tpu.ops.geometry import normalize_point_cloud
from dispu_tpu.ops.knn import knn
from dispu_tpu.ops.sampling import farthest_point_sample


def plan_counts(n: int, inf_cfg: InferenceConfig):
    """(seed_num, out_num) for an ``n``-point input cloud.

    The single source of the patch-coverage formula
    (ref:DisPU/model.py:318-321 — seeds = n / patch_size · oversample
    ratio); shared by live inference and the AOT export (serving.py) so
    the two can never diverge.
    """
    seed_num = max(
        int(n / inf_cfg.patch_num_point * inf_cfg.patch_num_ratio), 1
    )
    return seed_num, n * inf_cfg.final_ratio


class PatchUpsampler:
    """Upsample arbitrary clouds with a trained generator."""

    def __init__(
        self,
        variables,
        gen_cfg: GeneratorConfig = GeneratorConfig(),
        inf_cfg: InferenceConfig = InferenceConfig(),
        mesh=None,
        mesh_fused: bool = False,
    ):
        """mesh_fused: with a mesh, run the SPMD single-jit pipeline — the
        whole cloud in ONE dispatch with the patch chunks sharded over the
        mesh's ``data`` axis (a sharding constraint inside the chunk loop;
        XLA partitions the generator batch dim and inserts the collectives)
        — instead of the staged per-chunk dispatch path.  This is also the
        form the AOT export serializes for multi-device serving."""
        self.variables = variables
        self.gen_cfg = gen_cfg
        self.inf_cfg = inf_cfg
        self.model = DisPUGenerator(
            cfg=gen_cfg, dtype=jnp.dtype(inf_cfg.compute_dtype)
        )
        self.mesh = mesh
        self.mesh_fused = mesh_fused and mesh is not None
        self._chunk_sharding = None
        if self.mesh_fused:
            from dispu_tpu.parallel.mesh import batch_sharding

            self._chunk_sharding = batch_sharding(mesh)
        # number of chained 4x passes: 4 -> 1, 16 -> 2
        self.num_passes = max(
            1, round(math.log(inf_cfg.final_ratio, inf_cfg.step_ratio))
        )
        self._upsample_batch = jax.jit(self._upsample_batch_impl)
        self._prepare = jax.jit(
            self._prepare_impl, static_argnames=("seed_num",)
        )
        self._merge = jax.jit(self._merge_impl, static_argnames=("out_num",))
        # single-device path: the whole pipeline in ONE jit — each separate
        # dispatch costs ~1.6 ms through a remote-dispatch tunnel, and the
        # stage-by-stage flow pays 5+ of them per cloud
        self._pipeline = jax.jit(
            self._pipeline_impl,
            static_argnames=("seed_num", "out_num", "bs"),
        )
        self._pipeline_many = jax.jit(
            self._pipeline_many_impl,
            static_argnames=("seed_num", "out_num", "bs"),
        )

    # ---------------------------------------------------------------- stages

    def _prepare_impl(self, pc: jnp.ndarray, seed_num: int):
        """FPS seeds + kNN patch extraction + per-patch normalization."""
        patch_size = self.inf_cfg.patch_num_point
        seeds_idx = farthest_point_sample(seed_num, pc[None])[0]
        seeds = pc[seeds_idx]
        _, idx = knn(patch_size, pc[None], seeds[None])
        patches = pc[idx[0]]  # (seed_num, patch_size, 3)
        patches, centroid, furthest = normalize_point_cloud(patches)
        return patches, centroid, furthest

    def _upsample_batch_impl(self, patches: jnp.ndarray):
        """(b, 256, 3) → (b, 256·final_ratio, 3); chained passes for 16×."""
        pred = patches
        for _ in range(self.num_passes):
            _, pred = self.model.apply(self.variables, pred, train=False)
        return pred

    def _merge_impl(self, all_points: jnp.ndarray, out_num: int):
        if (
            self.inf_cfg.merge_fps == "bucketed"
            and out_num >= self.inf_cfg.merge_fps_buckets
        ):
            from dispu_tpu.ops.sampling import farthest_point_sample_bucketed

            rank = self.inf_cfg.merge_fps_rank
            idx = farthest_point_sample_bucketed(
                out_num, all_points,
                n_buckets=self.inf_cfg.merge_fps_buckets,
                rank_impl=rank, bits=4 if rank == "radix" else 10,
            )
            return all_points[idx]
        idx = farthest_point_sample(out_num, all_points[None])[0]
        return all_points[idx]

    def _chunked_generator(self, patches: jnp.ndarray, bs: int):
        """Pad to a bs multiple, run bs-patch chunks through the
        generator under ``lax.map`` (sharded over the data axis in SPMD
        mode), and un-pad.  Shared by the single-cloud and streaming
        pipelines so the chunking can never diverge between them."""
        count = patches.shape[0]
        pad = (-count) % bs
        if pad:
            filler = jnp.broadcast_to(
                patches[:1], (pad,) + patches.shape[1:]
            )
            patches = jnp.concatenate([patches, filler], axis=0)
        chunks = patches.reshape(-1, bs, *patches.shape[1:])
        body = self._upsample_batch_impl
        if self._chunk_sharding is not None:
            # SPMD: each bs-patch chunk is sharded over the data axis —
            # XLA partitions the generator; prepare/merge stay replicated
            body = lambda ch: self._upsample_batch_impl(  # noqa: E731
                jax.lax.with_sharding_constraint(ch, self._chunk_sharding)
            )
        preds = jax.lax.map(body, chunks)
        return preds.reshape(-1, *preds.shape[2:])[:count]

    def _pipeline_impl(self, pc_n, seed_num: int, out_num: int, bs: int):
        """prepare → chunked generator (lax.map) → un-normalize → merge,
        fused into one XLA program (single-device path)."""
        patches, p_centroid, p_furthest = self._prepare_impl(pc_n, seed_num)
        pred = self._chunked_generator(patches, bs)
        pred = pred * p_furthest + p_centroid
        return self._merge_impl(pred.reshape(-1, 3), out_num)

    def _pipeline_many_impl(self, pcs_n, seed_num: int, out_num: int,
                            bs: int):
        """The streaming pipeline: B same-size clouds in ONE XLA program.

        Patch extraction, the generator, and the merge all run natively
        batched over the cloud axis; crucially the B final-merge FPS
        problems fuse into one batch-advancing kernel
        (``farthest_point_sample(impl='batch')``) whose serial per-round
        argmax chain — ~45% of the 16× exact pipeline and latency-bound
        (PERFORMANCE.md "exact merge-FPS wall") — is paid once for the
        whole batch instead of per cloud.  The reference's analog is
        fully serial per cloud (ref:DisPU/model.py:343-381 loops files).
        """
        B, n, _ = pcs_n.shape
        patch_size = self.inf_cfg.patch_num_point
        seeds_idx = farthest_point_sample(seed_num, pcs_n)     # (B, s)
        seeds = jnp.take_along_axis(pcs_n, seeds_idx[..., None], axis=1)
        _, idx = knn(patch_size, pcs_n, seeds)                 # (B, s, p)
        flat = jnp.take_along_axis(
            pcs_n, idx.reshape(B, seed_num * patch_size)[..., None], axis=1
        )
        patches = flat.reshape(B * seed_num, patch_size, 3)
        patches, p_centroid, p_furthest = normalize_point_cloud(patches)
        pred = self._chunked_generator(patches, bs)
        pred = pred * p_furthest + p_centroid
        merged = pred.reshape(B, -1, 3)
        if (
            self.inf_cfg.merge_fps == "bucketed"
            and out_num >= self.inf_cfg.merge_fps_buckets
        ):
            # honor the configured turbo merge: the bucketed FPS is
            # already parallel per cloud, so run it per cloud inside the
            # same program (no batch kernel exists or is needed for it)
            return jnp.stack([
                self._merge_impl(merged[v], out_num) for v in range(B)
            ])
        midx = farthest_point_sample(out_num, merged, impl="batch")
        return jnp.take_along_axis(merged, midx[..., None], axis=1)

    # ------------------------------------------------------------------- API

    def upsample_many(self, pcs) -> np.ndarray:
        """Streaming batch API: upsample B same-size clouds in one
        dispatch — (B, n, 3) → (B, n·final_ratio, 3).

        Per-cloud outputs are NOT bit-identical to ``upsample`` (the
        merge FPS tie order matches, but patch padding differs and the
        generator sees different batch compositions — f32 reduction
        orders shift at round-off); quality metrics are equal within
        evaluation noise (tests/test_inference.py pins CPU equivalence).
        Single-device path only."""
        if self.mesh is not None and not self.mesh_fused:
            raise ValueError(
                "upsample_many is a single-program path; use the fused "
                "SPMD mode (mesh_fused=True) or per-cloud upsample()"
            )
        pcs = np.asarray(pcs, np.float32)[:, :, :3]
        B, n, _ = pcs.shape
        seed_num, out_num = plan_counts(n, self.inf_cfg)
        pcs_n, centroid, furthest = normalize_point_cloud(jnp.asarray(pcs))
        bs = self.inf_cfg.patch_batch
        if self.mesh_fused:
            n_dev = self.mesh.shape["data"]
            bs = ((bs + n_dev - 1) // n_dev) * n_dev
        out = self._pipeline_many(
            pcs_n, seed_num=seed_num, out_num=out_num, bs=bs
        )
        return np.asarray(out * furthest + centroid)

    def upsample(self, pc: np.ndarray) -> np.ndarray:
        """(n, 3) numpy cloud → (n·final_ratio, 3) upsampled cloud."""
        inf = self.inf_cfg
        pc = np.asarray(pc, np.float32)[:, :3]
        n = pc.shape[0]
        seed_num, out_num = plan_counts(n, inf)

        pc_n, centroid, furthest = normalize_point_cloud(jnp.asarray(pc))

        if self.mesh is None or self.mesh_fused:
            bs = inf.patch_batch
            if self.mesh_fused:
                # chunk size must tile the data axis for even shards
                n_dev = self.mesh.shape["data"]
                bs = ((bs + n_dev - 1) // n_dev) * n_dev
            out = self._pipeline(
                pc_n, seed_num=seed_num, out_num=out_num, bs=bs,
            )
            out = out * furthest[0] + centroid[0]
            return np.asarray(out)

        # mesh path: patch-parallel across devices, staged (patch shards
        # cross devices between the stages, so the pipeline stays split)
        from dispu_tpu.parallel.mesh import shard_batch

        patches, p_centroid, p_furthest = self._prepare(pc_n, seed_num)

        # pad the patch batch to a multiple of the device count so every
        # shard has static shape (SURVEY §2.3's eval sharding)
        n_dev = self.mesh.devices.size
        bs = ((inf.patch_batch + n_dev - 1) // n_dev) * n_dev
        pad = (-seed_num) % bs
        if pad:
            # pad may exceed seed_num (small clouds / large patch_batch):
            # replicate the first patch rather than slicing short
            filler = jnp.broadcast_to(
                patches[:1], (pad,) + patches.shape[1:]
            )
            patches = jnp.concatenate([patches, filler], axis=0)
        preds = []
        for i in range(patches.shape[0] // bs):
            chunk = shard_batch(self.mesh, patches[i * bs : (i + 1) * bs])
            preds.append(self._upsample_batch(chunk))
        pred = jnp.concatenate(
            [jax.device_get(p) for p in preds], axis=0
        )[:seed_num]
        pred = jnp.asarray(pred)

        # un-normalize patches, merge, final FPS
        pred = pred * p_furthest + p_centroid
        merged = pred.reshape(-1, 3)
        out = self._merge(merged, out_num)
        out = out * furthest[0] + centroid[0]
        return np.asarray(out)
