"""Typed configuration for the framework.

Replaces the reference's single global argparse namespace
(ref:DisPU/configs.py:8-46) and the architecture constants hard-coded
inside ``Generator.__call__`` (ref:DisPU/generator.py:33-44) with explicit
dataclasses.  Defaults reproduce the reference's training setup.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class GeneratorConfig:
    """Architecture of the Dis-PU generator (dense generator + refiner).

    Defaults mirror ref:DisPU/generator.py:33-44 and the constants inside
    the ops it calls.
    """

    up_ratio: int = 4            # r: points out = r * points in
    step_ratio: int = 4          # per-pass ratio; 16x = two chained 4x passes
    num_points: int = 256        # patch size at train time
    dense_block: int = 4         # GCN dense blocks (ref growth path 24→480)
    growth_rate: int = 24        # 'filter'
    dense_n: int = 3             # edge-conv layers per dense block
    knn: int = 16                # K for feature-space edge conv
    refine: bool = True          # enable the spatial refiner
    fine_extractor: bool = False # extra GCN on coarse points (off by default)
    is_off: bool = True          # refiner regresses a bounded offset
    refine_nsample: int = 16     # K for the refiner's xyz kNN
    refine_mlp: Tuple[int, ...] = (128, 128, 256)
    offset_range: float = 0.5    # sigmoid offset range (ref:Common/ops.py:1106-1108)
    use_bn: bool = False
    bn_momentum: float = 0.95    # 'bn_decay'
    use_nonlocal: bool = True    # NL attention cell in refiner
    use_local: bool = True       # local weighted pooling in refiner
    # one-hot MXU feature gathers (bf16-rounded values):
    fast_gather: bool = False           # refiner only — output dev ≤2e-4
    fast_gather_backbone: bool = False  # + backbone — dev ~1e-2, fastest
    # packed-key turbo kNN selection (refiner xyz kNN + backbone feature
    # kNN): near-ties whose distances agree in the top 32−lane_bits bits
    # resolve by lane index — neighbor SETS deviate only on those
    # sub-5e-4-relative ties; exact selection stays the default
    # (see ops.knn.knn / pallas_kernels.knn_pallas 'packed')
    fast_knn: bool = False
    # exact-path neighborhood gather: 'onehot_hp' (one-hot MXU contraction
    # at precision=HIGHEST — bit-identical to the native gather, verified
    # on-chip by bench.parity_guard; 1587→1983 patches/sec inference,
    # 58→53 ms train step at batch 28) or 'gather' (native, memory-bound);
    # used wherever the turbo fast_gather flags are off
    gather_impl: str = "onehot_hp"
    # fused kNN+gather kernel for the refiner's xyz grouping: the
    # selection rounds' knockout masks double as one-hot MXU gather
    # operands, removing the separate wide gather pass.  dists/idx are
    # bit-identical to the composed path; on real hardware the gathered
    # features hold f32 round-off (5.1e-6) but xyz degrades to bf16
    # grade (2.1e-3 — bench.parity_guard bounds both), so this is a
    # TURBO-envelope path.
    # Measured on chip (scripts/profile_r3u.py): the kernel LOSES to the
    # composed path at the (32,4096,c128) refiner shape (67.0 vs
    # 47.8 ms — fitting the 16 MiB VMEM envelope forces tile_m=64) and
    # its turbo mode only ties there (46.3 ms), so it stays opt-in.
    fused_grouping: bool = False
    # refiner local+skip branch evaluation at INFERENCE: 'xla' (composed
    # Dense/einsum chain) or 'fused' — one Pallas kernel per 128-point
    # tile keeping all (b,n,k,·) intermediates in VMEM.  Measured on chip
    # (scripts/profile_r5b.py): the kernel wins 1.15 ms isolated but
    # LOSES end-to-end (30.2 vs 29.2 ms forward b=64 — the opaque
    # boundary forces the 0.56 GB grouped tensor to materialize where
    # XLA otherwise fuses the gather into conv0) and its in-kernel dots
    # run at bf16 grade under Mosaic.  Default stays 'xla'; the kernel
    # ships as a tested option (training/init always use the composed
    # path — no autodiff rule).  'megafused' (round 5) goes further:
    # kNN + gathers + local MLP + skip in ONE kernel with no grouped
    # tensor at all (ops.pallas_kernels.refine_block_pallas — exact
    # selection, turbo-grade bf16 gathers/MLP; inference-only, falls
    # back composed when its gates miss; decision legs in
    # scripts/profile_r5c.py).
    refine_local_impl: str = "xla"
    # backbone DenseEdgeBlock evaluation: 'concat' (the reference's
    # literal dataflow — each conv reads a concatenated (b,n,k,·) tensor)
    # or 'split' (conv distributed over the concat parts; k-independent
    # center terms, no wide edge activations — same math/params, f32 sum
    # order differs ~1e-6; see nn.edgeconv.DenseEdgeBlock).  Default
    # pending the on-chip measurement (scripts/profile_r3t.py).
    dense_impl: str = "concat"

    @property
    def num_out_points(self) -> int:
        return self.num_points * self.up_ratio

    @property
    def num_up_steps(self) -> int:
        # ref:DisPU/generator.py:51 — round(up_ratio ** (1/step_ratio))
        return max(1, round(self.up_ratio ** (1.0 / self.step_ratio)))


@dataclasses.dataclass(frozen=True)
class DiscriminatorConfig:
    """PointNet++-MSG patch critic (ref:DisPU/discriminator.py:20-37)."""

    divide_ratio: int = 2
    knn: bool = True
    downsample_ratio: int = 8    # critic pools to num_point/8 seeds
    radius_list: Tuple[float, ...] = (0.1, 0.2, 0.4)
    # fused kNN+gather kernel for the paired seed neighborhoods (exact,
    # bit-identical to the composed path; knn=True only).  Off until the
    # on-chip measurement lands (scripts/profile_r3r.py).
    fused_grouping: bool = False

    @property
    def nsample_list(self) -> Tuple[int, ...]:
        return (8, 16, 24) if self.knn else (16, 32, 64)

    @property
    def mlp_lists(self) -> Tuple[Tuple[int, ...], ...]:
        d = self.divide_ratio
        return (
            (32 // d, 32 // d, 64 // d),
            (64 // d, 64 // d, 128 // d),
            (64 // d, 96 // d, 128 // d),
        )


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Loss weights/schedules (ref:DisPU/model.py:52-87, configs.py)."""

    coarse_cd_w: float = 1000.0
    fine_cd_w: float = 1000.0
    hd_w: float = 100.0          # tracked metric, not in pu_loss
    use_repulsion: bool = True
    repulsion_w: float = 1.0
    repulsion_nsample: int = 20
    repulsion_radius: float = 0.07
    repulsion_h: float = 0.001
    uniform_w: float = 0.0       # reference computes but does not add by default
    fidelity_w: float = 100.0    # configs.py default (unused in default loss)
    gan_w: float = 1.0
    # weight_fine piecewise schedule: epochs [10,20,30] → [0.01,0.1,0.5,1.0]
    weight_fine_boundaries: Tuple[float, ...] = (10.0, 20.0, 30.0)
    weight_fine_values: Tuple[float, ...] = (0.01, 0.1, 0.5, 1.0)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization schedule (ref:DisPU/configs.py:15-40, model.py:158-178)."""

    batch_size: int = 28
    training_epoch: int = 401
    base_lr_g: float = 1e-3
    base_lr_d: float = 1e-4
    # post-update critic weight clip (ref:DisPU/model_gan.py:222-224 clips
    # to ±0.01).  The reference value strangles the 3-scale MSG critic —
    # its outputs collapse to a constant by ~epoch 40 (see
    # tests/test_gan.py::TestDiscriminatorHealth and PERFORMANCE.md's GAN
    # section); 0 disables the clip (documented deviating config with a
    # live adversarial signal).  Default keeps reference parity.
    d_clip: float = 0.01
    # size of the PointPool history buffer of generated clouds the critic
    # trains against (ref:Common/visu_utils.py:309-334 — defined but never
    # used by the reference; 0 = off, reference behavior).  When > 0 the
    # GAN step queries the host-side pool mid-step via io_callback
    # (single-device path only).
    fake_pool_size: int = 0
    beta1: float = 0.9
    lr_decay: bool = True
    decay_step_epochs: int = 30
    lr_decay_rate: float = 0.7
    lr_clip: float = 1e-6
    epoch_per_save: int = 20
    steps_per_print: int = 50
    visualize: bool = False      # 'visulize' flag, ref:configs.py:36
    steps_per_visu: int = 100
    profile: bool = False        # jax.profiler trace of the first epoch
    backup_sources: bool = True  # self-copy sources to log_dir (ref:model.py:56-65)
    gen_update: int = 2          # configs.py default (GAN G steps per D step)
    seed: int = 0
    # TPU-specific
    donate_state: bool = True
    compute_dtype: str = "float32"  # or "bfloat16" for the NN compute path
    # rematerialize the generator forward in the backward pass — trades
    # recompute FLOPs for activation HBM; only worth switching on when a
    # large batch spills (b=28 measures slower with it)
    remat: bool = False
    # keep the whole patch set resident in HBM and ship only batch indices
    # per step (the PU-GAN set is ~100 MB; per-step host uploads otherwise
    # serialize the loop, badly so through a remote-dispatch tunnel)
    device_data: bool = True
    device_data_max_bytes: int = 2_000_000_000
    # run steps_per_print steps per dispatch (lax.scan inside one jit with
    # on-device index slicing / RNG / metric accumulation).  Per-step
    # dispatch overhead otherwise ~doubles wall time on a remote-dispatch
    # link (measured 82 ms wall vs 40.6 ms compute at b=28, round 2).
    # Applies whenever the dataset is device-resident, mesh path included
    # (sharding constraints inside the scan; equivalence pinned by
    # tests/test_train.py::test_chunked_mesh_matches_single_device).
    # Scalars/renders fire once per cadence boundary like the stepwise
    # loop (at the boundary step itself when epoch length is a multiple
    # of the chunk; otherwise at the enclosing chunk's final step); with
    # --visulize on, the chunk aligns down to
    # gcd(steps_per_print, steps_per_visu) so render boundaries land on
    # chunk ends (see BaseTrainer._epoch_chunked).
    scan_steps: bool = True


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Dataset/augmentation (ref:DisPU/dataset.py, configs.py:11-20)."""

    data_dir: str = "data"
    num_point: int = 256
    up_ratio: int = 4
    random_input: bool = True    # nonuniform re-sample input from gt
    # per-example probability of drawing the training input as seed
    # clusters (seeds' cluster_size nearest gt points) instead of the
    # Gaussian-biased nonuniform draw — mimics the grouped local
    # structure of a pass-1 generator output so the chained 16× pass
    # sees in-distribution inputs (data/augment.sample_cluster_inputs;
    # VERDICT r4 weak #2).  0.0 = reference training distribution.
    cluster_prob: float = 0.0
    cluster_size: int = 4
    augment: bool = True
    jitter: bool = False
    jitter_sigma: float = 0.01
    jitter_max: float = 0.03
    scale_low: float = 0.8
    scale_high: float = 1.2

    @property
    def h5_path(self) -> str:
        import os

        return os.path.join(
            self.data_dir,
            "PUGAN_poisson_%d_poisson_%d.h5"
            % (self.num_point, self.num_point * self.up_ratio),
        )


@dataclasses.dataclass(frozen=True)
class InferenceConfig:
    """Whole-cloud patch inference (ref:DisPU/model.py:306-381)."""

    final_ratio: int = 4         # 4 or 16
    step_ratio: int = 4
    patch_num_point: int = 256
    patch_num_ratio: int = 3     # seeds = N / patch_size * ratio
    patch_batch: int = 32        # patches evaluated per device step (TPU win)
    # final-merge FPS (ref:DisPU/model.py:375-376): 'exact' (default —
    # reference semantics, m sequential rounds) or 'bucketed' — Morton-
    # partitioned parallel FPS (ops.sampling.farthest_point_sample_bucketed):
    # ~n_buckets× less work and sequential depth, exact FPS within each
    # bucket but equal-count allocation across buckets (documented
    # approximation; quality deltas measured in PERFORMANCE.md)
    merge_fps: str = "exact"
    merge_fps_buckets: int = 64
    # how the bucketed mode ranks points into Morton order: 'argsort'
    # (bits=10 XLA sort) or 'radix' (bits=4 sort-free counting rank,
    # ops.sampling.morton_rank; reorders only within 16³ morton cells).
    # Ignored when merge_fps='exact'.  Measured on-chip
    # (scripts/profile_r3s.py): the XLA sort costs 1.7 ms at the 16×
    # merge scale — NOT the ~12 ms the round-3 session attributed to it —
    # and the counting rank is slower (6.4 ms; bucketed FPS e2e 9.1 ms
    # argsort vs 14.9 ms radix at K=64), so 'argsort' stays the default
    # and 'radix' exists as a tested alternative only.
    merge_fps_rank: str = "argsort"
    # NN-compute dtype for the generator forward at inference ('float32'
    # or 'bfloat16').  Geometry (xyz, kNN selection, merge FPS) always
    # stays f32 regardless — only the conv/attention stacks cast.  Part
    # of the turbo serving surface; exact f32 stays the default.
    compute_dtype: str = "float32"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for SPMD training (no analog in the reference,
    which is single-GPU — see SURVEY.md §2.3)."""

    data_axis: str = "data"
    num_devices: int = 0         # 0 = all available


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    generator: GeneratorConfig = GeneratorConfig()
    discriminator: DiscriminatorConfig = DiscriminatorConfig()
    loss: LossConfig = LossConfig()
    train: TrainConfig = TrainConfig()
    data: DataConfig = DataConfig()
    inference: InferenceConfig = InferenceConfig()
    mesh: MeshConfig = MeshConfig()
    use_gan: bool = False
    log_dir: str = "log"
