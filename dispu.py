#!/usr/bin/env python
"""CLI entry: train / test the Dis-PU TPU framework.

Parity: ref:dis-pu.py + ref:DisPU/configs.py — same phases and the full
flag surface (ref:configs.py:9-44), including the flags the reference
declares but never reads (`--more_up`, `--jitter`, `--start_decay_step`,
`--lr_decay_steps`, `--gen_update`, and the declared loss weights — each
marked in its help string).  The architecture constants the reference
hard-coded in the model are exposed through the config dataclasses.

Examples:
  python dispu.py --phase train --data_dir data --log_dir log
  python dispu.py --phase train --use_gan true
  python dispu.py --phase test --log_dir log --test_data 'data/test/*.xyz' \
      --final_ratio 4 --out_folder outputs
"""

from __future__ import annotations

import argparse
import logging
import os
from glob import glob


def str2bool(x: str) -> bool:
    return str(x).lower() in ("true", "1", "yes")


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--phase", default="train",
                   choices=["train", "test", "export"])
    p.add_argument("--log_dir", default="log")
    p.add_argument("--data_dir", default="data")
    p.add_argument("--test_data", default="data/test/*.xyz")
    p.add_argument("--out_folder", default=None)
    p.add_argument("--augment", type=str2bool, default=True)
    p.add_argument("--restore", action="store_true")
    p.add_argument("--more_up", type=int, default=0,
                   help="declared by the reference, unused there and here")
    p.add_argument("--training_epoch", type=int, default=401)
    p.add_argument("--batch_size", type=int, default=28)
    p.add_argument("--random", type=str2bool, default=True)
    p.add_argument("--jitter", type=str2bool, default=False,
                   help="declared by the reference, unused there and here "
                        "(jitter applies whenever --augment is on, "
                        "ref:DisPU/dataset.py:132-134)")
    p.add_argument("--jitter_sigma", type=float, default=0.01)
    p.add_argument("--jitter_max", type=float, default=0.03)
    p.add_argument("--cluster_prob", type=float, default=0.0,
                   help="per-example probability of drawing the training "
                        "input as seed clusters (pass-1-output-like local "
                        "structure) instead of the Gaussian-biased "
                        "nonuniform draw; trains the chained 16x pass "
                        "in-distribution.  0 = reference distribution")
    p.add_argument("--cluster_size", type=int, default=4)
    p.add_argument("--up_ratio", type=int, default=4)
    p.add_argument("--final_ratio", type=int, default=4, help="[4,16]")
    p.add_argument("--patch_num_point", type=int, default=256)
    p.add_argument("--patch_num_ratio", type=int, default=3)
    p.add_argument("--base_lr_d", type=float, default=1e-4)
    p.add_argument("--base_lr_g", type=float, default=1e-3)
    p.add_argument("--beta", type=float, default=0.9)
    p.add_argument("--lr_decay", type=str2bool, default=True)
    p.add_argument("--decay_step", type=int, default=30)
    p.add_argument("--start_decay_step", type=int, default=40,
                   help="declared by the reference, unused there and here")
    p.add_argument("--lr_decay_steps", type=int, default=40,
                   help="declared by the reference, unused there and here")
    p.add_argument("--lr_decay_rate", type=float, default=0.7)
    p.add_argument("--lr_clip", type=float, default=1e-6)
    p.add_argument("--steps_per_print", type=int, default=50)
    p.add_argument("--visulize", type=str2bool, default=False,
                   help="periodic 3-view renders (the reference's spelling)")
    p.add_argument("--steps_per_visu", type=int, default=100)
    p.add_argument("--epoch_per_save", type=int, default=20)
    p.add_argument("--use_repulse", type=str2bool, default=True)
    p.add_argument("--repulsion_w", type=float, default=1.0)
    p.add_argument("--fidelity_w", type=float, default=100.0,
                   help="declared by the reference, unused in its default loss")
    p.add_argument("--uniform_w", type=float, default=10.0,
                   help="declared by the reference, unused in its default loss")
    p.add_argument("--gan_w", type=float, default=1.0,
                   help="declared by the reference; its GAN loss adds the "
                        "term unweighted (ref:DisPU/model_gan.py:108-112)")
    p.add_argument("--gen_update", type=int, default=2,
                   help="G steps per D step — declared by the reference "
                        "but never consumed there (ref:DisPU/configs.py:41);"
                        " here it is active in the deviating --d_clip 0 "
                        "config (the critic trains every gen_update-th "
                        "step; 1 = D every step).  Ignored, like the "
                        "reference, when the clip is on")
    p.add_argument("--use_gan", type=str2bool, default=False)
    p.add_argument("--d_clip", type=float, default=0.01,
                   help="critic weight clip (reference: 0.01, which "
                        "collapses D — see PERFORMANCE.md; 0 disables)")
    p.add_argument("--fake_pool_size", type=int, default=0,
                   help="PointPool history buffer of generated clouds for "
                        "the D update (ref:Common/visu_utils.py:309-334, "
                        "unused there; 0 = off)")
    p.add_argument("--patch_batch", type=int, default=32)
    p.add_argument("--stream_batch", type=int, default=1,
                   help="test phase: upsample this many same-size clouds "
                        "per device program (batched patch pipeline + "
                        "batch-fused merge FPS — the serial merge rounds "
                        "are paid once per batch; see PERFORMANCE.md "
                        "round 5).  1 = per-cloud (reference-parity flow)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--synthetic", type=int, default=0,
        help="train on N procedural patches when no h5 dataset is present",
    )
    p.add_argument("--epochs", type=int, default=None,
                   help="override training_epoch (smoke runs)")
    p.add_argument("--export_sizes", type=int, nargs="+", default=None,
                   help="input point counts to compile into the serving "
                        "artifact (--phase export); defaults to the sizes "
                        "of the --test_data files")
    p.add_argument("--compute_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="NN-compute dtype for train steps and inference "
                        "(geometry/selection stay f32; see PERFORMANCE.md)")
    p.add_argument("--compile_cache", default=None, metavar="DIR",
                   help="persistent XLA compilation cache directory — "
                        "restarts skip the 20-40s trace+compile of the "
                        "train/inference programs")
    p.add_argument("--turbo", type=str2bool, default=False,
                   help="test/export phases: the measured-best serving "
                        "flags (bf16 one-hot gathers, packed-key kNN "
                        "selection, fused kNN+gather kernel, part-split "
                        "dense EdgeConv, bucketed merge FPS) — near-"
                        "round-off output deviations, see PERFORMANCE.md "
                        "'Round-3 turbo flags'; ignored for training")
    p.add_argument("--dense_impl", default="concat",
                   choices=["concat", "split"],
                   help="dense EdgeConv evaluation: 'split' distributes "
                        "each conv over the concat parts — same math and "
                        "params, f32 sum-order deviation only, measurably "
                        "faster (any phase)")
    return p.parse_args()


def build_config(args):
    from dispu_tpu.config import (
        DataConfig,
        ExperimentConfig,
        GeneratorConfig,
        InferenceConfig,
        LossConfig,
        TrainConfig,
    )

    turbo = bool(args.turbo) and args.phase in ("test", "export")
    return ExperimentConfig(
        generator=GeneratorConfig(
            up_ratio=args.up_ratio, num_points=args.patch_num_point,
            dense_impl="split" if turbo else args.dense_impl,
            fast_gather=turbo, fast_gather_backbone=turbo,
            fast_knn=turbo, fused_grouping=turbo,
        ),
        loss=LossConfig(
            use_repulsion=args.use_repulse,
            repulsion_w=args.repulsion_w,
            fidelity_w=args.fidelity_w,
            uniform_w=args.uniform_w,
            gan_w=args.gan_w,
        ),
        train=TrainConfig(
            batch_size=args.batch_size,
            training_epoch=args.training_epoch,
            base_lr_g=args.base_lr_g,
            base_lr_d=args.base_lr_d,
            beta1=args.beta,
            lr_decay=args.lr_decay,
            decay_step_epochs=args.decay_step,
            lr_decay_rate=args.lr_decay_rate,
            lr_clip=args.lr_clip,
            epoch_per_save=args.epoch_per_save,
            steps_per_print=args.steps_per_print,
            visualize=args.visulize,
            steps_per_visu=args.steps_per_visu,
            gen_update=args.gen_update,
            d_clip=args.d_clip,
            fake_pool_size=args.fake_pool_size,
            seed=args.seed,
            compute_dtype=args.compute_dtype,
        ),
        data=DataConfig(
            data_dir=args.data_dir,
            num_point=args.patch_num_point,
            up_ratio=args.up_ratio,
            random_input=args.random,
            cluster_prob=args.cluster_prob,
            cluster_size=args.cluster_size,
            augment=args.augment,
            jitter_sigma=args.jitter_sigma,
            jitter_max=args.jitter_max,
        ),
        inference=InferenceConfig(
            final_ratio=args.final_ratio,
            patch_num_point=args.patch_num_point,
            patch_num_ratio=args.patch_num_ratio,
            patch_batch=args.patch_batch,
            compute_dtype=args.compute_dtype,
            merge_fps="bucketed" if turbo else "exact",
        ),
        use_gan=args.use_gan,
        log_dir=args.log_dir,
    )


def run_train(args, cfg):
    dataset = None
    if args.synthetic:
        from dispu_tpu.data.dataset import PatchDataset

        dataset = PatchDataset(
            h5_path=cfg.data.h5_path,
            num_point=cfg.data.num_point,
            up_ratio=cfg.data.up_ratio,
            synthetic_patches_count=args.synthetic,
            seed=args.seed,
        )
    if cfg.use_gan:
        from dispu_tpu.train.gan_trainer import GANTrainer

        GANTrainer(cfg, dataset=dataset).train(
            restore=args.restore, epochs=args.epochs
        )
    else:
        from dispu_tpu.train.trainer import Trainer

        Trainer(cfg, dataset=dataset).train(
            restore=args.restore, epochs=args.epochs
        )


def restore_generator_variables(cfg):
    """Newest checkpoint in the log dir → generator variables dict.

    Parity: ref:DisPU/model.py:344-358 — a GAN-trained log dir restores
    only the generator scope.
    """
    import jax

    from dispu_tpu.train.state import create_generator_state
    from dispu_tpu.utils.checkpoint import latest_checkpoint, restore_checkpoint

    epoch, path = latest_checkpoint(cfg.log_dir)
    if path is None:
        raise SystemExit(f"no checkpoint found in {cfg.log_dir}")
    logging.info("restoring %s (epoch %d)", path, epoch)
    template = create_generator_state(
        jax.random.PRNGKey(0), cfg.generator, cfg.train
    )
    try:
        state = restore_checkpoint(path, template)
    except ValueError:
        # GAN-trained log dir: the checkpoint is a GANState — restore the
        # full template and test with its generator half (the reference's
        # test phase likewise restores only the generator scope from a
        # GAN checkpoint, ref:DisPU/model.py:344-358)
        from dispu_tpu.train.gan_steps import create_gan_state

        gan_template = create_gan_state(jax.random.PRNGKey(0), cfg)
        state = restore_checkpoint(path, gan_template).gen
        logging.info("restored the generator half of a GAN checkpoint")
    return {"params": state.params, "batch_stats": state.batch_stats}


def run_test(args, cfg):
    """Whole-cloud upsampling over the test glob.

    Parity: ref:DisPU/model.py:343-381 — restore newest checkpoint, per
    file: load, normalize, patch-predict, merge, FPS, save '<name>_X{r}.xyz'.
    """
    from dispu_tpu.evaluation.meshio import read_xyz, write_xyz
    from dispu_tpu.inference import PatchUpsampler

    variables = restore_generator_variables(cfg)
    out_folder = args.out_folder or os.path.join(cfg.log_dir, "outputs")
    os.makedirs(out_folder, exist_ok=True)
    upsampler = PatchUpsampler(
        variables,
        gen_cfg=cfg.generator,
        inf_cfg=cfg.inference,
    )
    def write_out(name, out):
        out_path = os.path.join(
            out_folder, f"{name}_X{cfg.inference.final_ratio}.xyz"
        )
        write_xyz(out_path, out)
        logging.info("wrote %s (%d points)", out_path, len(out))

    files = sorted(glob(args.test_data))
    if args.stream_batch > 1:
        # group same-size clouds and run each group through the batched
        # streaming pipeline (one program per stream_batch clouds)
        import numpy as np

        by_size = {}
        for point_path in files:
            pc = read_xyz(point_path)[:, :3]
            by_size.setdefault(len(pc), []).append(
                (os.path.basename(point_path)[:-4], pc)
            )
        for size, items in sorted(by_size.items()):
            for i in range(0, len(items), args.stream_batch):
                chunk = items[i : i + args.stream_batch]
                if len(chunk) == 1:
                    write_out(chunk[0][0], upsampler.upsample(chunk[0][1]))
                    continue
                logging.info("streaming %d clouds of %d points",
                             len(chunk), size)
                outs = upsampler.upsample_many(
                    np.stack([pc for _, pc in chunk])
                )
                for (name, _), out in zip(chunk, outs):
                    write_out(name, out)
        return
    for point_path in files:
        logging.info("%s", point_path)
        pc = read_xyz(point_path)[:, :3]
        write_out(os.path.basename(point_path)[:-4], upsampler.upsample(pc))


def run_export(args, cfg):
    """Package the trained upsampler as an AOT serving artifact.

    No reference analog (it ships the training repo to serve); see
    dispu_tpu/serving.py.  Entry sizes come from --export_sizes or the
    point counts of the --test_data files.
    """
    from dispu_tpu.evaluation.meshio import read_xyz
    from dispu_tpu.serving import export_upsampler

    sizes = args.export_sizes
    if not sizes:
        sizes = sorted(
            {len(read_xyz(p)) for p in glob(args.test_data)}
        )
    if not sizes:
        raise SystemExit(
            "no input sizes: pass --export_sizes or a --test_data glob"
        )
    variables = restore_generator_variables(cfg)
    out = args.out_folder or os.path.join(cfg.log_dir, "export")
    manifest = export_upsampler(
        variables, sizes=sizes, path=out,
        gen_cfg=cfg.generator, inf_cfg=cfg.inference,
    )
    logging.info(
        "exported %d entries (%s) to %s",
        len(manifest["entries"]), sizes, out,
    )


def enable_compile_cache(path: str):
    """Persistent XLA compilation cache (no reference analog — TF1
    re-traced the graph every process).  Compiled executables are keyed
    by program + compiler version and reloaded on restart."""
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything, including fast compiles — the tunnel round-trip
    # and trace time dominate for small programs anyway
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def main():
    logging.basicConfig(level=logging.INFO)
    args = parse_args()
    if args.compile_cache:
        enable_compile_cache(args.compile_cache)
    cfg = build_config(args)
    if args.phase == "train":
        run_train(args, cfg)
    elif args.phase == "export":
        run_export(args, cfg)
    else:
        run_test(args, cfg)


if __name__ == "__main__":
    main()
