"""GAN experiment driver (parity: ref:DisPU/model_gan.py train loop)."""

from __future__ import annotations

import math
import time
from typing import Optional

import jax

from dispu_tpu.config import ExperimentConfig
from dispu_tpu.data.dataset import PatchDataset
from dispu_tpu.parallel.mesh import make_mesh, shard_batch
from dispu_tpu.train.gan_steps import create_gan_state, make_gan_train_step
from dispu_tpu.utils.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from dispu_tpu.utils.logging import MetricsLogger, StepTimer, dump_args
from dispu_tpu.utils.meters import AverageMeter


class GANTrainer:
    def __init__(
        self,
        cfg: ExperimentConfig,
        dataset: Optional[PatchDataset] = None,
        use_mesh: bool = True,
    ):
        self.cfg = cfg
        self.dataset = dataset or PatchDataset(
            data_dir=cfg.data.data_dir,
            num_point=cfg.data.num_point,
            up_ratio=cfg.data.up_ratio,
            random_input=cfg.data.random_input,
        )
        self.mesh = make_mesh() if (use_mesh and len(jax.devices()) > 1) else None
        self.train_step = make_gan_train_step(cfg, mesh=self.mesh)
        self.logger = MetricsLogger(cfg.log_dir)
        dump_args(cfg.log_dir, cfg)

    def init_state(self, restore: bool = False):
        state = create_gan_state(
            jax.random.PRNGKey(self.cfg.train.seed), self.cfg
        )
        start_epoch = 0
        if restore:
            epoch, path = latest_checkpoint(self.cfg.log_dir)
            if path is not None:
                state = restore_checkpoint(path, state)
                start_epoch = epoch
        return state, start_epoch

    def _batches(self, batch_size: int):
        """Device-resident batching (see Trainer._batches)."""
        import jax.numpy as jnp

        cfg = self.cfg
        nbytes = self.dataset.gt.nbytes
        if cfg.train.device_data and nbytes <= cfg.train.device_data_max_bytes:
            if getattr(self, "_gt_dev", None) is None:
                self._gt_dev = jnp.asarray(self.dataset.gt)
                self._radius_dev = jnp.asarray(self.dataset.radius)
            for idx in self.dataset.epoch_indices(batch_size):
                idx = jnp.asarray(idx)
                yield self._gt_dev[idx], self._radius_dev[idx]
        else:
            for gt, _inputs, radius in self.dataset.epoch(batch_size):
                yield gt, radius

    def train(self, restore: bool = False, epochs: Optional[int] = None):
        cfg = self.cfg
        state, start_epoch = self.init_state(restore)
        total_epochs = epochs if epochs is not None else cfg.train.training_epoch
        key = jax.random.PRNGKey(cfg.train.seed + 1)
        best_fine_cd = math.inf
        timer = StepTimer()
        step = int(state.gen.step)

        for epoch_i in range(start_epoch, total_epochs):
            metric_sums = None
            n_metric = 0
            t0 = time.time()
            for gt, radius in self._batches(cfg.train.batch_size):
                key, sub = jax.random.split(key)
                if self.mesh is not None:
                    gt, radius = shard_batch(self.mesh, gt, radius)
                state, metrics = self.train_step(state, gt, radius, sub)
                step += 1
                timer.tick()
                metric_sums = (
                    metrics
                    if metric_sums is None
                    else jax.tree_util.tree_map(
                        lambda a, b: a + b, metric_sums, metrics
                    )
                )
                n_metric += 1
                if step % cfg.train.steps_per_print == 0:
                    host = {k: float(v) for k, v in metrics.items()}
                    host["steps_per_sec"] = timer.steps_per_sec
                    self.logger.scalars(step, host)
            meters = {
                k: AverageMeter()
                for k in ("total", "fine_cd", "d_loss", "g_gan", "uniform")
            }
            if metric_sums is not None:
                host_sums = jax.device_get(metric_sums)
                for k in meters:
                    if k in host_sums:
                        meters[k].update(float(host_sums[k]) / n_metric)

            state = state.next_epoch()
            epoch = epoch_i + 1
            self.logger.text(
                "epoch %04d g_loss=%.9f fine_cd=%.9f d_loss=%.9f g_gan=%.9f "
                "uniform=%.9f time=%.4f"
                % (
                    epoch,
                    meters["total"].avg,
                    meters["fine_cd"].avg,
                    meters["d_loss"].avg,
                    meters["g_gan"].avg,
                    meters["uniform"].avg,
                    (time.time() - t0) / 60.0,
                )
            )
            if epoch % cfg.train.epoch_per_save == 0 and (
                meters["fine_cd"].avg < best_fine_cd
            ):
                best_fine_cd = meters["fine_cd"].avg
                save_checkpoint(cfg.log_dir, state, epoch)

        return state
