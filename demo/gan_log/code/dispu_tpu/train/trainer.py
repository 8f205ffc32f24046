"""The experiment driver: training loop, checkpointing, logging.

Replaces ref:DisPU/model.py (the Model class: build graph + train loop +
saver) with a functional loop over the jitted train step.  One epoch is
``len(dataset) // batch_size`` full batches (the reference dropped batch 0
and the tail, ref:DisPU/model.py:239 + dataset.py:113-119 — fixed here).

``BaseTrainer`` carries everything the two experiment drivers share —
device-resident batching, crash checkpointing, source backup, profiler,
periodic visualization, metric meters, best-CD checkpoint schedule — and
the CD-only :class:`Trainer` and the GAN driver
(:class:`~dispu_tpu.train.gan_trainer.GANTrainer`) plug in their state
factory, step function, and log line.
"""

from __future__ import annotations

import math
import os
import time
from typing import Optional, Sequence

import jax
import numpy as np

from dispu_tpu.config import ExperimentConfig
from dispu_tpu.data.dataset import PatchDataset
from dispu_tpu.parallel.mesh import make_mesh, shard_batch
from dispu_tpu.train.state import create_generator_state
from dispu_tpu.train.steps import make_train_step
from dispu_tpu.utils.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from dispu_tpu.utils.logging import (
    MetricsLogger,
    StepTimer,
    backup_sources,
    dump_args,
    maybe_profile,
)
from dispu_tpu.utils.meters import AverageMeter


def jnp_asarray(x):
    import jax.numpy as jnp

    return jnp.asarray(np.asarray(x))


class BaseTrainer:
    """Shared experiment-driver machinery (see module docstring)."""

    #: metric keys averaged into the per-epoch log line
    epoch_metric_keys: Sequence[str] = ()

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
        self.train_step = self._make_step()
        self.logger = MetricsLogger(cfg.log_dir)
        self._eval_step = None  # built lazily for visualization
        dump_args(cfg.log_dir, cfg)
        if cfg.train.backup_sources:
            backup_sources(cfg.log_dir)

    # ------------------------------------------------------------- hooks

    def _make_step(self):
        raise NotImplementedError

    def _make_state(self):
        raise NotImplementedError

    def _gen_variables(self, state):
        """The generator's inference variables (for visualization)."""
        raise NotImplementedError

    def _format_epoch(self, epoch: int, meters, minutes: float) -> str:
        raise NotImplementedError

    @staticmethod
    def _state_step(state) -> int:
        return int(jax.device_get(state.step))

    # ------------------------------------------------------------ shared

    def init_state(self, restore: bool = False):
        state = self._make_state()
        start_epoch = 0
        if restore:
            epoch, path = latest_checkpoint(self.cfg.log_dir)
            if path is not None:
                state = restore_checkpoint(path, state)
                start_epoch = epoch
        return state, start_epoch

    def train(self, restore: bool = False, epochs: Optional[int] = None):
        """Run the training loop; on interrupt/crash a resume checkpoint is
        written (the reference's only recovery story was --restore from the
        last scheduled save, ref:DisPU/model.py:188-194)."""
        cfg = self.cfg
        state, start_epoch = self.init_state(restore)
        try:
            return self._train_loop(state, start_epoch, epochs)
        except (KeyboardInterrupt, Exception):
            try:
                last = getattr(self, "_last_state", state)
                epoch = int(jax.device_get(last.epoch))
                save_checkpoint(cfg.log_dir, last, epoch)
                self.logger.text(f"crash checkpoint saved at epoch {epoch}")
            except Exception:
                pass
            raise

    def _batches(self, batch_size: int):
        """Yield (gt, inputs, radius) device batches.

        ``inputs`` is the curated sparse patch column (h5 ``poisson_256``)
        when ``random_input=False`` — the reference's non-random mode feeds
        those, not a slice of gt (ref:DisPU/dataset.py:120-130) — and
        ``None`` in random mode, where the step re-samples the input from
        gt on device.

        With ``device_data`` the whole patch set lives in HBM and each step
        ships only a batch-index array — per-step host→device tensor
        uploads otherwise serialize the loop (severely so over a
        remote-dispatch tunnel: ~0.6 s per 0.4 MB batch vs ~60 ms compute).
        """
        import jax.numpy as jnp

        cfg = self.cfg
        random_input = cfg.data.random_input
        nbytes = self.dataset.gt.nbytes
        if cfg.train.device_data and nbytes <= cfg.train.device_data_max_bytes:
            if getattr(self, "_gt_dev", None) is None:
                self._gt_dev = jnp.asarray(self.dataset.gt)
                self._radius_dev = jnp.asarray(self.dataset.radius)
                self._inputs_dev = (
                    None if random_input else jnp.asarray(self.dataset.inputs)
                )
            for idx in self.dataset.epoch_indices(batch_size):
                idx = jnp.asarray(idx)
                inputs = (
                    None if random_input else self._inputs_dev[idx]
                )
                yield self._gt_dev[idx], inputs, self._radius_dev[idx]
        else:
            for gt, inputs, radius in self.dataset.epoch(batch_size):
                yield gt, (None if random_input else inputs), radius

    def _visualize(self, state, gt, radius, step: int, epoch: int,
                   inputs=None):
        """Periodic 3-view renders of input/coarse/fine/gt.

        Parity: ref:DisPU/model.py:265-292 (image summary every
        steps_per_print, matplotlib plot every steps_per_visu when enabled).
        """
        from dispu_tpu.data.augment import sample_nonuniform_inputs
        from dispu_tpu.train.steps import make_eval_step
        from dispu_tpu.utils.visu import plot_pcd_three_views, point_cloud_three_views

        if self._eval_step is None:
            self._eval_step = make_eval_step(self.cfg)
        if inputs is None:  # random mode: re-sample like the step does
            key = jax.random.PRNGKey(step)
            inputs = sample_nonuniform_inputs(
                key, jnp_asarray(gt), self.cfg.generator.num_points
            )
        coarse, fine, _ = self._eval_step(
            self._gen_variables(state), inputs, jnp_asarray(gt),
            jnp_asarray(radius)
        )
        pcds = [
            np.asarray(inputs[0]),
            np.asarray(coarse[0]),
            np.asarray(fine[0]),
            np.asarray(gt[0]),
        ]
        titles = ["input_x", "coarse", "fine", "gt"]
        if self.logger._tb is not None:
            img = np.concatenate(
                [point_cloud_three_views(p, canvas_size=250) for p in pcds],
                axis=0,
            )
            self.logger._tb.add_image(
                "Upsampling", img[None], step, dataformats="CHW"
            )
        plots = os.path.join(self.cfg.log_dir, "plots")
        os.makedirs(plots, exist_ok=True)
        plot_pcd_three_views(
            os.path.join(plots, f"epoch_{epoch}_step_{step}.png"), pcds, titles
        )

    def _train_loop(
        self, state, start_epoch: int, epochs: Optional[int] = None
    ):
        cfg = self.cfg
        self._last_state = state
        total_epochs = epochs if epochs is not None else cfg.train.training_epoch
        key = jax.random.PRNGKey(cfg.train.seed + 1)
        best_fine_cd = math.inf
        timer = StepTimer()
        step = self._state_step(state)

        for epoch_i in range(start_epoch, total_epochs):
            # metric sums accumulate on device so the step loop never blocks
            # on a host fetch (the reference fetched 6 scalars per sess.run,
            # ref:DisPU/model.py:252-255); one fetch per epoch + the
            # periodic steps_per_print scalars.
            metric_sums = None
            n_metric = 0
            t0 = time.time()
            profile_this = cfg.train.profile and epoch_i == start_epoch
            with maybe_profile(cfg.log_dir, profile_this):
                for gt, inputs, radius in self._batches(cfg.train.batch_size):
                    key, sub = jax.random.split(key)
                    if self.mesh is not None:
                        if inputs is None:
                            gt, radius = shard_batch(self.mesh, gt, radius)
                        else:
                            gt, inputs, radius = shard_batch(
                                self.mesh, gt, inputs, radius
                            )
                    if inputs is None:
                        state, metrics = self.train_step(
                            state, gt, radius, sub
                        )
                    else:
                        state, metrics = self.train_step(
                            state, gt, inputs, radius, sub
                        )
                    self._last_state = state
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
                    if (
                        cfg.train.visualize
                        and step % cfg.train.steps_per_visu == 0
                    ):
                        self._visualize(
                            state, gt, radius, step, epoch_i, inputs=inputs
                        )
            meters = {k: AverageMeter() for k in self.epoch_metric_keys}
            if metric_sums is not None:
                host_sums = jax.device_get(metric_sums)
                for k in meters:
                    if k in host_sums:
                        meters[k].update(float(host_sums[k]) / n_metric)

            state = state.next_epoch()
            self._last_state = state
            epoch = epoch_i + 1
            dur = time.time() - t0
            self.logger.text(self._format_epoch(epoch, meters, dur / 60.0))
            # save on schedule when fine-CD improved (ref:DisPU/model.py:224-227)
            if epoch % cfg.train.epoch_per_save == 0 and (
                meters["fine_cd"].avg < best_fine_cd
            ):
                best_fine_cd = meters["fine_cd"].avg
                save_checkpoint(cfg.log_dir, state, epoch)

        return state


class Trainer(BaseTrainer):
    """CD-path experiment driver (parity: ref:DisPU/model.py)."""

    epoch_metric_keys = (
        "total", "coarse_cd", "fine_cd", "coarse_hd", "fine_hd", "offset_mean"
    )

    def _make_step(self):
        return make_train_step(self.cfg, mesh=self.mesh)

    def _make_state(self):
        return create_generator_state(
            jax.random.PRNGKey(self.cfg.train.seed),
            self.cfg.generator,
            self.cfg.train,
        )

    def _gen_variables(self, state):
        return state.variables()

    def _format_epoch(self, epoch, meters, minutes):
        return (
            "epoch %04d g_loss=%.9f coarse_cd=%.9f coarse_hd=%.9f "
            "fine_cd=%.9f fine_hd=%.9f offset=%.6f time=%.4f"
            % (
                epoch,
                meters["total"].avg,
                meters["coarse_cd"].avg,
                meters["coarse_hd"].avg,
                meters["fine_cd"].avg,
                meters["fine_hd"].avg,
                meters["offset_mean"].avg,
                minutes,
            )
        )
