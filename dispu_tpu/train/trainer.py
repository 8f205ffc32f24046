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

    def _make_raw_step(self):
        """The untraced step function (for the chunked scan loop)."""
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
        if self._device_data_active():
            self._ensure_device_data()
            for idx in self.dataset.epoch_indices(batch_size):
                idx = jnp.asarray(idx)
                inputs = (
                    None if random_input else self._inputs_dev[idx]
                )
                yield self._gt_dev[idx], inputs, self._radius_dev[idx]
        else:
            for gt, inputs, radius in self.dataset.epoch(batch_size):
                yield gt, (None if random_input else inputs), radius

    def _device_data_active(self) -> bool:
        cfg = self.cfg
        return (
            cfg.train.device_data
            and self.dataset.gt.nbytes <= cfg.train.device_data_max_bytes
        )

    def _ensure_device_data(self):
        import jax.numpy as jnp

        if getattr(self, "_gt_dev", None) is None:
            self._gt_dev = jnp.asarray(self.dataset.gt)
            self._radius_dev = jnp.asarray(self.dataset.radius)
            self._inputs_dev = (
                None
                if self.cfg.data.random_input
                else jnp.asarray(self.dataset.inputs)
            )

    def _scan_eligible(self) -> bool:
        """Chunked-scan training: steps_per_print steps per dispatch.

        Requires device-resident data.  On a mesh, the per-step batch
        shardings become with_sharding_constraint annotations inside the
        chunk (see _make_chunk_fn); off-mesh the chunk is a plain jit.
        """
        return self.cfg.train.scan_steps and self._device_data_active()

    def _make_chunk_fn(self, cs: int):
        """jit( scan of ``cs`` raw steps ): (state, idx (cs, bs), key) →
        (state, on-device metric sums, last step's metrics).  Index
        slicing, per-step RNG, and metric accumulation all happen on
        device — one dispatch and one scalar fetch per ``cs`` steps
        instead of ~5 dispatches per step.

        Mesh path: the gathered batch is constrained to the ``data``
        axis inside the chunk and the state stays replicated — XLA
        shards each step and inserts the gradient psum exactly as in the
        per-step sharded jit (equivalence pinned by
        tests/test_train.py::test_chunked_mesh_matches_single_device).
        """
        import jax.numpy as jnp

        raw = self._make_raw_step()
        gt_dev = self._gt_dev
        radius_dev = self._radius_dev
        inputs_dev = self._inputs_dev
        mesh = self.mesh
        if mesh is not None:
            from dispu_tpu.parallel.mesh import (
                batch_sharding,
                replicated_sharding,
            )

            data_sh = batch_sharding(mesh)
            repl = replicated_sharding(mesh)

        def constrain(x):
            if mesh is None:
                return x
            return jax.lax.with_sharding_constraint(x, data_sh)

        def chunk(state, idx_chunk, key):
            def body(s, xs):
                i, idx = xs
                sub = jax.random.fold_in(key, i)
                gt = constrain(gt_dev[idx])
                radius = constrain(radius_dev[idx])
                if inputs_dev is None:
                    s2, metrics = raw(s, gt, radius, sub)
                else:
                    s2, metrics = raw(
                        s, gt, constrain(inputs_dev[idx]), radius, sub
                    )
                return s2, metrics

            state, ms = jax.lax.scan(
                body, state, (jnp.arange(cs), idx_chunk)
            )
            sums = jax.tree_util.tree_map(lambda a: jnp.sum(a, axis=0), ms)
            last = jax.tree_util.tree_map(lambda a: a[-1], ms)
            return state, sums, last

        if mesh is None:
            return jax.jit(chunk, donate_argnums=(0,))
        return jax.jit(
            chunk,
            in_shardings=(repl, repl, repl),
            out_shardings=(repl, repl, repl),
            donate_argnums=(0,),
        )

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

    def _epoch_stepwise(self, state, key, step, epoch_i):
        """One epoch, one dispatch per step (mesh / host-data path)."""
        cfg = self.cfg
        timer = self._timer
        metric_sums = None
        n_metric = 0
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
                state, metrics = self.train_step(state, gt, radius, sub)
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
                # ONE batched fetch: per-leaf float() would pay a full
                # host round trip PER METRIC (~20 ms each on the
                # remote-dispatch tunnel — measured 12.5 ms/step of pure
                # fetch overhead at steps_per_print=20)
                host = {
                    k: float(v)
                    for k, v in jax.device_get(metrics).items()
                }
                host["steps_per_sec"] = timer.steps_per_sec
                self.logger.scalars(step, host)
            if cfg.train.visualize and step % cfg.train.steps_per_visu == 0:
                self._visualize(
                    state, gt, radius, step, epoch_i, inputs=inputs
                )
        return state, metric_sums, n_metric, step, key

    def _epoch_chunked(self, state, key, step, epoch_i):
        """One epoch in chunks of ``steps_per_print`` steps per dispatch
        (see _make_chunk_fn); scalars and renders fire once per cadence
        boundary like the stepwise loop — when ``visualize`` is on the
        chunk size aligns down to gcd(steps_per_print, steps_per_visu) so
        boundaries land on chunk ends (the render then sees exactly the
        post-boundary-step state and batch, like the stepwise path).
        When an epoch length is not a multiple of the chunk, the leftover
        steps run stepwise with the same cadence checks; boundaries that
        straddle a chunk are emitted at the enclosing chunk's final step.
        """
        import jax.numpy as jnp

        cfg = self.cfg
        self._ensure_device_data()
        timer = self._timer
        bs = cfg.train.batch_size
        batches = list(self.dataset.epoch_indices(bs))
        if not batches:  # dataset smaller than one batch: empty epoch
            return state, None, 0, step, key
        idx_all = np.stack(batches)
        nb = len(idx_all)
        cs = cfg.train.steps_per_print
        if cfg.train.visualize:
            cs = math.gcd(cs, cfg.train.steps_per_visu)
        cs = max(1, min(cs, nb))
        if getattr(self, "_chunk_fn", None) is None or self._chunk_cs != cs:
            self._chunk_fn = self._make_chunk_fn(cs)
            self._chunk_cs = cs

        metric_sums = None
        n_metric = 0

        def accumulate(sums, new):
            return (
                new
                if sums is None
                else jax.tree_util.tree_map(lambda a, b: a + b, sums, new)
            )

        def maybe_visualize(c_last, new_step):
            if not cfg.train.visualize:
                return
            if (new_step // cfg.train.steps_per_visu) <= (
                (new_step - cs) // cfg.train.steps_per_visu
            ):
                return
            idx = jnp.asarray(idx_all[c_last])
            inputs = (
                None if self._inputs_dev is None else self._inputs_dev[idx]
            )
            self._visualize(
                state, self._gt_dev[idx], self._radius_dev[idx],
                new_step, epoch_i, inputs=inputs,
            )

        spp = cfg.train.steps_per_print
        c = 0
        while c + cs <= nb:
            key, sub = jax.random.split(key)
            state, sums, last = self._chunk_fn(
                state, jnp.asarray(idx_all[c : c + cs]), sub
            )
            self._last_state = state
            step += cs
            timer.tick(cs)
            metric_sums = accumulate(metric_sums, sums)
            n_metric += cs
            if (step // spp) > ((step - cs) // spp):
                # one batched fetch per print boundary (see stepwise note)
                host = {
                    k: float(v) for k, v in jax.device_get(last).items()
                }
                host["steps_per_sec"] = timer.steps_per_sec
                self.logger.scalars(step, host)
            maybe_visualize(c + cs - 1, step)
            c += cs
        # tail batches (nb % cs) run stepwise, same cadence checks
        for idx in idx_all[c:]:
            key, sub = jax.random.split(key)
            idx = jnp.asarray(idx)
            gt = self._gt_dev[idx]
            radius = self._radius_dev[idx]
            inputs = (
                None if self._inputs_dev is None else self._inputs_dev[idx]
            )
            if inputs is None:
                state, metrics = self.train_step(state, gt, radius, sub)
            else:
                state, metrics = self.train_step(
                    state, gt, inputs, radius, sub
                )
            self._last_state = state
            step += 1
            timer.tick()
            metric_sums = accumulate(metric_sums, metrics)
            n_metric += 1
            if step % spp == 0:
                host = {
                    k: float(v) for k, v in jax.device_get(metrics).items()
                }
                host["steps_per_sec"] = timer.steps_per_sec
                self.logger.scalars(step, host)
            if cfg.train.visualize and step % cfg.train.steps_per_visu == 0:
                self._visualize(
                    state, gt, radius, step, epoch_i, inputs=inputs
                )
        return state, metric_sums, n_metric, step, key

    def _train_loop(
        self, state, start_epoch: int, epochs: Optional[int] = None
    ):
        cfg = self.cfg
        self._last_state = state
        total_epochs = epochs if epochs is not None else cfg.train.training_epoch
        key = jax.random.PRNGKey(cfg.train.seed + 1)
        best_fine_cd = math.inf
        self._timer = StepTimer()
        step = self._state_step(state)

        for epoch_i in range(start_epoch, total_epochs):
            # metric sums accumulate on device so the step loop never blocks
            # on a host fetch (the reference fetched 6 scalars per sess.run,
            # ref:DisPU/model.py:252-255); one fetch per epoch + the
            # periodic steps_per_print scalars.
            t0 = time.time()
            profile_this = cfg.train.profile and epoch_i == start_epoch
            with maybe_profile(cfg.log_dir, profile_this):
                if self._scan_eligible():
                    state, metric_sums, n_metric, step, key = (
                        self._epoch_chunked(state, key, step, epoch_i)
                    )
                else:
                    state, metric_sums, n_metric, step, key = (
                        self._epoch_stepwise(state, key, step, epoch_i)
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

    def _make_raw_step(self):
        return make_train_step(self.cfg, mesh=None, jit_compile=False)

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
