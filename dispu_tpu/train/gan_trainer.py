"""GAN experiment driver (parity: ref:DisPU/model_gan.py train loop).

Shares all loop machinery — device-resident batching, crash checkpoint,
source backup, profiler, periodic visualization, best-CD save schedule —
with the CD-path :class:`~dispu_tpu.train.trainer.Trainer` through
``BaseTrainer``; only the state factory, fused D+G step, and log line
differ (the reference duplicated the whole Model class instead,
ref:DisPU/model_gan.py vs model.py).
"""

from __future__ import annotations

import jax

from dispu_tpu.train.gan_steps import create_gan_state, make_gan_train_step
from dispu_tpu.train.trainer import BaseTrainer


class GANTrainer(BaseTrainer):
    epoch_metric_keys = (
        "total", "fine_cd", "d_loss", "g_gan", "uniform", "offset_mean",
        "d_gap", "d_var", "d_clip_frac",
    )

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        if self.cfg.train.d_clip > 0:
            # The reference's ±0.01 weight clip drives every critic weight
            # to the boundary and the adversarial term to a constant-output
            # fixed point (root-caused in PERFORMANCE.md "LSGAN critic
            # collapse"; ref:DisPU/model_gan.py:146-151 has the same clip).
            # Keep the faithful default, but never let a fresh run hit the
            # known-dead config silently.
            msg = (
                "WARNING: d_clip=%g reproduces the reference's collapsed "
                "critic (d_clip_frac -> 1.0, constant D output; see "
                "PERFORMANCE.md 'LSGAN critic collapse'). Pass --d_clip 0 "
                "for a live adversarial term; watch d_gap/d_clip_frac in "
                "the log either way." % self.cfg.train.d_clip
            )
            print(msg, flush=True)
            self.logger.text(msg)
        elif self.cfg.train.gen_update > 1:
            msg = (
                "d_clip=0 balanced game: critic trains once per "
                "gen_update=%d generator steps (the reference declares "
                "--gen_update but never consumes it, "
                "ref:DisPU/configs.py:41; pass --gen_update 1 for the "
                "round-4 D-every-step behavior)."
                % self.cfg.train.gen_update
            )
            print(msg, flush=True)
            self.logger.text(msg)

    def _fake_pool(self):
        """Lazily build the shared PointPool history buffer (off by
        default; ref:Common/visu_utils.py:309-334)."""
        import numpy as np

        from dispu_tpu.utils.visu import PointPool

        size = self.cfg.train.fake_pool_size
        if size <= 0:
            return None
        if getattr(self, "_pool", None) is None:
            self._pool = PointPool(
                size, rng=np.random.RandomState(self.cfg.train.seed)
            )
        return self._pool

    def _make_step(self):
        pool = self._fake_pool()
        if pool is not None and self.mesh is not None:
            # Passing mesh=None here would dodge make_gan_train_step's
            # guard while BaseTrainer keeps sharding batches over
            # self.mesh — the io_callback would then run inside a
            # multi-device computation.  Reject loudly instead.
            raise ValueError(
                "fake_pool is a host io_callback path — single-device "
                "only; run on one device or set --fake_pool_size 0"
            )
        return make_gan_train_step(
            self.cfg, mesh=self.mesh, fake_pool=pool,
        )

    def _make_raw_step(self):
        return make_gan_train_step(
            self.cfg, mesh=None, jit_compile=False,
            fake_pool=self._fake_pool(),
        )

    def _make_state(self):
        return create_gan_state(
            jax.random.PRNGKey(self.cfg.train.seed), self.cfg
        )

    def _gen_variables(self, state):
        return state.gen.variables()

    @staticmethod
    def _state_step(state) -> int:
        return int(jax.device_get(state.gen.step))

    def _format_epoch(self, epoch, meters, minutes):
        return (
            "epoch %04d g_loss=%.9f fine_cd=%.9f d_loss=%.9f g_gan=%.9f "
            "uniform=%.9f d_gap=%.6f d_var=%.3e d_clip_frac=%.3f time=%.4f"
            % (
                epoch,
                meters["total"].avg,
                meters["fine_cd"].avg,
                meters["d_loss"].avg,
                meters["g_gan"].avg,
                meters["uniform"].avg,
                meters["d_gap"].avg,
                meters["d_var"].avg,
                meters["d_clip_frac"].avg,
                minutes,
            )
        )
