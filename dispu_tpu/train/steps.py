"""Jitted train/eval step functions (single-chip and mesh-sharded).

Replaces the reference's per-batch ``sess.run([G_optimizers, ...],
feed_dict)`` hot loop (ref:DisPU/model.py:242-264) — which crossed the
host/device boundary at least three times per step (feed_dict upload,
py_func kNN round-trip, scalar fetches) — with one fused XLA program per
step: on-device nonuniform input sampling + augmentation + forward +
losses + Adam update, with state buffers donated.

Data parallelism: ``make_train_step(mesh=...)`` returns the same step jitted
with the batch sharded over the mesh's data axis and the state replicated;
XLA inserts the gradient psum over ICI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dispu_tpu import losses as L
from dispu_tpu.config import ExperimentConfig
from dispu_tpu.data.augment import augment_batch, sample_training_inputs
from dispu_tpu.models.generator import DisPUGenerator
from dispu_tpu.parallel.mesh import batch_sharding, replicated_sharding
from dispu_tpu.train.state import GeneratorState, adam_transform


def make_train_step(
    cfg: ExperimentConfig,
    mesh=None,
    donate: bool = True,
    jit_compile: bool = True,
):
    """Build the jitted CD-path train step (``jit_compile=False`` returns
    the raw traceable step for callers that embed it in a larger jitted
    program, e.g. the trainer's chunked ``lax.scan`` loop).

    Step signature depends on the input mode (ref:DisPU/dataset.py:120-140):

    * ``random_input=True`` (default): ``(state, gt, radius, key)`` — the
      sparse input is a nonuniform re-sample of the dense ``gt`` patch,
      drawn on device each step (ref 'random' mode,
      ref:DisPU/dataset.py:125-130).
    * ``random_input=False``: ``(state, gt, inputs, radius, key)`` — the
      curated sparse patch (the h5 ``poisson_256`` column) is fed in and
      augmented jointly with ``gt``, exactly like the reference's
      non-random mode (ref:DisPU/dataset.py:121,132-140).
    """
    model = DisPUGenerator(
        cfg=cfg.generator, dtype=jnp.dtype(cfg.train.compute_dtype)
    )
    tx = adam_transform(cfg.train)
    n_in = cfg.generator.num_points

    def step_core(state: GeneratorState, gt, inputs, radius, k_aug):
        if cfg.data.augment:
            inputs, gt_aug = augment_batch(
                k_aug,
                inputs,
                gt,
                jitter_sigma=cfg.data.jitter_sigma,
                jitter_max=cfg.data.jitter_max,
                scale_low=cfg.data.scale_low,
                scale_high=cfg.data.scale_high,
            )
        else:
            gt_aug = gt

        weight_fine = L.weight_fine_schedule(
            state.epoch,
            cfg.loss.weight_fine_boundaries,
            cfg.loss.weight_fine_values,
        )
        lr = L.lr_schedule(
            state.epoch,
            base_lr=cfg.train.base_lr_g,
            decay_step_epochs=cfg.train.decay_step_epochs,
            decay_rate=cfg.train.lr_decay_rate,
            clip=cfg.train.lr_clip,
        )

        def fwd(params, inputs):
            return model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                inputs,
                train=True,
                mutable=["batch_stats"],
            )

        if cfg.train.remat:
            # recompute the forward during the backward pass instead of
            # keeping the (b, n, k, c) neighborhood activations live
            fwd = jax.checkpoint(fwd)

        def loss_fn(params):
            (coarse, fine), updates = fwd(params, inputs)
            total, metrics = L.pu_losses(
                coarse, fine, gt_aug, radius, weight_fine, cfg.loss
            )
            return total, (metrics, updates["batch_stats"])

        (total, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p - lr * u, state.params, updates
        )
        metrics = dict(metrics, total=total, lr=lr)
        new_state = state.replace(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            step=state.step + 1,
        )
        return new_state, metrics

    if cfg.data.random_input:

        def step(state: GeneratorState, gt, radius, key):
            k_sample, k_aug = jax.random.split(key)
            inputs = sample_training_inputs(
                k_sample, gt, n_in,
                cluster_prob=cfg.data.cluster_prob,
                cluster_size=cfg.data.cluster_size,
            )
            return step_core(state, gt, inputs, radius, k_aug)

        shardings = ("repl", "data", "data", "repl")
    else:

        def step(state: GeneratorState, gt, inputs, radius, key):
            _, k_aug = jax.random.split(key)
            return step_core(state, gt, inputs, radius, k_aug)

        shardings = ("repl", "data", "data", "data", "repl")

    if not jit_compile:
        return step
    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=tuple(
            repl if s == "repl" else data for s in shardings
        ),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_eval_step(cfg: ExperimentConfig, mesh=None):
    """Jitted inference + metric step: (variables, inputs, gt, radius) →
    (coarse, fine, metrics).  Mirrors the reference's is_training=False
    evaluation fetches (ref:DisPU/model.py:265-292)."""
    model = DisPUGenerator(
        cfg=cfg.generator, dtype=jnp.dtype(cfg.train.compute_dtype)
    )

    def step(variables, inputs, gt, radius):
        coarse, fine = model.apply(variables, inputs, train=False)
        off = jnp.sqrt(jnp.sum((fine - coarse) ** 2, axis=-1) + 1e-20)
        metrics = {
            "coarse_cd": cfg.loss.coarse_cd_w
            * L.chamfer(coarse, gt, radius=radius),
            "fine_cd": cfg.loss.fine_cd_w
            * L.chamfer(fine, gt, radius=radius),
            "fine_hd": cfg.loss.hd_w
            * L.hausdorff(fine, gt, radius=radius),
            "offset_mean": jnp.mean(off),
        }
        return coarse, fine, metrics

    if mesh is None:
        return jax.jit(step)
    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=(repl, data, data, data),
        out_shardings=(data, data, repl),
    )
