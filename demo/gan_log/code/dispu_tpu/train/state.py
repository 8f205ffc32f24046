"""Training state: params + batch stats + Adam moments + epoch counter.

The epoch counter is part of the state pytree (and therefore of
checkpoints), mirroring the reference where ``epoch`` is a TF variable
restored with the graph (ref:DisPU/model.py:42-43,397); the learning-rate
and fine-weight schedules are functions of it.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from dispu_tpu.config import GeneratorConfig, TrainConfig
from dispu_tpu.models.generator import DisPUGenerator


@flax.struct.dataclass
class GeneratorState:
    params: Any
    batch_stats: Any
    opt_state: Any
    epoch: jnp.ndarray  # float32 scalar
    step: jnp.ndarray   # int32 scalar

    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}

    def next_epoch(self) -> "GeneratorState":
        return self.replace(epoch=self.epoch + 1.0)


def adam_transform(cfg: TrainConfig) -> optax.GradientTransformation:
    """Adam moments only; the lr (an epoch function) is applied in-step.

    Matches tf.train.AdamOptimizer(lr, beta1=cfg.beta1) defaults
    (ref:DisPU/model.py:178): beta2=0.999, eps=1e-8 added outside the sqrt.
    """
    return optax.scale_by_adam(b1=cfg.beta1, b2=0.999, eps=1e-8)


def create_generator_state(
    rng: jax.Array,
    gen_cfg: GeneratorConfig,
    train_cfg: TrainConfig,
    model: DisPUGenerator | None = None,
) -> GeneratorState:
    model = model or DisPUGenerator(cfg=gen_cfg)
    dummy = jnp.zeros((1, gen_cfg.num_points, 3), jnp.float32)
    variables = model.init(rng, dummy, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = adam_transform(train_cfg).init(params)
    return GeneratorState(
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        epoch=jnp.zeros((), jnp.float32),
        step=jnp.zeros((), jnp.int32),
    )
