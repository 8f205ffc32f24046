"""Training: state, jitted steps, and the experiment loops."""

from dispu_tpu.train.state import GeneratorState, create_generator_state
from dispu_tpu.train.steps import make_train_step, make_eval_step
from dispu_tpu.train.gan_steps import (
    GANState,
    create_gan_state,
    make_gan_train_step,
)

__all__ = [
    "GeneratorState",
    "create_generator_state",
    "make_train_step",
    "make_eval_step",
    "GANState",
    "create_gan_state",
    "make_gan_train_step",
]
