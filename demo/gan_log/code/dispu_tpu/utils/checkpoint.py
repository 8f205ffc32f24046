"""Checkpoint save/restore.

Replaces ref:DisPU/model.py:184,224-227 (tf.train.Saver, save every
``epoch_per_save`` epochs when fine-CD improved, epoch parsed back from the
filename at restore, ref:Common/model_utils.py:132-139).

Format: flax msgpack serialization of the full state pytree (params, batch
stats, Adam moments, epoch/step counters) — restores are exact resume
points, with no dependencies beyond flax.
"""

from __future__ import annotations

import os
import re
from typing import Optional, Tuple

import flax.serialization
import jax

_CKPT_RE = re.compile(r"model-(\d+)\.msgpack$")


def save_checkpoint(log_dir: str, state, epoch: int) -> str:
    os.makedirs(log_dir, exist_ok=True)
    path = os.path.join(log_dir, f"model-{epoch}.msgpack")
    state = jax.device_get(state)
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(state))
    return path


def latest_checkpoint(log_dir: str) -> Tuple[int, Optional[str]]:
    """Newest checkpoint (by epoch) in a log dir, as (epoch, path).

    Parity: ref:Common/model_utils.py:132-139 parses the epoch out of the
    checkpoint filename; so do we.
    """
    best = (-1, None)
    if not os.path.isdir(log_dir):
        return best
    for name in os.listdir(log_dir):
        m = _CKPT_RE.match(name)
        if m:
            epoch = int(m.group(1))
            if epoch > best[0]:
                best = (epoch, os.path.join(log_dir, name))
    return best


def restore_checkpoint(path: str, target):
    """Restore a state pytree saved by ``save_checkpoint`` into ``target``
    (a template state with the right structure)."""
    with open(path, "rb") as f:
        data = f.read()
    return flax.serialization.from_bytes(target, data)
