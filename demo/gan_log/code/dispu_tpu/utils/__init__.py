"""Utilities: checkpointing, metrics logging, profiling, meters."""

from dispu_tpu.utils.checkpoint import save_checkpoint, restore_checkpoint, latest_checkpoint
from dispu_tpu.utils.meters import AverageMeter

__all__ = [
    "save_checkpoint",
    "restore_checkpoint",
    "latest_checkpoint",
    "AverageMeter",
]
