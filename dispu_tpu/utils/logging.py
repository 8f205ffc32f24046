"""Metrics/observability: scalar logging + optional TensorBoard + profiler.

Replaces the reference's TensorBoard scalar/image summaries and
``log_train.txt`` (ref:DisPU/model.py:132-156,220-222,384-388) and the
absent profiler (SURVEY.md §5: the reference only had ad-hoc
``time.time()`` prints).  TensorBoard event writing is used when a writer
implementation is importable; a JSONL scalar log is always written so runs
are inspectable with no dependencies.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Optional

import jax


class MetricsLogger:
    def __init__(self, log_dir: str, filename: str = "scalars.jsonl"):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, filename)
        self._f = open(self.path, "a")
        self._tb = None
        try:  # optional TensorBoard writer (flax metric_writers not baked in)
            from torch.utils.tensorboard import SummaryWriter  # type: ignore

            self._tb = SummaryWriter(log_dir)
        except Exception:
            self._tb = None
        self.txt_path = os.path.join(log_dir, "log_train.txt")

    def scalars(self, step: int, values: Dict[str, float]):
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in values.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in values.items():
                self._tb.add_scalar(k, float(v), int(step))

    def text(self, msg: str):
        """Append a line to log_train.txt (ref:DisPU/model.py:384-388)."""
        with open(self.txt_path, "a") as f:
            f.write(msg + "\n")

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()


def dump_args(log_dir: str, cfg) -> None:
    """Write the config to args.txt (parity: ref:DisPU/model.py:198-200)."""
    import dataclasses

    os.makedirs(log_dir, exist_ok=True)
    with open(os.path.join(log_dir, "args.txt"), "w") as f:
        def walk(prefix, obj):
            if dataclasses.is_dataclass(obj):
                for field in dataclasses.fields(obj):
                    walk(f"{prefix}{field.name}.", getattr(obj, field.name))
            else:
                f.write(f"{prefix[:-1]}: {obj}\n")

        walk("", cfg)


@contextlib.contextmanager
def maybe_profile(log_dir: Optional[str], enable: bool = False):
    """jax.profiler trace around a block (view with TensorBoard/XProf)."""
    if enable and log_dir:
        jax.profiler.start_trace(os.path.join(log_dir, "profile"))
        try:
            yield
        finally:
            jax.profiler.stop_trace()
    else:
        yield


def backup_sources(log_dir: str, mode: str = "manifest") -> None:
    """Record the exact code that produced a run (ref:DisPU/model.py:56-65).

    The reference self-copies its sources into the log dir.  The default
    here writes ``code_manifest.txt`` instead — the git commit (+dirty
    state) and a sha256 per package source file — which identifies the
    code just as precisely without re-committing a full package copy into
    every run directory (each copy is ~5.7k LoC of duplicate history).
    ``mode="copy"`` keeps the reference's literal behavior.
    """
    import hashlib
    import subprocess

    src = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if mode == "copy":
        import shutil

        dst = os.path.join(log_dir, "code", "dispu_tpu")
        if os.path.exists(dst):
            shutil.rmtree(dst)
        shutil.copytree(
            src, dst, ignore=shutil.ignore_patterns("__pycache__", "*.pyc")
        )
        return
    repo = os.path.dirname(src)
    lines = []
    try:
        head = subprocess.run(
            ["git", "-C", repo, "rev-parse", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip()
        dirty = subprocess.run(
            ["git", "-C", repo, "status", "--porcelain"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip()
        lines.append(f"commit: {head or 'unknown'}")
        lines.append(f"dirty: {'yes' if dirty else 'no'}")
    except Exception:
        lines.append("commit: unknown (not a git checkout)")
    for root, dirs, files in sorted(os.walk(src)):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for name in sorted(files):
            if not name.endswith(".py"):
                continue
            path = os.path.join(root, name)
            digest = hashlib.sha256(open(path, "rb").read()).hexdigest()
            rel = os.path.relpath(path, os.path.dirname(src))
            lines.append(f"{digest}  {rel}")
    os.makedirs(log_dir, exist_ok=True)
    with open(os.path.join(log_dir, "code_manifest.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")


class StepTimer:
    """Per-step wall-clock accounting for throughput reports."""

    def __init__(self):
        self.start = time.perf_counter()
        self.steps = 0

    def tick(self, n: int = 1):
        self.steps += n

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self.start

    @property
    def steps_per_sec(self) -> float:
        return self.steps / max(self.elapsed, 1e-9)
