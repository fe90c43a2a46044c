"""Observability: metric logging, per-step timing, profiler hooks.

The reference logs through TensorBoardLogger + `self.log` short-codes
(`main.py:140-141`, e.g. `s_mix`, `u_nov`, `thr`) and has no tracing at all
(SURVEY §5.1). Here logging and profiling are first-class: a dependency-free
scalar logger (TensorBoard event files if `tensorboardX`/`torch.utils` are
available, JSONL always), a step timer, and `jax.profiler` trace capture.
"""

from __future__ import annotations

import json
import os
import time
from collections import defaultdict

import numpy as np


class MetricsLogger:
    """JSONL (always) + TensorBoard (if available) scalar logger."""

    def __init__(self, log_dir: str, name: str = "exp"):
        self.dir = os.path.join(log_dir, name)
        os.makedirs(self.dir, exist_ok=True)
        self._jsonl = open(os.path.join(self.dir, "metrics.jsonl"), "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(self.dir)
        except Exception:
            pass
        self._epoch_buf = defaultdict(list)

    def log(self, tag: str, value, step: int, on_epoch: bool = False):
        v = float(np.asarray(value))
        self._jsonl.write(json.dumps({"tag": tag, "value": v, "step": step}) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, v, step)
        if on_epoch:
            self._epoch_buf[tag].append(v)

    def log_dict(self, metrics: dict, step: int, prefix: str = "", on_epoch: bool = False):
        for k, v in metrics.items():
            self.log(prefix + k, v, step, on_epoch)

    def epoch_end(self, epoch: int):
        for tag, vals in self._epoch_buf.items():
            self.log(tag + "_epoch", float(np.mean(vals)), epoch)
        self._epoch_buf.clear()
        self._jsonl.flush()

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


class StepTimer:
    """Wall-clock step timing with warmup skip; reports scans/sec."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times: list = []
        self._t0 = None
        self._n = 0

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        dt = time.perf_counter() - self._t0
        self._n += 1
        if self._n > self.warmup:
            self.times.append(dt)
        return dt

    @property
    def mean(self):
        return float(np.mean(self.times)) if self.times else float("nan")

    @property
    def p50(self):
        return float(np.median(self.times)) if self.times else float("nan")


def profile_trace(log_dir: str):
    """Context manager capturing a jax.profiler trace viewable in XProf."""
    import jax

    return jax.profiler.trace(log_dir)
