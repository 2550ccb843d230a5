"""Tracing / profiling utilities (SURVEY §5: the reference has none in-repo;
this is the TPU build's first-class replacement).

  * ``trace(logdir)``: context manager around ``jax.profiler`` — produces an
    XLA trace viewable in TensorBoard/Perfetto;
  * ``StepTimer``: host-side EMA step timer with jsonl logging — the
    equivalent of d2's ``CommonMetricPrinter`` rate reporting;
  * ``device_sync``: host fence that actually materializes a value
    (``block_until_ready`` does not reliably fence through remote-TPU
    tunnels).
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Any, Dict, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_sync(x: Any) -> None:
    """Fence: pull one leaf to host so all producing work has finished."""
    leaves = jax.tree.leaves(x)
    if leaves:
        np.asarray(leaves[0])


class StepTimer:
    def __init__(self, log_path: Optional[str] = None, ema: float = 0.9):
        self.log_path = log_path
        self.ema = ema
        self.rate: Optional[float] = None
        self._last: Optional[float] = None
        self._file = open(log_path, "a") if log_path else None

    def tick(self, step: int, metrics: Optional[Dict[str, float]] = None):
        now = time.perf_counter()
        if self._last is not None:
            inst = 1.0 / max(now - self._last, 1e-9)
            self.rate = (
                inst if self.rate is None
                else self.ema * self.rate + (1 - self.ema) * inst
            )
        self._last = now
        if self._file is not None:
            rec = {"step": step, "steps_per_sec": self.rate}
            if metrics:
                rec.update({k: float(v) for k, v in metrics.items()})
            self._file.write(json.dumps(rec) + "\n")
            self._file.flush()
