"""Run logging + metrics.

The reference tees prints to ``train_log.txt`` (reference train/train.py:35-38)
and writes TensorBoard scalars via graph summaries (reference train/train.py:859-866).
Here: a `RunLogger` that tees to stdout + a text log, and a `MetricsWriter` that
appends JSONL scalar records (one file per writer role, e.g. 'local'/'other',
matching the reference's two-writer scheme at train/train.py:931-932). JSONL is
trivially greppable and needs no TF dependency; a TensorBoard exporter can be
layered on top.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time
from typing import Any, Dict, Optional


class RunLogger:
    """Append-only text log teeing to stdout; thread-safe."""

    def __init__(self, out_dir: Optional[str] = None, filename: str = "train_log.txt"):
        self._lock = threading.Lock()
        self._fh = None
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            self._fh = open(os.path.join(out_dir, filename), "a")

    def log(self, msg: Any) -> None:
        text = str(msg)
        with self._lock:
            print(text)
            sys.stdout.flush()
            if self._fh is not None:
                self._fh.write(text + "\n")
                self._fh.flush()

    __call__ = log

    def close(self) -> None:
        with self._lock:
            if self._fh is not None:
                self._fh.close()
                self._fh = None


class MetricsWriter:
    """Scalar metrics as JSONL: {"step": int, "tag": str, "value": float, "t": unix}."""

    def __init__(self, out_dir: str, role: str = "local", enabled: bool = True):
        os.makedirs(out_dir, exist_ok=True)
        self.role = role
        self.enabled = enabled  # False on non-primary multi-host processes
        self._path = os.path.join(out_dir, f"metrics_{role}.jsonl")
        self._lock = threading.Lock()

    def scalar(self, tag: str, value: float, step: int) -> None:
        if not self.enabled:
            return
        rec = {"step": int(step), "tag": tag, "value": float(value), "t": time.time()}
        with self._lock:
            with open(self._path, "a") as f:
                f.write(json.dumps(rec) + "\n")

    def scalars(self, values: Dict[str, float], step: int) -> None:
        for tag, v in values.items():
            self.scalar(tag, v, step)

    def read_all(self):
        if not os.path.exists(self._path):
            return []
        with open(self._path) as f:
            return [json.loads(line) for line in f if line.strip()]


class StepTimer:
    """Lightweight wall-clock tracer for pipeline stages.

    Replaces the reference's ad-hoc ``print('... in {}s')`` stage prints
    (reference train/train.py:260,309) with named, queryable timings, and pairs
    with jax.profiler trace annotations when profiling is on.
    """

    def __init__(self):
        self._acc: Dict[str, float] = {}
        self._count: Dict[str, int] = {}
        self._lock = threading.Lock()

    class _Span:
        def __init__(self, timer: "StepTimer", name: str):
            self.timer, self.name = timer, name
            self._trace = None

        def __enter__(self):
            try:  # visible in jax.profiler traces when one is active
                import jax.profiler

                self._trace = jax.profiler.TraceAnnotation(self.name)
                self._trace.__enter__()
            except Exception:
                self._trace = None
            self.t0 = time.perf_counter()
            return self

        def __exit__(self, *exc):
            dt = time.perf_counter() - self.t0
            if self._trace is not None:
                self._trace.__exit__(*exc)
            with self.timer._lock:
                self.timer._acc[self.name] = self.timer._acc.get(self.name, 0.0) + dt
                self.timer._count[self.name] = self.timer._count.get(self.name, 0) + 1
            return False

    def span(self, name: str) -> "StepTimer._Span":
        return StepTimer._Span(self, name)

    def summary(self) -> Dict[str, Dict[str, float]]:
        with self._lock:
            return {
                k: {
                    "total_s": self._acc[k],
                    "count": self._count[k],
                    "mean_s": self._acc[k] / max(self._count[k], 1),
                }
                for k in self._acc
            }
