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
import queue
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


class AsyncScalarLogger:
    """Off-thread device->host scalar fetching for the train loop.

    The loop's only per-step host syncs were ``float(metrics['loss'])`` and
    ``int(state.step)`` — each a full host<->device round-trip, which on a
    remote-attached TPU (50-80 ms RTT through this project's relay) costs
    several device steps of wall clock. Submitting the DEVICE scalars here
    keeps the main loop fully async: a worker thread drains the queue in
    chunks, stacks each chunk's scalars into one device array, fetches it
    with a single transfer per key (amortizing the RTT over the chunk), and
    hands the floats to the write callback in submission order.

    ``write_fn(step, values: Dict[str, float])`` runs on the worker thread.
    Exceptions from it are re-raised on the next drain()/close().
    """

    _SENTINEL = object()

    def __init__(self, write_fn, max_chunk: int = 64,
                 min_fetch_interval: float = 0.25):
        """``min_fetch_interval``: minimum seconds between device fetches.
        Measured on the relay (perf/_stage.log): a mid-stream D2H fetch
        serializes with dispatch RPCs and costs ~26 ms of loop time per
        step when fetched eagerly; throttling to one fetch per interval
        amortizes that to noise while values still arrive within the
        interval. drain() ignores the throttle.

        Env override ``SCL_SCALAR_FETCH_INTERVAL`` (seconds): measurement
        knob — a huge value defers every fetch to drain(), isolating the
        logger's mid-stream fetch cost in throughput A/Bs (bench_train)."""
        self._write = write_fn
        self._max_chunk = max_chunk
        env = os.environ.get("SCL_SCALAR_FETCH_INTERVAL")
        if env:
            min_fetch_interval = float(env)
        self._min_interval = min_fetch_interval
        self.fetch_count = 0
        self.fetch_seconds = 0.0
        self._last_fetch = 0.0
        self._draining = threading.Event()
        self._q: "queue.Queue" = queue.Queue()
        self._err: Optional[BaseException] = None
        self._pending = 0
        self._cv = threading.Condition()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def submit(self, step: int, scalars: Dict[str, Any]) -> None:
        """``scalars`` values may be live device arrays; they are fetched on
        the worker. Do not pass large arrays — scalars only."""
        with self._cv:
            self._pending += 1
        self._q.put((step, scalars))

    def _fetch_chunk(self, items):
        import numpy as np

        keys = list(items[0][1].keys())
        cols: Dict[str, Any] = {}
        for k in keys:
            vals = [it[1].get(k) for it in items]
            try:
                import jax.numpy as jnp

                cols[k] = np.asarray(jnp.stack(vals))  # one transfer per key
            except Exception:
                cols[k] = np.asarray([float(v) for v in vals])
        for i, (step, _) in enumerate(items):
            self._write(step, {k: float(cols[k][i]) for k in keys})

    def _run(self):
        done = False
        while not done:
            item = self._q.get()
            if item is self._SENTINEL:
                return
            # fetch throttle: wait out the interval (unless draining),
            # letting more submissions accumulate into this chunk
            wait = self._last_fetch + self._min_interval - time.monotonic()
            if wait > 0 and not self._draining.is_set():
                self._draining.wait(wait)
            items = [item]
            while len(items) < self._max_chunk:
                try:
                    nxt = self._q.get_nowait()
                except queue.Empty:
                    break
                if nxt is self._SENTINEL:
                    done = True
                    break
                items.append(nxt)
            t0 = time.monotonic()
            try:
                self._fetch_chunk(items)
            except BaseException as e:
                self._err = e
            finally:
                self._last_fetch = time.monotonic()
                self.fetch_count += 1
                self.fetch_seconds += self._last_fetch - t0
                with self._cv:
                    self._pending -= len(items)
                    self._cv.notify_all()

    def drain(self) -> None:
        """Block until every submitted scalar is written; re-raise worker
        errors."""
        self._draining.set()  # bypass the fetch throttle
        try:
            with self._cv:
                self._cv.wait_for(lambda: self._pending == 0)
        finally:
            self._draining.clear()
        if self._err is not None:
            err, self._err = self._err, None
            raise err

    def close(self, drain: bool = True) -> None:
        if drain:
            self.drain()
        self._q.put(self._SENTINEL)
        self._thread.join(timeout=10)
        if self._err is not None:
            err, self._err = self._err, None
            raise err


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

    def add(self, name: str, dt: float, count: int = 1) -> None:
        """Record an externally measured duration (e.g. a segment window
        assembled from sync points rather than a context manager)."""
        with self._lock:
            self._acc[name] = self._acc.get(name, 0.0) + dt
            self._count[name] = self._count.get(name, 0) + count

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
