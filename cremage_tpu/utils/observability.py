"""Tracing / profiling / memory observability.

The reference has only ad-hoc time.time() spans and RAM logging
(SURVEY.md §5). TPU-native upgrade:
- `span(name)` context manager: wall-time span that also emits a
  jax.profiler.TraceAnnotation so spans show up in TPU profiles;
- `profile_trace(dir)` wraps jax.profiler.trace for on-demand capture
  (xplane dumps viewable in TensorBoard/XProf);
- `device_memory_stats()`: per-device HBM usage;
- `Metrics`: tiny counter/gauge registry the worker publishes on the
  status channel (structured observability the reference lacks).
"""
from __future__ import annotations

import contextlib
import json
import logging
import time
from collections import defaultdict
from typing import Dict, Optional

import jax

logger = logging.getLogger(__name__)


class Metrics:
    def __init__(self):
        self.counters: Dict[str, float] = defaultdict(float)
        self.gauges: Dict[str, float] = {}
        self.spans: Dict[str, float] = defaultdict(float)

    def incr(self, name: str, value: float = 1.0):
        self.counters[name] += value

    def gauge(self, name: str, value: float):
        self.gauges[name] = value

    def snapshot(self) -> Dict[str, Dict[str, float]]:
        return {
            "counters": dict(self.counters),
            "gauges": dict(self.gauges),
            "span_seconds": dict(self.spans),
        }

    def to_json(self) -> str:
        return json.dumps(self.snapshot(), sort_keys=True)


METRICS = Metrics()


@contextlib.contextmanager
def span(name: str, metrics: Optional[Metrics] = None):
    """Wall-clock span + TPU profiler annotation."""
    m = metrics or METRICS
    t0 = time.perf_counter()
    try:
        with jax.profiler.TraceAnnotation(name):
            yield
    finally:
        dt = time.perf_counter() - t0
        m.spans[name] += dt
        logger.debug("span %s: %.3fs", name, dt)


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a TPU profile (open with TensorBoard's profile plugin)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> Dict[str, Dict[str, int]]:
    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats() or {}
        except Exception:
            stats = {}
        out[str(d)] = {
            k: int(v) for k, v in stats.items()
            if k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
        }
    return out


def model_memory_usage_in_bytes(params) -> int:
    """Reference `ml_utils.py:195` equivalent for pytrees."""
    import numpy as np

    return int(sum(np.prod(l.shape) * l.dtype.itemsize
                   for l in jax.tree.leaves(params)))
