"""Structured per-scan metrics + timing scopes (reference C26, tic_toc.h +
SURVEY.md §5 tracing).

The reference's TicToc wall timers print commented-out averages
(Estimator.cpp:267-282); here every stage records structured records that
can be dumped as JSON lines, and `trace_scope` wraps stages in
jax.profiler ranges when profiling is enabled.
"""
from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict

import numpy as np

import jax


class MetricsLog:
    """Append-only structured metrics with running averages."""

    def __init__(self):
        self.records = []
        self._sums = defaultdict(float)
        self._counts = defaultdict(int)

    def record(self, stage: str, **fields):
        rec = {"stage": stage, "t_wall": time.time()}
        for k, v in fields.items():
            if hasattr(v, "shape"):
                v = np.asarray(v).tolist()
            rec[k] = v
            if isinstance(v, (int, float)):
                self._sums[f"{stage}/{k}"] += v
                self._counts[f"{stage}/{k}"] += 1
        self.records.append(rec)

    def mean(self, key: str) -> float:
        c = self._counts.get(key, 0)
        return self._sums.get(key, 0.0) / c if c else float("nan")

    def dump(self, path: str):
        with open(path, "w") as f:
            for rec in self.records:
                f.write(json.dumps(rec) + "\n")

    def summary(self) -> dict:
        return {k: self.mean(k) for k in self._counts}


@contextlib.contextmanager
def trace_scope(name: str, enabled: bool = True):
    """Named profiler scope (jax.profiler.TraceAnnotation) + wall timer."""
    t0 = time.perf_counter()
    if enabled:
        with jax.profiler.TraceAnnotation(name):
            yield
    else:
        yield
    trace_scope.last_ms = (time.perf_counter() - t0) * 1e3


class Stopwatch:
    """TicToc equivalent (tic_toc.h:7-21) with running average."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()

    def toc_ms(self) -> float:
        return (time.perf_counter() - self._t0) * 1e3
