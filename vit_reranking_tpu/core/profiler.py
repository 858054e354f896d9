"""Profiling + throughput instrumentation (SURVEY.md section 5: the reference
has none beyond tqdm bars and an uninvoked MACs hook; this framework exposes
jax.profiler traces and per-phase wall-clock/pairs-per-sec counters)."""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


class PhaseTimer:
    """Named wall-clock phases with optional item-throughput accounting.

    Usage:
        timer = PhaseTimer()
        with timer.phase("embed", items=n_images):
            ...
        timer.summary()  # {'embed': {'seconds': ..., 'items_per_sec': ...}}
    """

    def __init__(self):
        self.seconds: Dict[str, float] = defaultdict(float)
        self.items: Dict[str, float] = defaultdict(float)

    @contextlib.contextmanager
    def phase(self, name: str, items: Optional[float] = None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.seconds[name] += time.perf_counter() - t0
            if items:
                self.items[name] += items

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, sec in self.seconds.items():
            entry = {"seconds": round(sec, 4)}
            if self.items.get(name):
                entry["items_per_sec"] = round(self.items[name] / max(sec, 1e-9), 2)
            out[name] = entry
        return out

    def dump(self, path: str):
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=1)


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """jax.profiler trace scope; enable by passing a dir or setting
    VRT_PROFILE_DIR.  View with TensorBoard or xprof."""
    log_dir = log_dir or os.environ.get("VRT_PROFILE_DIR")
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
