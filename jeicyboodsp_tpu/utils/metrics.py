"""Metrics registry + structured logging (SURVEY §5 observability).

The reference's observability is raw printf (VAD energies, EM likelihoods,
coefficient dumps).  This module gives the framework a small structured
replacement: named counters/gauges/timers collected into a registry that
serializes to one JSON report (what ``bench.py`` and the scaling harness
feed from), plus an SNR helper shared by tests and benches.
"""

from __future__ import annotations

import json
import time
from collections import defaultdict
from contextlib import contextmanager

import numpy as np


class Metrics:
    def __init__(self):
        self.counters = defaultdict(float)
        self.gauges = {}
        self.timings = defaultdict(list)

    def count(self, name: str, value: float = 1.0):
        self.counters[name] += value

    def gauge(self, name: str, value: float):
        self.gauges[name] = float(value)

    @contextmanager
    def timer(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.timings[name].append(time.perf_counter() - t0)

    def report(self) -> dict:
        out = {"counters": dict(self.counters), "gauges": dict(self.gauges)}
        out["timings"] = {
            k: {"n": len(v), "total_s": sum(v), "mean_s": sum(v) / len(v)}
            for k, v in self.timings.items()
            if v
        }
        return out

    def dump(self, path: str | None = None) -> str:
        s = json.dumps(self.report(), indent=2, sort_keys=True)
        if path:
            with open(path, "w") as f:
                f.write(s)
        return s


REGISTRY = Metrics()


def snr_db(ref, test) -> float:
    """SNR of `test` against `ref` in dB (the BASELINE fidelity metric)."""
    ref = np.asarray(ref, np.float64)
    test = np.asarray(test, np.float64)
    err = ref - test
    p_err = float(np.sum(err**2))
    if p_err == 0:
        return float("inf")
    return 10.0 * np.log10(float(np.sum(ref**2)) / p_err)
