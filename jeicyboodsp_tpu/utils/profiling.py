"""Profiling + roofline estimation (SURVEY §5 tracing/profiling).

``trace`` wraps ``jax.profiler`` for device traces; ``roofline`` computes the
statically-known FLOP/byte counts of the hot kernels (per processed block)
so measured samples/s can be placed against the v5e HBM/MXU roofs.
"""

from __future__ import annotations

from contextlib import contextmanager
from dataclasses import dataclass

import numpy as np


@contextmanager
def trace(logdir: str):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class Roofline:
    flops_per_block: float
    hbm_bytes_per_block: float
    samples_per_block: int

    def bound(self, peak_flops: float = 4.9e13, peak_bw: float = 8.2e11) -> dict:
        """Samples/s ceilings on one v5e (f32 MXU ~49 TFLOP/s, HBM ~820 GB/s)."""
        t_compute = self.flops_per_block / peak_flops
        t_mem = self.hbm_bytes_per_block / peak_bw
        t = max(t_compute, t_mem)
        return {
            "compute_bound_samples_per_s": self.samples_per_block / t_compute,
            "memory_bound_samples_per_s": self.samples_per_block / t_mem,
            "speed_of_light_samples_per_s": self.samples_per_block / t,
            "bottleneck": "compute" if t_compute > t_mem else "memory",
        }


def enhance_chain_roofline(block=512, fft=1024, dtype_bytes=4) -> Roofline:
    """Per 512-sample block: one rfft + one irfft (5 N log2 N flops each),
    VAD + gain elementwise, ~6 HBM passes over the frame."""
    nlog = fft * np.log2(fft)
    flops = 2 * 5 * nlog + 30 * fft
    bytes_ = 6 * fft * dtype_bytes
    return Roofline(flops, bytes_, block)


def fastconv_roofline(block=1024, fft=8192, dtype_bytes=4) -> Roofline:
    nlog = fft * np.log2(fft)
    flops = 2 * 5 * nlog + 8 * fft
    bytes_ = 6 * fft * dtype_bytes
    return Roofline(flops, bytes_, block)


def geq_roofline(block=512, bands=7, dtype_bytes=4) -> Roofline:
    flops = block * bands * 9
    bytes_ = 2 * block * dtype_bytes  # one read + one write; state in VMEM
    return Roofline(flops, bytes_, block)
