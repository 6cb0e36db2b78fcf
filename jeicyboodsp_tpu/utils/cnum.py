"""C-numeric emulation helpers shared by the oracle (NumPy) and ops (JAX).

The reference programs (e.g. ``7Band_GEQ.cpp:284``, ``WienerFilter_final.cpp:223``,
``NormalLMS.cpp:115``) assign ``double`` intermediates straight into ``short``
buffers.  In C++ that conversion truncates toward zero; values outside
``short`` range are undefined behaviour.  MSVC/x86-64 (the reference's build
target) lowers ``double -> short`` as ``cvttsd2si`` into a 32-bit register
followed by a 16-bit move, which yields a precise, reproducible semantic:

    * NaN or |value| too large for int32  ->  0x80000000  ->  low 16 bits = 0
    * otherwise truncate toward zero to int32, keep the low 16 bits
      (two's-complement wrap)

``c_short`` / ``c_short_np`` implement exactly that and are the single
quantization point used everywhere the reference stores into ``short``.

``REF_PI`` is the reference's truncated pi (``#define PI 3.141592``,
e.g. ``7Band_GEQ.cpp:32``): windows/twiddles must use it in compat mode.
``FFT_PI`` is the slightly-longer pi of the from-scratch FFT program
(``FFTAlgorithm_ver2.cpp:15``).
"""

from __future__ import annotations

import numpy as np

REF_PI = 3.141592  # 7Band_GEQ.cpp:32, WienerFilter_final.cpp:41, ...
FFT_PI = 3.14159265358  # FFTAlgorithm_ver2.cpp:15

_INT32_MIN = -(2 ** 31)
_INT32_MAX = 2 ** 31 - 1


def c_short_np(x: np.ndarray) -> np.ndarray:
    """double -> short with MSVC x86-64 semantics (NumPy)."""
    x = np.asarray(x, dtype=np.float64)
    t = np.trunc(x)
    in_range = np.isfinite(t) & (t >= _INT32_MIN) & (t <= _INT32_MAX)
    i64 = np.where(in_range, t, float(_INT32_MIN)).astype(np.int64)
    return i64.astype(np.int32).astype(np.int16)  # low 16 bits, wrap


def c_short_scalar(x: float) -> int:
    """Scalar variant of :func:`c_short_np` returning a Python int."""
    t = np.trunc(float(x))
    if not (np.isfinite(t) and _INT32_MIN <= t <= _INT32_MAX):
        i = _INT32_MIN
    else:
        i = int(t)
    i &= 0xFFFF
    return i - 0x10000 if i >= 0x8000 else i


def c_short_jnp(x):
    """double/float -> short with MSVC x86-64 semantics (JAX).

    Works for f32 and f64 inputs; returns int16.
    """
    import jax.numpy as jnp

    t = jnp.trunc(x)
    in_range = jnp.isfinite(t) & (t >= _INT32_MIN) & (t <= _INT32_MAX)
    # int32 cast is safe after clamping; out-of-range/NaN forced to INT32_MIN.
    i32 = jnp.where(in_range, t, _INT32_MIN).astype(jnp.int32)
    return i32.astype(jnp.int16)  # low 16 bits, two's-complement wrap


def hamming_ref_np(n: int, pi: float = REF_PI) -> np.ndarray:
    """The reference's Hamming window: 0.54 - 0.46*cos(2*pi*i/(n-1)).

    Uses the truncated REF_PI, matching e.g. ``WienerFilter_final.cpp:189``.
    """
    i = np.arange(n, dtype=np.float64)
    return 0.54 - 0.46 * np.cos(2.0 * pi * i / (n - 1))
