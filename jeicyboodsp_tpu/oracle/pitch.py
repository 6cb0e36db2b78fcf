"""Oracle for the three pitch estimators.

References: ``PitchEstimation_method1.cpp`` (Wiener-Khinchin autocorrelation
via FFT), ``_method2.cpp`` (AMDF, min-pick), ``_method3.cpp`` (direct
time-domain autocorrelation, max-pick).

Common streaming shape: 512-sample blocks, 512-sample keep -> 1024-sample
analysis window [previous block, current block]; lag search from 511 down to
101 (``method1:100-109``); f0 = 16000 / lag.  The programs are print-only;
the observable output is the per-block (lag, value, pitch_hz) triple.

Search-direction quirk: the scan runs downward with >= (methods 1, 3) or <=
(method 2), so among equal extrema the SMALLEST lag > 100 wins.
"""

from __future__ import annotations

import numpy as np

BLOCK = 512
PROC = 1024
FS = 16000.0
LAG_MIN_EXCLUSIVE = 100


def _search(ac: np.ndarray, pick_max: bool):
    """Replicates the descending >= / <= scan (method1:100-109)."""
    best = ac[BLOCK - 1]
    arg = 0
    for i in range(BLOCK - 1, LAG_MIN_EXCLUSIVE, -1):
        if (pick_max and ac[i] >= best) or (not pick_max and ac[i] <= best):
            arg = i
            best = ac[i]
    return arg, best


class PitchState:
    def __init__(self):
        self.keep = np.zeros(BLOCK, dtype=np.int16)


def block_method1(state: PitchState, x: np.ndarray):
    """FFT -> |X|^2 -> IFFT autocorrelation (method1:85-97)."""
    u = np.concatenate([state.keep, np.asarray(x, np.int16)]).astype(np.float64)
    X = np.fft.fft(u)
    P = X.real ** 2 + X.imag ** 2
    ac = np.fft.ifft(P).real[:BLOCK]
    state.keep = np.asarray(x, np.int16).copy()
    arg, best = _search(ac, pick_max=True)
    return arg, best, FS / arg if arg else float("inf")


def block_method2(state: PitchState, x: np.ndarray):
    """AMDF with min-pick (method2:79-95); |int - int| accumulation."""
    u = np.concatenate([state.keep, np.asarray(x, np.int16)]).astype(np.int64)
    ac = np.zeros(BLOCK, dtype=np.float64)
    for k in range(BLOCK):
        ac[k] = float(np.sum(np.abs(u[: PROC - k] - u[k:PROC]))) / (PROC - k)
    state.keep = np.asarray(x, np.int16).copy()
    arg, best = _search(ac, pick_max=False)
    return arg, best, FS / arg if arg else float("inf")


def block_method3(state: PitchState, x: np.ndarray):
    """Direct autocorrelation with max-pick (method3:79-95)."""
    u = np.concatenate([state.keep, np.asarray(x, np.int16)]).astype(np.int64)
    ac = np.zeros(BLOCK, dtype=np.float64)
    for k in range(BLOCK):
        # C accumulates int products into a double sequentially; the integer
        # products are exact, and partial sums stay below 2^53 (1024 * 2^30),
        # so any summation order gives the same double.
        ac[k] = float(np.sum(u[: PROC - k] * u[k:PROC])) / (PROC - k)
    state.keep = np.asarray(x, np.int16).copy()
    arg, best = _search(ac, pick_max=True)
    return arg, best, FS / arg if arg else float("inf")


_METHODS = {1: block_method1, 2: block_method2, 3: block_method3}


def run(x: np.ndarray, method: int):
    """Stream a signal; returns list of (lag, value, pitch_hz) per block."""
    state = PitchState()
    fn = _METHODS[method]
    x = np.asarray(x, np.int16)
    res = []
    prev = np.zeros(BLOCK, np.int16)
    for s in range(0, len(x), BLOCK):
        blk = x[s : s + BLOCK]
        if len(blk) < BLOCK:
            blk = np.concatenate([blk, prev[len(blk) :]])
        prev = blk
        res.append(fn(state, blk))
    return res
