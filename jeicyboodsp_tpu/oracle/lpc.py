"""Oracle for the LPC estimator.

Reference: ``LPCEstimation.cpp``.  Order-12 LPC per 256-sample block:

- analysis window = Hamming(REF_PI, /(511)) over [previous block, block]
  (``:100-106``);
- biased autocorrelation lags 0..12, each divided by (512 - lag)
  (``:108-113``);
- Yule-Walker via explicit 12x12 Toeplitz inverse (Eigen ``inverse()``,
  ``:115-126``) times -r[1..13] -- we use LU-based ``np.linalg.solve`` on the
  same matrix (Eigen's PartialPivLU equivalent to ~1e-14);
- 12 float64 coefficients per frame, written from the 2nd block on
  (``:133-136``).

No int16 truncation anywhere downstream, so FP-order differences stay at the
1e-14 level (no Eigen on this image to bit-validate against; semantics
derived from the source).
"""

from __future__ import annotations

import numpy as np

from jeicyboodsp_tpu.utils.cnum import REF_PI, hamming_ref_np

LPC_LEN = 12
BLOCK_LEN = 256


class LPCState:
    def __init__(self):
        self.keep = np.zeros(BLOCK_LEN, dtype=np.int16)
        self.iter = 0


def block_features(state: LPCState, x: np.ndarray):
    x = np.asarray(x, np.int16)
    state.iter += 1
    proc = np.concatenate([state.keep, x]).astype(np.float64)
    w = hamming_ref_np(2 * BLOCK_LEN, REF_PI)
    win = proc * w
    n = 2 * BLOCK_LEN
    r = np.zeros(LPC_LEN + 1)
    for i in range(LPC_LEN + 1):
        r[i] = np.dot(win[: n - i], win[i:n]) / (n - i)
    T = r[np.abs(np.subtract.outer(np.arange(LPC_LEN), np.arange(LPC_LEN)))]
    v = -r[1 : LPC_LEN + 1]
    feat = np.linalg.solve(T, v)
    state.keep = x.copy()
    return feat, state.iter > 1


def run(x: np.ndarray) -> np.ndarray:
    state = LPCState()
    x = np.asarray(x, np.int16)
    rows = []
    prev = np.zeros(BLOCK_LEN, np.int16)
    for s in range(0, len(x), BLOCK_LEN):
        blk = x[s : s + BLOCK_LEN]
        if len(blk) < BLOCK_LEN:
            blk = np.concatenate([blk, prev[len(blk) :]])
        prev = blk
        feat, write = block_features(state, blk)
        if write:
            rows.append(feat)
    return np.stack(rows) if rows else np.zeros((0, LPC_LEN))
