"""Oracle for the NLMS / BNLMS adaptive filters.

References: ``NormalLMS.cpp`` (per-sample NLMS, 256 taps) and ``BNLMS.cpp``
(block NLMS, 128 taps, double-talk gate).

NormalLMS semantics (:96-136):
- 1024-sample blocks; processing window = [255-sample keep, block].
- Per sample i: estimate y[i] = sum_j coeff[255-j] * u[j+i]  (coefficient
  array applied *reversed* against the window, :113), truncated to short
  (:115); err short = ref[i] - y_short (:116); normalization over the same
  256 window (:118-121); update coeff[j] += 2*u[j+i]*MU*err/(norm+eps)
  for all j (:124-126).  C order inside the estimate loop reproduced.
- First block's output is not written (:132-135) but state evolves.
- The *input* WAV's 44-byte header is skipped, the reference WAV's is NOT
  (:65-66) -- harness concern, not reproduced here (we take sample arrays).

BNLMS semantics (:103-186):
- Filtering pass over the block with frozen coefficients (:123-131).
- DoubleTalkState on the 1151-sample processing buffers: cross-correlation
  lags 0..1023, each summed over i < 2*1024-k -- i runs past the 1151-long
  buffers (UB read, :169).  We define out-of-bounds reads as the adjacent
  stack contents the MSVC layout would give: rgsProcessingRefer sits right
  after rgsProcessingInput is NOT guaranteed; we instead define OOB = 0 and
  document the deviation (oracle and op agree with each other; the SNR
  contract for this config excludes the UB tail by construction).
- If max correlation > 0 ("not double talk"), accumulate the gradient over
  the block, average by BLOCK_LEN, single coefficient update (:137-151).
"""

from __future__ import annotations

import numpy as np

BLOCK_LEN = 1024
NLMS_TAPS = 256
NLMS_KEEP = 255
NLMS_MU = 0.0001
NLMS_EPS = 0.0001

BNLMS_TAPS = 128
BNLMS_KEEP = 127
BNLMS_MU = 0.01
BNLMS_EPS = 0.00001


def _c_short_int(acc: float) -> int:
    t = int(acc)
    t &= 0xFFFF
    return t - 0x10000 if t >= 0x8000 else t


class NLMSState:
    def __init__(self):
        self.keep = np.zeros(NLMS_KEEP, dtype=np.int16)
        self.coeff = np.zeros(NLMS_TAPS, dtype=np.float64)
        self.iter = 0


def nlms_block(state: NLMSState, x: np.ndarray, ref: np.ndarray):
    """One LMSFilter call. Returns (est, err) int16 blocks and write flag.

    All inner sums replicate the C loops' left-to-right order and the C
    expression ``2.0 * u * MU * err / (norm + eps)`` evaluated
    left-associatively -- the int16-truncated outputs make rounding order
    observable.
    """
    state.iter += 1
    u = [float(v) for v in state.keep] + [float(v) for v in np.asarray(x, np.int16)]
    ref = np.asarray(ref, np.int16)
    est = np.zeros(BLOCK_LEN, dtype=np.int16)
    err = np.zeros(BLOCK_LEN, dtype=np.int16)
    c = list(state.coeff)
    T = NLMS_TAPS
    for i in range(BLOCK_LEN):
        acc = 0.0
        for j in range(T):  # NormalLMS.cpp:112-114
            acc += c[T - 1 - j] * u[j + i]
        y = _c_short_int(acc)
        est[i] = y
        e = int(ref[i]) - y  # int arithmetic; wrapped only at the output
        err[i] = _c_short_int(float(e))
        norm = 0.0
        for j in range(T):  # NormalLMS.cpp:119-121
            norm += u[j + i] * u[j + i]
        d = norm + NLMS_EPS
        ef = float(e)
        for j in range(T):  # NormalLMS.cpp:124-126, left-associative
            c[j] += 2.0 * u[j + i] * NLMS_MU * ef / d
    state.coeff = np.array(c, dtype=np.float64)
    state.keep = np.asarray(x, np.int16)[BLOCK_LEN - NLMS_KEEP :].copy()
    return est, err, state.iter > 1


class BNLMSState:
    def __init__(self):
        self.keep_in = np.zeros(BNLMS_KEEP, dtype=np.int16)
        self.keep_ref = np.zeros(BNLMS_KEEP, dtype=np.int16)
        self.coeff = np.zeros(BNLMS_TAPS, dtype=np.float64)
        self.iter = 0


def double_talk_state(u: np.ndarray, r: np.ndarray) -> bool:
    """BNLMS.cpp:164-186. True means double talk (no update).

    OOB reads beyond the 1151-sample buffers are defined as 0 (see module
    docstring).
    """
    n = BLOCK_LEN + BNLMS_KEEP
    up = np.zeros(2 * BLOCK_LEN, dtype=np.float64)
    rp = np.zeros(2 * BLOCK_LEN + BLOCK_LEN, dtype=np.float64)
    up[:n] = u
    rp[:n] = r
    dmax = 0.0
    for k in range(BLOCK_LEN):
        m = 2 * BLOCK_LEN - k
        acc = float(np.dot(up[:m], rp[k : k + m]))
        acc /= m
        if acc > dmax:
            dmax = acc
    return not (dmax > 0.0)


def bnlms_block(state: BNLMSState, x: np.ndarray, ref: np.ndarray):
    """One BlockLMSFilter call (BNLMS.cpp:103-162)."""
    state.iter += 1
    x = np.asarray(x, np.int16)
    ref = np.asarray(ref, np.int16)
    u = [float(v) for v in state.keep_in] + [float(v) for v in x]
    r = np.concatenate([state.keep_ref, ref]).astype(np.float64)
    est = np.zeros(BLOCK_LEN, dtype=np.int16)
    err = np.zeros(BLOCK_LEN, dtype=np.int16)
    c = list(state.coeff)
    T = BNLMS_TAPS
    for i in range(BLOCK_LEN):
        acc = 0.0
        for j in range(T):  # BNLMS.cpp:126-128
            acc += c[T - 1 - j] * u[j + i]
        y = _c_short_int(acc)
        est[i] = y
        err[i] = _c_short_int(float(int(ref[i]) - y))
    if not double_talk_state(np.array(u), r):
        grad = [0.0] * T
        for i in range(BLOCK_LEN):  # BNLMS.cpp:137-146
            norm = 0.0
            for j in range(T):
                norm += u[j + i] * u[j + i]
            d = norm + BNLMS_EPS
            ef = float(int(ref[i]) - int(est[i]))
            for j in range(T):
                grad[j] += 2.0 * u[j + i] * BNLMS_MU * ef / d
        for j in range(T):  # BNLMS.cpp:148-151
            grad[j] /= BLOCK_LEN
            c[j] += grad[j]
    state.coeff = np.array(c, dtype=np.float64)
    state.keep_in = x[BLOCK_LEN - BNLMS_KEEP :].copy()
    state.keep_ref = ref[BLOCK_LEN - BNLMS_KEEP :].copy()
    return est, err, state.iter > 1


def run_nlms(x: np.ndarray, ref: np.ndarray):
    """Stream both signals; returns (est, err) concatenated written output."""
    state = NLMSState()
    return _run(x, ref, state, nlms_block)


def run_bnlms(x: np.ndarray, ref: np.ndarray):
    state = BNLMSState()
    return _run(x, ref, state, bnlms_block)


def _run(x, ref, state, fn):
    x = np.asarray(x, np.int16)
    ref = np.asarray(ref, np.int16)
    n = min(len(x), len(ref))
    ests, errs = [], []
    prev_x = np.zeros(BLOCK_LEN, np.int16)
    prev_r = np.zeros(BLOCK_LEN, np.int16)
    for s in range(0, n, BLOCK_LEN):
        bx, br = x[s : s + BLOCK_LEN], ref[s : s + BLOCK_LEN]
        if len(bx) == 0 or len(br) == 0:
            break
        if len(bx) < BLOCK_LEN:
            bx = np.concatenate([bx, prev_x[len(bx) :]])
        if len(br) < BLOCK_LEN:
            br = np.concatenate([br, prev_r[len(br) :]])
        prev_x, prev_r = bx, br
        est, err, write = fn(state, bx, br)
        if write:
            ests.append(est)
            errs.append(err)
    if ests:
        return np.concatenate(ests), np.concatenate(errs)
    return np.zeros(0, np.int16), np.zeros(0, np.int16)
