"""Oracle for the HMM/Viterbi decoder.

Reference: ``Viterbi_version1.cpp``.  6 states, each a 4-mixture PCA-4 GMM
emission, 6x6 transition matrix.  Quirks reproduced verbatim:

- Recursion (``:196``) applies ``log()`` to the ALREADY-log accumulated
  probability: score = log(P[u][t-1]) + log(trans[u][m]) + log(emission).
  When the accumulated log-prob is negative this is log(negative) = NaN and
  the NaN propagates through the < comparisons exactly as IEEE dictates
  (both orderings False -> the u=0 candidate sticks).
- "Backtrace" (``:209-225``) re-finds the argmax state at every time step
  instead of following prevIdx; prevIdx is computed but effectively unused.
- ``dDecodingReslt[0]`` is never written (loop stops at i>0) -> state 0.
- The returned score is the max accumulated value at t=1 (the last loop
  iteration), not at t=T-1 (``:245``).
"""

from __future__ import annotations

import numpy as np

from jeicyboodsp_tpu.oracle.gmm import NUM_OF_MIXTURE, PCA_LEN_TEST
from jeicyboodsp_tpu.utils.cnum import REF_PI

NUM_OF_STATE = 6


def gmm_emission(x: np.ndarray, alpha, mean, cov_diag4, eigvec4) -> float:
    """Sum over mixtures of the PCA-4 diagonal Gaussian (Viterbi :248-267)."""
    s = 0.0
    for k in range(NUM_OF_MIXTURE):
        xp = x @ eigvec4[k]
        with np.errstate(invalid="ignore", divide="ignore"):
            terms = (
                (1.0 / np.sqrt(2.0 * REF_PI))
                * (1.0 / np.sqrt(cov_diag4[k]))
                * np.exp(-0.5 * (xp - mean[k][:PCA_LEN_TEST]) ** 2 / cov_diag4[k])
            )
        s += alpha[k] * float(np.prod(terms))
    return s


def hmm_decode(frames: np.ndarray, states: list, trans: np.ndarray):
    """HMMRecognition (:157-246).

    ``states``: list of 6 (alpha, mean, cov_diag4, eigvec4) tuples.
    Returns (path (T-1,), score) with the reference's quirks.
    """
    T = len(frames)
    P = np.zeros((NUM_OF_STATE, T))
    with np.errstate(invalid="ignore", divide="ignore"):
        for m in range(NUM_OF_STATE):
            P[m, 0] = np.log(gmm_emission(frames[0], *states[m])) + np.log(1.0 / NUM_OF_STATE)
        for t in range(1, T):
            for m in range(NUM_OF_STATE):
                emis = gmm_emission(frames[t], *states[m])
                for u in range(NUM_OF_STATE):
                    # quirk: log of the already-log accumulated probability
                    cand = np.log(P[u, t - 1]) + np.log(trans[u, m]) + np.log(emis)
                    if u == 0:
                        P[m, t] = cand
                    elif P[m, t] < cand:  # NaN-safe exactly as C
                        P[m, t] = cand

    # "backtrace": re-finds the per-time argmax (prevIdx unused).  The C
    # result buffer has length T-1; the loop writes indices T-1..1, so the
    # t = T-1 store is out of bounds (lost) and index 0 is never written
    # (stays 0 from memset).  The printed path is therefore
    # [0, argmax(P[:,1]), ..., argmax(P[:,T-2])].
    path = np.zeros(max(T - 1, 0), dtype=np.int64)
    score = 0.0
    for t in range(T - 1, 0, -1):
        best, arg = P[0, t], 0
        for m in range(1, NUM_OF_STATE):
            if P[m, t] > best:  # NaN-safe exactly as C
                best, arg = P[m, t], m
        score = best  # last iteration (t=1) value is returned (:245)
        if t <= T - 2:
            path[t] = arg
    return path, score
