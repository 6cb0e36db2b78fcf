"""Oracle for the 7-band graphic EQ (reference: ``7Band_GEQ.cpp``).

Reproduces the reference's exact streaming semantics:

- 48 kHz mono int16, 512-sample blocks (``7Band_GEQ.cpp:43``).
- 7 biquads: band0 bass shelf (booster since gain=+12, ``144-159``),
  band6 treble shelf (cut since gain=-12, ``193-210``), bands1-5 peak
  (``212-249``); Q=4.318, ROOT2=1/Q (``45,59``).
- Quirks reproduced verbatim:
  * peak-filter a2 uses ``K_band[k-1]`` instead of ``K_band[k]``
    (``7Band_GEQ.cpp:231,247``);
  * direct-form-I output is quantized to ``short`` *inside* the recursion
    (``284``), so the feedback path runs on int16 values;
  * each band's input is the previous band's quantized int16 output
    (``300``).
- Per-band carried state: last 2 input and 2 output samples (int16),
  ``7Band_GEQ.cpp:261-262,288-289``.
"""

from __future__ import annotations

import math

import numpy as np

from jeicyboodsp_tpu.utils.cnum import REF_PI

SAMPLING_RATE = 48000.0  # 7Band_GEQ.cpp:33
TOTAL_BANDS = 7
BLOCK_LEN = 512  # 7Band_GEQ.cpp:43
Q = 4.318  # 7Band_GEQ.cpp:45
ROOT2 = 1.0 / Q  # 7Band_GEQ.cpp:59
CENTER_FREQS = (44.0, 125.0, 250.0, 500.0, 2000.0, 6000.0, 11313.0)  # :47
GAINS_DB = (12.0, 12.0, 0.0, 0.0, 3.0, 0.0, -12.0)  # 7Band_GEQ.cpp:51-57


def calc_coefficients(
    gains_db=GAINS_DB, center_freqs=CENTER_FREQS, fs=SAMPLING_RATE, compat: bool = True
):
    """Return (b, a) arrays of shape (7, 3), a[:,0] == 0 as in the reference.

    ``compat=True`` reproduces the reference's coefficient quirks
    (``K_band[k-1]`` in peak a2; V-vs-K mixups in the bass-cut branch);
    ``compat=False`` computes the textbook formulas.
    """
    K = [math.tan(REF_PI * f / fs) for f in center_freqs]
    # 7Band_GEQ.cpp:139-142 -- invert gain if a cut, so V >= 1 always
    V = [10.0 ** (g / 20.0) for g in gains_db]
    V = [1.0 / v if v < 1 else v for v in V]
    G = list(gains_db)
    r = ROOT2

    b = np.zeros((TOTAL_BANDS, 3), dtype=np.float64)
    a = np.zeros((TOTAL_BANDS, 3), dtype=np.float64)

    # --- band 0: bass shelf (7Band_GEQ.cpp:144-175)
    k0, v0 = K[0], V[0]
    if G[0] > 0:  # booster, :144-159
        d = 1 + r * k0 + k0 ** 2
        b[0] = [
            (1 + math.sqrt(v0) * r * k0 + v0 * k0 ** 2) / d,
            (2 * (v0 * k0 ** 2 - 1)) / d,
            (1 - math.sqrt(v0) * r * k0 + v0 * k0 ** 2) / d,
        ]
        a[0] = [0.0, (2 * (k0 ** 2 - 1)) / d, (1 - r * k0 + k0 ** 2) / d]
    else:  # cut, :160-175 (reference has V/K mixups in a1/a2 -- compat quirk)
        d = 1 + r * math.sqrt(v0) * k0 + v0 * k0 ** 2
        b[0] = [
            (1 + r * k0 + k0 ** 2) / d,
            (2 * (k0 ** 2 - 1)) / d,
            (1 - r * k0 + k0 ** 2) / d,
        ]
        if compat:
            # 7Band_GEQ.cpp:173-174: uses K_band[0] where V_band[0] belongs
            a[0] = [
                0.0,
                (2 * (k0 * k0 ** 2 - 1)) / d,
                (1 - r * math.sqrt(k0) * k0 + k0 * k0 ** 2) / d,
            ]
        else:
            a[0] = [
                0.0,
                (2 * (v0 * k0 ** 2 - 1)) / d,
                (1 - r * math.sqrt(v0) * k0 + v0 * k0 ** 2) / d,
            ]

    # --- band 6: treble shelf (7Band_GEQ.cpp:177-210)
    k6, v6 = K[6], V[6]
    if G[6] > 0:  # booster, :177-192
        d = 1 + r * k6 + k6 ** 2
        b[6] = [
            (v6 + r * math.sqrt(v6) * k6 + k6 ** 2) / d,
            (2 * (k6 ** 2 - v6)) / d,
            (v6 - r * math.sqrt(v6) * k6 + k6 ** 2) / d,
        ]
        a[6] = [0.0, (2 * (k6 ** 2 - 1)) / d, (1 - r * k6 + k6 ** 2) / d]
    else:  # cut, :193-210
        d = v6 + r * math.sqrt(v6) * k6 + k6 ** 2
        b[6] = [
            (1 + r * k6 + k6 ** 2) / d,
            (2 * (k6 ** 2 - 1)) / d,
            (1 - r * k6 + k6 ** 2) / d,
        ]
        d2 = 1 + r / math.sqrt(v6) * k6 + (k6 ** 2) / v6
        a[6] = [
            0.0,
            (2 * ((k6 ** 2) / v6 - 1)) / d2,
            (1 - r / math.sqrt(v6) * k6 + (k6 ** 2) / v6) / d2,
        ]

    # --- bands 1..5: peak/notch (7Band_GEQ.cpp:212-249)
    for kk in range(1, 6):
        kb, vb = K[kk], V[kk]
        ka2 = K[kk - 1] if compat else kb  # quirk: 7Band_GEQ.cpp:231,247
        if G[kk] > 0:  # boost peak, :217-232
            d = 1 + (1 / Q) * kb + kb ** 2
            b[kk] = [
                (1 + (vb / Q) * kb + kb ** 2) / d,
                (2 * (kb ** 2 - 1)) / d,
                (1 - (vb / Q) * kb + kb ** 2) / d,
            ]
            a[kk] = [0.0, b[kk][1], (1 - (1 / Q) * ka2 + kb ** 2) / d]
        else:  # cut peak, :233-248
            d = 1 + (vb / Q) * kb + kb ** 2
            b[kk] = [
                (1 + (1.0 / Q) * kb + kb ** 2) / d,
                (2 * (kb ** 2 - 1)) / d,
                (1 - (1.0 / Q) * kb + kb ** 2) / d,
            ]
            a[kk] = [0.0, b[kk][1], (1 - (vb / Q) * ka2 + kb ** 2) / d]

    return b, a


class GEQState:
    """Per-band int16 keep buffers (7Band_GEQ.cpp:261-262)."""

    def __init__(self):
        self.keep_in = np.zeros((TOTAL_BANDS, 2), dtype=np.int16)
        self.keep_out = np.zeros((TOTAL_BANDS, 2), dtype=np.int16)


def process_block(state: GEQState, x: np.ndarray, b: np.ndarray, a: np.ndarray) -> np.ndarray:
    """One 512-sample block through the 7-band cascade (ApplyIirGEQ, :259-332)."""
    n = len(x)
    cur = np.asarray(x, dtype=np.int16)
    out_buf = None
    for k in range(TOTAL_BANDS):
        in_buf = np.concatenate([state.keep_in[k], cur]).astype(np.int64)
        out_buf = np.zeros(n + 2, dtype=np.int64)
        out_buf[:2] = state.keep_out[k]
        b0, b1, b2 = b[k]
        _, a1, a2 = a[k]
        # The C loop (7Band_GEQ.cpp:279-286) interleaves b- and a-terms:
        #   acc = b2*x[j] - a2*y[j] + b1*x[j+1] - a1*y[j+1] + b0*x[j+2]
        # evaluated left-to-right; the accumulation ORDER matters because the
        # result is truncated to int16 and fed back -- a different order can
        # flip a truncation boundary.  Reproduce it exactly.
        xb = [float(v) for v in in_buf]
        ob = [int(v) for v in out_buf[:2]] + [0] * n  # python ints (hot loop)
        b0f, b1f, b2f, a1f, a2f = float(b0), float(b1), float(b2), float(a1), float(a2)
        for j in range(n):
            acc = b2f * xb[j]
            acc -= a2f * ob[j]
            acc += b1f * xb[j + 1]
            acc -= a1f * ob[j + 1]
            acc += b0f * xb[j + 2]
            # 7Band_GEQ.cpp:284 -- double->short truncation (values here are
            # always in int32 range, so the plain C path applies)
            t = int(acc)
            t &= 0xFFFF
            ob[j + 2] = t - 0x10000 if t >= 0x8000 else t
        out_buf[:] = ob
        state.keep_in[k] = in_buf[-2:].astype(np.int16)
        state.keep_out[k] = out_buf[-2:].astype(np.int16)
        cur = out_buf[2:].astype(np.int16)  # requantized inter-band signal, :300
    return cur


def run(x: np.ndarray, gains_db=GAINS_DB, compat: bool = True) -> np.ndarray:
    """Stream a whole int16 signal through the EQ in 512-sample blocks.

    Mirrors ``main`` (7Band_GEQ.cpp:119-127): a final partial block is
    processed as a full block (fread fills only the leading samples; the
    remainder keeps the previous block's contents -- we reproduce that by
    carrying the previous block's tail).
    """
    b, a = calc_coefficients(gains_db=gains_db, compat=compat)
    state = GEQState()
    x = np.asarray(x, dtype=np.int16)
    out = []
    prev_block = np.zeros(BLOCK_LEN, dtype=np.int16)
    for start in range(0, len(x), BLOCK_LEN):
        blk = x[start : start + BLOCK_LEN]
        if len(blk) < BLOCK_LEN:  # stale tail of the C input buffer
            blk = np.concatenate([blk, prev_block[len(blk) :]])
        prev_block = blk
        out.append(process_block(state, blk, b, a))
    return np.concatenate(out) if out else np.zeros(0, dtype=np.int16)
