"""Oracle for the enhancement chain: Wiener filter and spectral subtraction.

References: ``WienerFilter_final.cpp`` and ``SpectralSubtraction_final.cpp``
(identical skeleton, different gain rule).  Streaming semantics reproduced:

- 16 kHz mono int16, 512-sample blocks, 1024-pt FFT frames built from
  [previous block, current block] (``WienerFilter_final.cpp:181-190``).
- VAD (``:261-296``): frame = [zeros, x] because the keep-buffer update is
  dead code after ``return`` (``:294``) so it stays zero forever; the window
  multiply truncates to int16 in place (``:271``); ZCR at index i uses the
  *already windowed* s[i] and the *not yet windowed* s[i+1] (same loop);
  the i=1023 ZCR read is out of bounds in C -- we define it as 0.
  Speech iff energy > 700 or ZCR < 200 (``:287``).
- Noise estimator (``:120-159``): consecutive-noise-block counter; the
  estimator's keep buffer always ends up equal to the previous block, so the
  magnitude it accumulates is |FFT(w * [x[t-1], x[t]])| -- the same transform
  the filter computes.  Accumulate-then-halve from the 3rd consecutive noise
  frame (``:143-148``), latch the estimate at exactly the 10th (``:150-154``).
  The running average is never reset on speech.
- Filter (``:162-235``): first call returns without output; per bin
  Wiener gain 1 - min(1, Pn/Px) applied to |X| with saved phase
  (``:200-213``); spectral subtraction is |X| - N with *no floor*
  (``SpectralSubtraction_final.cpp:238``); overlap-add of successive
  IFFTs with 512-sample shift (``:218-227``); output written from the 3rd
  call on; double -> short truncation at the output (``:223``).
"""

from __future__ import annotations

import numpy as np

from jeicyboodsp_tpu.utils.cnum import REF_PI, c_short_np, hamming_ref_np

BLOCK_LEN = 512
FFT_SIZE = 1024
THRESHOLD_OF_ENERGY = 700.0
THRESHOLD_OF_ZCR = 200.0
NOISE_ESTIMATION_FRAMECOUNT = 10


def vad(x: np.ndarray) -> bool:
    """Energy+ZCR VAD on [zeros, x] (WienerFilter_final.cpp:261-296).

    Returns True for speech.
    """
    w = hamming_ref_np(FFT_SIZE, REF_PI)
    frame = np.zeros(FFT_SIZE, dtype=np.int64)
    frame[BLOCK_LEN:] = np.asarray(x, dtype=np.int64)
    raw = frame.copy()
    # in-place windowed truncation; ZCR pairs windowed s[i] with raw s[i+1]
    s = c_short_np(frame * w).astype(np.int64)
    energy = float(np.sum(s.astype(np.float64) ** 2)) / FFT_SIZE
    nxt = np.concatenate([raw[1:], [0]])  # index 1023 pairs with OOB -> 0
    zcr = int(np.sum((s * nxt) < 0))
    return energy > THRESHOLD_OF_ENERGY or zcr < THRESHOLD_OF_ZCR


class EnhanceState:
    def __init__(self):
        self.noise_cnt = 0  # main-loop iNumOfIteration
        self.temp = np.zeros(BLOCK_LEN, dtype=np.int16)  # first noise block
        self.est_keep = np.zeros(BLOCK_LEN, dtype=np.int16)
        self.avg_ns = np.zeros(FFT_SIZE, dtype=np.float64)
        self.latched_ns = np.zeros(FFT_SIZE, dtype=np.float64)
        self.filt_iter = 0
        self.filt_keep = np.zeros(BLOCK_LEN, dtype=np.int16)
        self.overlap = np.zeros(FFT_SIZE, dtype=np.float64)


def _windowed_fft(keep: np.ndarray, x: np.ndarray) -> np.ndarray:
    w = hamming_ref_np(FFT_SIZE, REF_PI)
    frame = np.concatenate([keep, x]).astype(np.float64) * w
    return np.fft.fft(frame)


def _estimate_noise(state: EnhanceState, x: np.ndarray) -> None:
    """EstimateNoiseSpectrum (WienerFilter_final.cpp:120-159)."""
    if state.noise_cnt == 2:
        state.est_keep = state.temp.copy()
    X = _windowed_fft(state.est_keep, x)
    state.avg_ns = state.avg_ns + np.abs(X)
    if state.noise_cnt >= 3:
        state.avg_ns = state.avg_ns / 2.0
    if state.noise_cnt == NOISE_ESTIMATION_FRAMECOUNT:
        state.latched_ns = state.avg_ns.copy()
    state.est_keep = np.asarray(x, dtype=np.int16).copy()


def _filter_block(state: EnhanceState, x: np.ndarray, mode: str):
    """WienerFiltering / SpectralSubtraction (:162-235 / :201-264)."""
    state.filt_iter += 1
    if state.filt_iter == 1:
        state.filt_keep = np.asarray(x, dtype=np.int16).copy()
        return None
    X = _windowed_fft(state.filt_keep, x)
    phase = np.arctan2(X.imag, X.real)
    with np.errstate(divide="ignore", invalid="ignore"):
        if mode == "wiener":
            P = X.real ** 2 + X.imag ** 2
            v = state.latched_ns ** 2 / P  # 0/0 -> nan, k/0 -> inf (as in C)
            v = np.where(v >= 1.0, 1.0, v)  # nan >= 1.0 is False -> nan kept
            amp = np.abs(np.sqrt(P)) * (1.0 - v)
        elif mode == "specsub":
            amp = np.abs(X) - state.latched_ns
        else:
            raise ValueError(mode)
    Y = amp * np.cos(phase) + 1j * amp * np.sin(phase)
    y = np.fft.ifft(Y).real  # == FFTW backward / FFT_SIZE
    state.overlap = state.overlap + y
    out = c_short_np(state.overlap[:BLOCK_LEN])
    state.overlap = np.concatenate([state.overlap[BLOCK_LEN:], np.zeros(BLOCK_LEN)])
    state.filt_keep = np.asarray(x, dtype=np.int16).copy()
    return out if state.filt_iter >= 3 else None


def process_block(state: EnhanceState, x: np.ndarray, mode: str = "wiener"):
    """One main-loop iteration (WienerFilter_final.cpp:91-112).

    Returns the output block (int16) or None when not written.
    """
    x = np.asarray(x, dtype=np.int16)
    if not vad(x):
        state.noise_cnt += 1
        if state.noise_cnt == 1:
            state.temp = x.copy()
        else:
            _estimate_noise(state, x)
    else:
        state.noise_cnt = 0
    return _filter_block(state, x, mode)


def run(x: np.ndarray, mode: str = "wiener") -> np.ndarray:
    """Stream a whole signal; returns the concatenated written output."""
    state = EnhanceState()
    x = np.asarray(x, dtype=np.int16)
    out = []
    prev_block = np.zeros(BLOCK_LEN, dtype=np.int16)
    for s in range(0, len(x), BLOCK_LEN):
        blk = x[s : s + BLOCK_LEN]
        if len(blk) < BLOCK_LEN:  # stale fread tail, as in the C main loop
            blk = np.concatenate([blk, prev_block[len(blk) :]])
        prev_block = blk
        y = process_block(state, blk, mode)
        if y is not None:
            out.append(y)
    return np.concatenate(out) if out else np.zeros(0, np.int16)
