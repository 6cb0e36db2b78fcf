"""Oracle for the MFCC feature extractor.

Reference: ``MFCCFeatureExtraction_auto_version1.cpp``.

Semantics reproduced:
- 1024-sample blocks, two 1024-sample analysis frames per block at 512 hop
  over [512-keep, block] (``:203-205``).
- Pre-emphasis 0.96 starting at i=1 -- frame[0] is never written and stays 0
  (``:207-210``); Hamming window with REF_PI over (WINDOW_LEN-1)=1023
  (``:211-214``); 1024-pt FFT magnitude (``:216-220``).
- 38-channel mel filterbank built from equal splits of the 0..22050 Hz mel
  axis (``HALF_SAMPLING_RATE 22050`` despite the 16 kHz target -- a real
  mismatch to preserve, ``:33,118-152``); triangular weights with the
  *next* channel edge; log energies (``:170-173``; log(0) = -inf as in C).
- 12-coefficient DCT-II variant over channels 1..38 with sqrt(2/38) factor
  (``:176-183``); sinusoidal liftering L=22 (``:185-192``).
- Output: raw f64[12] per frame appended per block; the very FIRST frame of
  the FIRST block of a run is skipped (``:95-97``; the counter is never reset
  between files, so it is once per run, not per file).
"""

from __future__ import annotations

import numpy as np

from jeicyboodsp_tpu.utils.cnum import REF_PI, hamming_ref_np

MFCC_LEN = 12
BLOCK_LEN = 1024
WINDOW_LEN = 1024
KEEP_LEN = 512
NUM_OF_FEATURE = 2
CHANNEL = 38
LIFTER_LEN = 22
HALF_SAMPLING_RATE = 22050.0
PRE_EMPHASIS = 0.96


def mel_filterbank_init():
    """MelFilterBankInit (:118-152): returns (filterbank (512,), bins (512,))."""
    unit = 1127.0 * np.log(1 + HALF_SAMPLING_RATE / 700.0) / (CHANNEL + 1)
    mel_freqs = np.zeros(CHANNEL + 1)
    for i in range(1, CHANNEL + 2):
        mel_freqs[i - 1] = 700.0 * (np.exp(unit * i / 1127.0) - 1.0)

    bins = np.zeros(KEEP_LEN, dtype=np.int64)
    k = 0
    for i in range(KEEP_LEN):
        if (i / (KEEP_LEN - 1)) * HALF_SAMPLING_RATE > mel_freqs[k]:
            if k < CHANNEL:
                k += 1
        bins[i] = k

    fb = np.zeros(KEEP_LEN)
    for i in range(KEEP_LEN):
        b = bins[i]
        f = (i / (KEEP_LEN - 1)) * HALF_SAMPLING_RATE
        if b == 0:
            fb[i] = (mel_freqs[0] - f) / (mel_freqs[0] - 0.0)
        else:
            fb[i] = (mel_freqs[b] - f) / (mel_freqs[b] - mel_freqs[b - 1])
        if fb[i] < 0:
            fb[i] = 0.0
    return fb, bins


def mel_apply(mag512: np.ndarray, fb: np.ndarray, bins: np.ndarray) -> np.ndarray:
    """MelFilterBank (:154-174) -> 38 log mel energies."""
    mel = np.zeros(CHANNEL)
    for i in range(KEEP_LEN):
        k = bins[i]
        if k == 0:
            mel[0] += (1 - fb[i]) * mag512[i]
        else:
            mel[k - 1] += fb[i] * mag512[i]
            if k != CHANNEL:
                mel[k] += (1 - fb[i]) * mag512[i]
    with np.errstate(divide="ignore"):
        return np.log(mel)


def dct_lifter(mel_log: np.ndarray) -> np.ndarray:
    """DCT (:176-183) + Liftering (:185-192)."""
    i = np.arange(1, MFCC_LEN + 1)[:, None]
    k = np.arange(1, CHANNEL + 1)[None, :]
    basis = np.sqrt(2.0 / CHANNEL) * np.cos(REF_PI * i * (k - 0.5) / CHANNEL)
    feat = (basis * mel_log[None, :]).sum(axis=1)
    lift = 1 + 0.5 * LIFTER_LEN * np.sin(REF_PI * np.arange(1, MFCC_LEN + 1) / LIFTER_LEN)
    return feat * lift


class MFCCState:
    def __init__(self):
        self.keep = np.zeros(KEEP_LEN, dtype=np.int16)
        self.fb, self.bins = mel_filterbank_init()


def block_features(state: MFCCState, x: np.ndarray) -> np.ndarray:
    """MFCCFeatureExtraction (:194-231) -> (2, 12) features for one block."""
    x = np.asarray(x, np.int16)
    proc = np.concatenate([state.keep, x]).astype(np.float64)
    w = hamming_ref_np(WINDOW_LEN, REF_PI)
    feats = np.zeros((NUM_OF_FEATURE, MFCC_LEN))
    for fidx in range(NUM_OF_FEATURE):
        seg = proc[fidx * KEEP_LEN : fidx * KEEP_LEN + WINDOW_LEN]
        frame = np.zeros(WINDOW_LEN)
        frame[1:] = seg[1:] - PRE_EMPHASIS * seg[:-1]  # frame[0] stays 0
        frame *= w
        X = np.fft.fft(frame)
        mag = np.sqrt(X.real ** 2 + X.imag ** 2)
        mel_log = mel_apply(mag[:KEEP_LEN], state.fb, state.bins)
        feats[fidx] = dct_lifter(mel_log)
    state.keep = x[BLOCK_LEN - KEEP_LEN :].copy()
    return feats


def run(x: np.ndarray, skip_first: bool = True) -> np.ndarray:
    """Stream a signal; returns (n_frames, 12) float64 features.

    ``skip_first`` mirrors the first-frame skip of the first file in a run.
    """
    state = MFCCState()
    x = np.asarray(x, np.int16)
    rows = []
    prev = np.zeros(BLOCK_LEN, np.int16)
    first = True
    for s in range(0, len(x), BLOCK_LEN):
        blk = x[s : s + BLOCK_LEN]
        if len(blk) < BLOCK_LEN:
            blk = np.concatenate([blk, prev[len(blk) :]])
        prev = blk
        f = block_features(state, blk)
        if first and skip_first:
            rows.append(f[1:])
        else:
            rows.append(f)
        first = False
    return np.concatenate(rows) if rows else np.zeros((0, MFCC_LEN))
