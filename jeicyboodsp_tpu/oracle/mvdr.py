"""Oracle for the 2-mic MVDR beamformer.

Reference: ``BeamForming_MVDR_ver1.cpp``.  Streaming semantics reproduced:

- 512-sample stereo blocks (two mono files), KEEP_LEN = **511**.
- VAD (``:207-242``) on the LEFT channel only, energy-only decision
  (``:233``); the keep-buffer update is dead code, so the VAD frame is
  [zeros(511), L, 0]; int16 in-place window truncation as in the other VADs.
- Noise-only blocks accumulate a broadband 2x2 spatial correlation matrix
  from the *unwindowed* FFT of [previous-noise-block, current] per channel
  (``:95-104, 244-270``); the temp buffers are only refreshed on noise
  blocks, and accumulation needs 2 consecutive noise blocks, so the pair is
  always [x[t-1], x[t]].  R is real-valued (the code stores the imaginary
  cross-terms into real cells) and NEVER reset.
- ProcessMVDR (``:124-205``): frame = [keep(511), x, 0] per channel; the
  keep quirk: the update copies ``fcLeftBefFFT[511..1021]`` which is the
  CURRENT block's FIRST 511 samples (``:195-196``).
- dTime = (800/34000)*sin(0) = 0 (``:57-60``), so the steering vector is
  [1, 1] for every bin; weights w = R^-1 c / (c^H R^-1 c) (``:170-171``).
  Until R receives noise data it is all-zero => inverse is inf/nan => the
  output quantizes to 0 (c_short of non-finite = 0).
- Weight application sequencing bug (``:180-183``): the real part is
  overwritten first and the *updated* value feeds the imaginary part:
      L0' = L0*wr - L1*wi ;  L1' = L0'*wi + L1*wr
  with (wr, wi) = (Re w, -Im w).  Reproduced verbatim.
- IFFT of the summed channels, output = samples [511..1022]/1024 truncated
  to short (``:192-194``); blocks written from the 2nd call on.
"""

from __future__ import annotations

import numpy as np

from jeicyboodsp_tpu.utils.cnum import REF_PI, c_short_np

BLOCK_LEN = 512
KEEP_LEN = 511
FFT_LEN = 1024
THRESHOLD_OF_ENERGY = 700.0
SAMPLING_RATE = 16000.0
SPEED_OF_SOUND = 34000.0
DISTANCE_OF_MIC = 800.0


def vad_left(x: np.ndarray) -> bool:
    """Energy-only VAD (BeamForming_MVDR_ver1.cpp:207-242); True = speech."""
    from jeicyboodsp_tpu.utils.cnum import hamming_ref_np

    w = hamming_ref_np(FFT_LEN, REF_PI)
    frame = np.zeros(FFT_LEN, dtype=np.int64)
    frame[KEEP_LEN : KEEP_LEN + BLOCK_LEN] = np.asarray(x, np.int64)
    s = c_short_np(frame * w).astype(np.float64)
    energy = float(np.sum(s ** 2)) / FFT_LEN
    return energy > THRESHOLD_OF_ENERGY


def _spatial_corr_update(R, tempL, tempR):
    """EstimateSpatialCorrMtx (:244-270): unwindowed 1024-pt FFTs."""
    L = np.fft.fft(np.asarray(tempL, np.float64), FFT_LEN)
    Rt = np.fft.fft(np.asarray(tempR, np.float64), FFT_LEN)
    R[0, 0] += np.sum(L.real ** 2 + L.imag ** 2) / FFT_LEN
    R[0, 1] += np.sum(-L.real * Rt.imag + L.imag * Rt.real) / FFT_LEN
    R[1, 0] += np.sum(-Rt.real * L.imag + Rt.imag * L.real) / FFT_LEN
    R[1, 1] += np.sum(Rt.real ** 2 + Rt.imag ** 2) / FFT_LEN
    return R


def _inv2(R):
    """2x2 inverse via Gaussian elimination semantics; singular -> inf/nan
    exactly as an unchecked LU would produce."""
    with np.errstate(divide="ignore", invalid="ignore"):
        det = R[0, 0] * R[1, 1] - R[0, 1] * R[1, 0]
        return (
            np.array([[R[1, 1], -R[0, 1]], [-R[1, 0], R[0, 0]]], dtype=np.complex128)
            / det
        )


class MVDRState:
    def __init__(self):
        self.noise_cnt = 0
        self.tempL = np.zeros(BLOCK_LEN, np.int16)
        self.tempR = np.zeros(BLOCK_LEN, np.int16)
        self.R = np.zeros((2, 2), np.float64)
        self.count = 0
        self.keepL = np.zeros(KEEP_LEN, np.float64)
        self.keepR = np.zeros(KEEP_LEN, np.float64)


def process_block(state: MVDRState, xl: np.ndarray, xr: np.ndarray, d_time: float = 0.0):
    """One main-loop iteration. Returns int16 block or None (first call)."""
    xl = np.asarray(xl, np.int16)
    xr = np.asarray(xr, np.int16)

    if not vad_left(xl):
        state.noise_cnt += 1
        if state.noise_cnt > 1:
            _spatial_corr_update(
                state.R,
                np.concatenate([state.tempL, xl]),
                np.concatenate([state.tempR, xr]),
            )
        state.tempL, state.tempR = xl.copy(), xr.copy()
    else:
        state.noise_cnt = 0

    state.count += 1
    frameL = np.zeros(FFT_LEN)
    frameL[:KEEP_LEN] = state.keepL
    frameL[KEEP_LEN : KEEP_LEN + BLOCK_LEN] = xl
    frameR = np.zeros(FFT_LEN)
    frameR[:KEEP_LEN] = state.keepR
    frameR[KEEP_LEN : KEEP_LEN + BLOCK_LEN] = xr
    L = np.fft.fft(frameL)
    Rf = np.fft.fft(frameR)

    Rinv = _inv2(state.R.astype(np.complex128))
    i = np.arange(FFT_LEN)
    ang = 2.0 * REF_PI * i * (SAMPLING_RATE / FFT_LEN) * d_time
    c = np.stack([np.ones(FFT_LEN, np.complex128), np.cos(ang) + 1j * np.sin(ang)])
    with np.errstate(divide="ignore", invalid="ignore"):
        w = Rinv @ c  # (2, 1024)
        denom = (np.conj(c) * w).sum(axis=0)
        w = w / denom
    wl_r, wl_i = w[0].real, -w[0].imag  # conjugated weights (:175-178)
    wr_r, wr_i = w[1].real, -w[1].imag
    # sequencing bug (:180-183): updated real feeds the imaginary part
    L0 = L.real * wl_r - L.imag * wl_i
    L1 = L0 * wl_i + L.imag * wl_r
    R0 = Rf.real * wr_r - Rf.imag * wr_i
    R1 = R0 * wr_i + Rf.imag * wr_r
    merged = (L0 + R0) + 1j * (L1 + R1)
    y = np.fft.ifft(merged).real
    out = c_short_np(y[KEEP_LEN : KEEP_LEN + BLOCK_LEN])

    state.keepL = frameL[KEEP_LEN : KEEP_LEN + KEEP_LEN].copy()  # x[0..510]!
    state.keepR = frameR[KEEP_LEN : KEEP_LEN + KEEP_LEN].copy()
    return out if state.count > 1 else None


def run(xl: np.ndarray, xr: np.ndarray, d_time: float = 0.0) -> np.ndarray:
    state = MVDRState()
    xl = np.asarray(xl, np.int16)
    xr = np.asarray(xr, np.int16)
    n = min(len(xl), len(xr))
    out = []
    prevL = np.zeros(BLOCK_LEN, np.int16)
    prevR = np.zeros(BLOCK_LEN, np.int16)
    for s in range(0, n, BLOCK_LEN):
        bl, br = xl[s : s + BLOCK_LEN], xr[s : s + BLOCK_LEN]
        if len(bl) == 0 or len(br) == 0:
            break
        if len(bl) < BLOCK_LEN:
            bl = np.concatenate([bl, prevL[len(bl) :]])
        if len(br) < BLOCK_LEN:
            br = np.concatenate([br, prevR[len(br) :]])
        prevL, prevR = bl, br
        y = process_block(state, bl, br, d_time)
        if y is not None:
            out.append(y)
    return np.concatenate(out) if out else np.zeros(0, np.int16)
