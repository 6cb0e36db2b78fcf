"""Oracle for the from-scratch radix-2 FFT program.

Reference: ``FFTAlgorithm_ver2.cpp``.  The program streams 512-sample blocks
through its own decimation-in-time radix-2 FFT (bit-reversal permutation
first, butterflies, then inter-stage twiddles with PI = 3.14159265358,
``:15``) forward and backward, divides by N and truncates to short
(``:79-83``).  Because the twiddles use a truncated PI and the round trip
is not exact, the output differs from the input by data-dependent -1/+1
truncation steps -- reproducing those requires this exact FFT, which is
transliterated here (vectorized per stage; every element's arithmetic keeps
the C expression order).
"""

from __future__ import annotations

import numpy as np

from jeicyboodsp_tpu.utils.cnum import FFT_PI, c_short_np

BLOCK_LEN = 512


def bitrev_indices(n: int) -> np.ndarray:
    """Bitrev (:186-207), from katjaas.nl bit reversal."""
    bits = int(np.log2(n))
    out = np.zeros(n, dtype=np.int64)
    for k in range(n):
        temp = k
        b = k
        for _ in range(1, bits):
            temp >>= 1
            b <<= 1
            b |= temp & 1
        out[k] = b & (n - 1)
    return out


def fft_ref(x: np.ndarray, forward: bool) -> np.ndarray:
    """FFTProcess (:94-149) on a complex array (unnormalized both ways)."""
    n = len(x)
    out = x[bitrev_indices(n)].astype(np.complex128)
    re = out.real.copy()
    im = out.imag.copy()
    npoint = n // 2
    sign = -1.0 if forward else 1.0
    while True:
        n2 = n // npoint
        n1 = n2 // 2
        n3 = n2 * 2
        idx = (n2 * np.arange(npoint)[:, None] + np.arange(n1)[None, :]).ravel()
        ar, ai = re[idx].copy(), im[idx].copy()
        br, bi = re[idx + n1].copy(), im[idx + n1].copy()
        re[idx] = ar + br
        im[idx] = ai + bi
        re[idx + n1] = ar - br
        im[idx + n1] = ai - bi
        if npoint == 1:
            break
        k = np.arange(npoint // 2)[:, None]
        nn = np.arange(n2)[None, :]
        idx2 = (k * n3 + n2 + nn).ravel()
        ang = sign * 2.0 * FFT_PI * np.broadcast_to(nn, (npoint // 2, n2)).ravel() / float(n3)
        c, s = np.cos(ang), np.sin(ang)
        tr, ti = re[idx2].copy(), im[idx2].copy()
        re[idx2] = c * tr - s * ti
        im[idx2] = c * ti + s * tr
        npoint //= 2
    return re + 1j * im


def roundtrip_block(x: np.ndarray) -> np.ndarray:
    """main (:62-86): FFT -> IFFT -> /N -> short truncation."""
    inp = np.asarray(x, np.int16).astype(np.complex128)
    X = fft_ref(inp, forward=True)
    y = fft_ref(X, forward=False)
    return c_short_np(y.real / float(BLOCK_LEN))


def run(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, np.int16)
    out = []
    prev = np.zeros(BLOCK_LEN, np.int16)
    for s in range(0, len(x), BLOCK_LEN):
        blk = x[s : s + BLOCK_LEN]
        if len(blk) < BLOCK_LEN:
            blk = np.concatenate([blk, prev[len(blk) :]])
        prev = blk
        out.append(roundtrip_block(blk))
    return np.concatenate(out) if out else np.zeros(0, np.int16)
