"""Radix-2 FFT roundtrip program + AWGN harness."""

import jax
import jax.numpy as jnp
import numpy as np

from jeicyboodsp_tpu.oracle import fftprog
from jeicyboodsp_tpu.ops import awgn as jawgn
from jeicyboodsp_tpu.ops import fft as jfft


def test_roundtrip_matches_oracle_tight(rng, snr):
    """The program's output is the input plus a +-1 truncation dither whose
    sign is decided by ~1e-12 FFT rounding residue -- integer inputs sit
    exactly ON the truncation boundary, so the dither's sign is
    implementation-defined (XLA fma/scheduling vs libm).  The contract is
    therefore |diff| <= 1 with SNR far above the 60 dB bound, not bit
    equality."""
    x = np.clip(rng.normal(0, 8000, 512 * 6), -32768, 32767).astype(np.int16)
    want = fftprog.run(x)
    got = jfft.run_stream(x)
    d = want.astype(int) - got.astype(int)
    assert np.abs(d).max() <= 1
    assert snr(want, got) >= 70.0, snr(want, got)


def test_fft_matches_numpy_spectrum(rng):
    """The reference-structured FFT is a true DFT up to its truncated PI."""
    x = rng.normal(0, 100, (3, 512))
    Xr, Xi = jfft.fft_radix2(jnp.asarray(x), jnp.zeros_like(jnp.asarray(x)))
    X = np.asarray(Xr) + 1j * np.asarray(Xi)
    Xn = np.fft.fft(x)
    # truncated PI -> relative error ~N*2e-7 vs exact twiddles
    rel = np.abs(X - Xn) / np.abs(Xn).max()
    assert rel.max() < 1e-3, rel.max()


def test_awgn_statistics_and_wrap():
    key = jax.random.PRNGKey(0)
    blocks = jnp.full((20, 512), 32760, jnp.int16)  # near the int16 edge
    noisy, noise = jawgn.add_awgn(key, blocks)
    n = np.asarray(noise, np.float64)
    assert abs(n.mean()) < 0.5
    assert 8.5 < n.std() < 11.5
    # wrap semantics: 32760 + noise > 32767 wraps negative (C short store)
    over = n > 7
    assert np.all(np.asarray(noisy)[over] < 0)


def test_awgn_whiteness(rng):
    key = jax.random.PRNGKey(1)
    _, noise = jawgn.add_awgn(key, jnp.zeros((8, 512), jnp.int16))
    ratios = np.asarray(jawgn.whiteness_ratio(jnp.asarray(noise)))
    assert ratios[1:].max() < 0.25, ratios  # white: off-peak autocorr small
