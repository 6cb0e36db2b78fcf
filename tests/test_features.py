"""MFCC / LPC / pitch: batched JAX ops vs oracles."""

import numpy as np

from jeicyboodsp_tpu.oracle import lpc as olpc
from jeicyboodsp_tpu.oracle import mfcc as omfcc
from jeicyboodsp_tpu.oracle import pitch as opitch
from jeicyboodsp_tpu.ops import features as jf


def _speech(rng, n, f0=123.0):
    t = np.arange(n) / 16000
    x = 8000 * np.sin(2 * np.pi * f0 * t) + 2000 * np.sin(2 * np.pi * 3 * f0 * t)
    return np.clip(x + rng.normal(0, 300, n), -32768, 32767).astype(np.int16)


def test_mfcc_matches_oracle(rng):
    x = _speech(rng, 1024 * 5 + 100)
    want = omfcc.run(x)
    got = jf.mfcc_run(x)
    assert want.shape == got.shape
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_lpc_matches_oracle(rng):
    x = _speech(rng, 256 * 9 + 40)
    want = olpc.run(x)
    got = jf.lpc_run(x)
    assert want.shape == got.shape
    np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-9)


def test_pitch_all_methods_match_oracle(rng):
    x = _speech(rng, 512 * 8 + 30)
    for method in (1, 2, 3):
        want = opitch.run(x, method)
        args, vals, f0s = jf.pitch_run(x, method)
        for i, (wa, wv, wf) in enumerate(want):
            assert args[i] == wa, (method, i, args[i], wa)
            np.testing.assert_allclose(vals[i], wv, rtol=1e-9)
            np.testing.assert_allclose(f0s[i], wf, rtol=1e-9)


def test_pitch_finds_period_multiple(rng):
    """Sanity: for a 125 Hz tone (lag 128) the reference's biased search --
    normalization by (1024-k) inflates long lags -- locks onto a *multiple*
    of the true period (octave errors are faithful reference behavior)."""
    x = _speech(rng, 512 * 6, f0=125.0)
    args, _, _ = jf.pitch_run(x, 3)
    near_multiple = np.abs(((args[1:] + 64) % 128) - 64) <= 2
    assert near_multiple.all(), args
