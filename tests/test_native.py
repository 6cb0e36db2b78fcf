"""Native compat kernels: bit-exact vs the oracles (which are bit-exact vs
the compiled reference binaries)."""

import numpy as np
import pytest

from jeicyboodsp_tpu import native
from jeicyboodsp_tpu.oracle import geq as og
from jeicyboodsp_tpu.oracle import nlms as onlms

pytestmark = pytest.mark.skipif(not native.available(), reason="no native lib")


def test_geq_native_exact():
    for seed in range(6):  # includes seeds where XLA's fma flips the JAX op
        rng = np.random.default_rng(seed)
        x = np.clip(rng.normal(0, 3000, 2048), -32768, 32767).astype(np.int16)
        want = og.run(x)
        b, a = og.calc_coefficients()
        ki = np.zeros((7, 2), np.int16)
        ko = np.zeros((7, 2), np.int16)
        got = native.geq_process(x, b, a, ki, ko)
        np.testing.assert_array_equal(want, got, err_msg=f"seed {seed}")


def test_geq_native_streaming_state():
    rng = np.random.default_rng(3)
    x = np.clip(rng.normal(0, 3000, 2048), -32768, 32767).astype(np.int16)
    b, a = og.calc_coefficients()
    ki = np.zeros((7, 2), np.int16)
    ko = np.zeros((7, 2), np.int16)
    y1 = native.geq_process(x[:1024], b, a, ki, ko)
    y2 = native.geq_process(x[1024:], b, a, ki, ko)
    ki2 = np.zeros((7, 2), np.int16)
    ko2 = np.zeros((7, 2), np.int16)
    yw = native.geq_process(x, b, a, ki2, ko2)
    np.testing.assert_array_equal(np.concatenate([y1, y2]), yw)


def test_nlms_native_exact():
    rng = np.random.default_rng(5)
    n = 1024 * 3
    x = np.clip(rng.normal(0, 3000, n), -32768, 32767).astype(np.int16)
    h = rng.normal(0, 0.1, 32)
    h[0] = 0.5
    ref = np.clip(np.convolve(x.astype(np.float64), h)[:n], -32768, 32767).astype(np.int16)
    oe, oerr = onlms.run_nlms(x, ref)
    coeff = np.zeros(256, np.float64)
    keep = np.zeros(255, np.int16)
    est, err = native.nlms_process(x, ref, coeff, keep)
    # oracle output drops block 1 (not written); native returns all blocks
    np.testing.assert_array_equal(est[1024:], oe)
    np.testing.assert_array_equal(err[1024:], oerr)


def test_bnlms_native_exact():
    rng = np.random.default_rng(6)
    n = 1024 * 3
    x = np.clip(rng.normal(0, 3000, n), -32768, 32767).astype(np.int16)
    h = rng.normal(0, 0.1, 16)
    h[0] = 0.4
    ref = np.clip(np.convolve(x.astype(np.float64), h)[:n], -32768, 32767).astype(np.int16)
    oe, oerr = onlms.run_bnlms(x, ref)
    coeff = np.zeros(128, np.float64)
    ki = np.zeros(127, np.int16)
    kr = np.zeros(127, np.int16)
    est, err = native.bnlms_process(x, ref, coeff, ki, kr)
    np.testing.assert_array_equal(est[1024:], oe)
    np.testing.assert_array_equal(err[1024:], oerr)


def test_native_stream_runner(tmp_path, rng):
    """Standalone C++ runner (no Python in the data path) == oracle."""
    import os
    import subprocess

    from jeicyboodsp_tpu.io.wav import read_pcm16, write_wav

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    runner = os.path.join(root, "native", "build", "jeicyboo_stream")
    if not os.path.exists(runner):
        subprocess.run(
            [
                "g++", "-O2", "-ffp-contract=off", "-o", runner,
                os.path.join(root, "native", "jeicyboo_stream.cpp"),
                os.path.join(root, "native", "jeicyboo_native.cpp"), "-lm",
            ],
            check=True,
            timeout=120,
        )
    x = np.clip(rng.normal(0, 3000, 4096), -32768, 32767).astype(np.int16)
    inp, out = str(tmp_path / "in.wav"), str(tmp_path / "out.pcm")
    write_wav(inp, x, 48000)
    subprocess.run([runner, "geq", inp, out, "--skip-header"], check=True, timeout=60)
    np.testing.assert_array_equal(read_pcm16(out), og.run(x))
