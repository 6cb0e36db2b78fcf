"""Oracle-vs-reference-binary regression tests.

Each oracle is compared against the actual reference program compiled on
this machine (bench/ref_cpp: FFTW shim; Eigen shim for MVDR/LPC).  These
are the ground-truth anchors for every compat contract in the framework.
Skipped wholesale if the binaries can't be built.
"""

import os
import re
import subprocess

import numpy as np
import pytest

from jeicyboodsp_tpu.io.wav import read_pcm16, write_pcm16, write_wav

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BIN = os.path.join(ROOT, "bench", "ref_cpp", "bin")


def _bin(name):
    p = os.path.join(BIN, name)
    if not os.path.exists(p):
        try:
            subprocess.run(
                [os.path.join(ROOT, "bench", "ref_cpp", "build.sh")],
                check=True,
                capture_output=True,
                timeout=300,
            )
        except Exception:
            pass
    if not os.path.exists(p):
        pytest.skip(f"reference binary {name} unavailable")
    return p


def _run(binary, *args):
    return subprocess.run(
        [binary, *args],
        stdin=subprocess.DEVNULL,
        capture_output=True,
        timeout=300,
    )


def test_geq_binary_exact(tmp_path, rng):
    x = np.clip(rng.normal(0, 3000, 48000 + 300), -32768, 32767).astype(np.int16)
    inp = str(tmp_path / "in.wav")
    out = str(tmp_path / "out.pcm")
    write_wav(inp, x, 48000)
    _run(_bin("geq"), inp, out)
    from jeicyboodsp_tpu.oracle import geq

    np.testing.assert_array_equal(read_pcm16(out), geq.run(x))


@pytest.mark.parametrize("prog,mode", [("wiener", "wiener"), ("specsub", "specsub")])
def test_enhance_binary_exact(tmp_path, rng, prog, mode):
    n = 16000 * 2 + 137
    t = np.arange(n) / 16000
    speech = 5000 * np.sin(2 * np.pi * 313 * t) * (t > 0.8)
    x = np.clip(speech + rng.normal(0, 20, n), -32768, 32767).astype(np.int16)
    inp = str(tmp_path / "in.pcm")  # header NOT skipped by these programs
    out = str(tmp_path / "out.pcm")
    write_pcm16(inp, x)
    _run(_bin(prog), inp, out)
    from jeicyboodsp_tpu.oracle import enhance

    np.testing.assert_array_equal(read_pcm16(out), enhance.run(x, mode))


def test_fastconv_binary_tight(tmp_path, rng):
    x = np.clip(rng.normal(0, 1500, 1024 * 16), -32768, 32767).astype(np.int16)
    inp = str(tmp_path / "in.wav")
    out = str(tmp_path / "out.pcm")
    write_wav(inp, x, 16000)
    _run(_bin("fastconv"), inp, out)
    from jeicyboodsp_tpu.oracle import fastconv

    want = read_pcm16(out)
    got = fastconv.run(x)
    d = want.astype(int) - got.astype(int)
    assert np.abs(d).max() <= 1 and (d != 0).mean() < 3e-3  # FFT-lib ulps


def test_nlms_bnlms_binary_exact(tmp_path, rng):
    n = 1024 * 4
    x = np.clip(rng.normal(0, 3000, n), -32768, 32767).astype(np.int16)
    h = rng.normal(0, 0.1, 32)
    h[0] = 0.5
    ref = np.clip(np.convolve(x.astype(np.float64), h)[:n], -32768, 32767).astype(np.int16)
    inp = str(tmp_path / "in.wav")  # input header skipped, ref not
    rp = str(tmp_path / "ref.pcm")
    write_wav(inp, x, 16000)
    write_pcm16(rp, ref)
    from jeicyboodsp_tpu.oracle import nlms

    for prog, fn in (("nlms", nlms.run_nlms), ("bnlms", nlms.run_bnlms)):
        est_p = str(tmp_path / f"{prog}_est.pcm")
        err_p = str(tmp_path / f"{prog}_err.pcm")
        _run(_bin(prog), inp, rp, est_p, err_p)
        est, err = fn(x, ref)
        np.testing.assert_array_equal(read_pcm16(est_p), est)
        np.testing.assert_array_equal(read_pcm16(err_p), err)


def test_mvdr_binary_tight(tmp_path, rng):
    n = 512 * 20
    t = np.arange(n) / 16000
    speech = 6000 * np.sin(2 * np.pi * 400 * t) * (t > 0.25)
    xl = np.clip(speech + rng.normal(0, 15, n), -32768, 32767).astype(np.int16)
    xr = np.clip(0.8 * speech + rng.normal(0, 15, n), -32768, 32767).astype(np.int16)
    lp, rp2, op = (str(tmp_path / p) for p in ("l.wav", "r.wav", "o.pcm"))
    write_wav(lp, xl, 16000)
    write_wav(rp2, xr, 16000)
    _run(_bin("mvdr"), lp, rp2, op)
    from jeicyboodsp_tpu.oracle import mvdr

    want = read_pcm16(op)
    got = mvdr.run(xl, xr)
    d = want.astype(int) - got.astype(int)
    assert np.abs(d).max() <= 1 and (d != 0).mean() < 0.01


def test_lpc_binary_close(tmp_path, rng):
    x = np.clip(rng.normal(0, 4000, 256 * 50), -32768, 32767).astype(np.int16)
    inp, out = str(tmp_path / "in.wav"), str(tmp_path / "out.bin")
    write_wav(inp, x, 16000)
    _run(_bin("lpc"), inp, out)
    from jeicyboodsp_tpu.oracle import lpc

    want = np.fromfile(out, dtype="<f8").reshape(-1, 12)
    got = lpc.run(x)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)


def test_fft_roundtrip_binary_exact(tmp_path, rng):
    x = np.clip(rng.normal(0, 8000, 512 * 8), -32768, 32767).astype(np.int16)
    inp, out = str(tmp_path / "in.wav"), str(tmp_path / "out.pcm")
    write_wav(inp, x, 16000)
    _run(_bin("fft"), inp, out)
    from jeicyboodsp_tpu.oracle import fftprog

    np.testing.assert_array_equal(read_pcm16(out), fftprog.run(x))


@pytest.mark.parametrize("method", [1, 2, 3])
def test_pitch_binary_exact(tmp_path, rng, method):
    n = 512 * 10
    t = np.arange(n) / 16000
    x = np.clip(
        8000 * np.sin(2 * np.pi * 123 * t) + rng.normal(0, 300, n), -32768, 32767
    ).astype(np.int16)
    inp = str(tmp_path / "in.wav")
    write_wav(inp, x, 16000)
    r = _run(_bin(f"pitch{method}"), inp)
    ref = [
        (int(a), float(b))
        for a, b in re.findall(r"Estimation arg (\d+) , dMin ([-\d.e+]+) pitch", r.stdout.decode())
    ]
    from jeicyboodsp_tpu.oracle import pitch

    mine = pitch.run(x, method)
    assert len(ref) == len(mine)
    for (ra, rv), (ma, mv, _) in zip(ref, mine):
        assert ra == ma
        np.testing.assert_allclose(rv, mv, rtol=1e-5)


def test_mfcc_binary_close(tmp_path, rng):
    n = 1024 * 80  # long: the program segfaults at EOF and loses buffered tail
    t = np.arange(n) / 16000
    x = np.clip(
        5000 * np.sin(2 * np.pi * 700 * t) + rng.normal(0, 800, n), -32768, 32767
    ).astype(np.int16)
    wav = str(tmp_path / "in.wav")
    mfc = str(tmp_path / "out.mfc")
    lst = str(tmp_path / "list.txt")
    write_wav(wav, x, 16000)
    open(lst, "w").write(f"{wav} {mfc}\n")
    _run(_bin("mfcc"), lst)  # exits by segfault after writing (reference quirk)
    want = np.fromfile(mfc, dtype="<f8").reshape(-1, 12)
    assert len(want) > 50
    from jeicyboodsp_tpu.oracle import mfcc

    got = mfcc.run(x)[: len(want)]
    np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-9)


def test_geq_wrap_stress_binary_exact(tmp_path, rng):
    """Full-scale random input drives the int16 wrap path (+12dB boosts
    overflow); oracle must still match the binary byte-for-byte."""
    x = rng.integers(-32768, 32768, 48000, dtype=np.int64).astype(np.int16)
    inp, out = str(tmp_path / "in.wav"), str(tmp_path / "out.pcm")
    write_wav(inp, x, 48000)
    _run(_bin("geq"), inp, out)
    from jeicyboodsp_tpu.oracle import geq

    np.testing.assert_array_equal(read_pcm16(out), geq.run(x))


def test_enhance_silence_nan_path_binary_exact(tmp_path):
    """All-zero input: the Wiener gain hits the 0/0 NaN path every bin and
    the output quantizes to zeros -- byte-equal to the binary."""
    x = np.zeros(512 * 6, np.int16)
    inp, out = str(tmp_path / "in.pcm"), str(tmp_path / "out.pcm")
    write_pcm16(inp, x)
    _run(_bin("wiener"), inp, out)
    from jeicyboodsp_tpu.oracle import enhance

    np.testing.assert_array_equal(read_pcm16(out), enhance.run(x, "wiener"))
    assert (read_pcm16(out) == 0).all()
