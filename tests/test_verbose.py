"""--verbose compat diagnostics (VERDICT r2 item 7): the CLI's reference-
format print surfaces, anchored against the compiled reference binaries'
actual stdout where capturable (L6 print-surface parity)."""

import os
import re
import subprocess

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BIN = os.path.join(ROOT, "bench", "ref_cpp", "bin")


def _bin(name):
    p = os.path.join(BIN, name)
    if not os.path.exists(p):
        pytest.skip(f"reference binary {name} unavailable")
    return p


def _run(binary, *args):
    return subprocess.run(
        [binary, *args], stdin=subprocess.DEVNULL, capture_output=True, timeout=300
    )


def _wav(path, x):
    with open(path, "wb") as f:
        np.zeros(22, np.int16).tofile(f)
        np.asarray(x, np.int16).tofile(f)


def test_fft_verbose_counts_match_binary(tmp_path, rng, capsys):
    """FFT op-count lines: one per FFTProcess call (forward AND inverse per
    block), counts replicated from the reference's counting loops."""
    from jeicyboodsp_tpu.pipelines.registry import fft_roundtrip

    x = np.clip(rng.normal(0, 3000, 512 * 5), -32768, 32767).astype(np.int16)
    inp = str(tmp_path / "in.wav")
    _wav(inp, x)
    ref_out = _run(_bin("fft"), inp, str(tmp_path / "ref.pcm")).stdout.decode(errors="replace")
    want = re.findall(r"(\d+)-point FFT Calculation add (\d+) multiply (\d+)", ref_out)
    assert want, ref_out[:200]

    fft_roundtrip(inp, str(tmp_path / "got.pcm"), verbose=True)
    got = re.findall(
        r"(\d+)-point FFT Calculation add (\d+) multiply (\d+)", capsys.readouterr().out
    )
    assert got == want  # same number of calls, same counts, same order


def test_nlms_verbose_coeffs_match_binary(tmp_path, rng, capsys):
    """Per-block coefficient prints: the verbose path steps the bit-exact
    native kernel block by block, so the printed trajectory equals the
    reference binary's to the last %f digit."""
    from jeicyboodsp_tpu.pipelines.registry import nlms

    n = 1024 * 4
    x = np.clip(rng.normal(0, 3000, n), -32768, 32767).astype(np.int16)
    h = rng.normal(0, 0.1, 32)
    h[0] = 0.5
    r = np.clip(np.convolve(x.astype(np.float64), h)[:n], -32768, 32767).astype(np.int16)
    inp = str(tmp_path / "in.wav")
    _wav(inp, x)  # input header skipped (NormalLMS.cpp:65)
    refp = str(tmp_path / "ref.pcm")
    r.tofile(refp)  # reference NOT skipped (:66)

    out = _run(
        _bin("nlms"), inp, refp, str(tmp_path / "e1.pcm"), str(tmp_path / "e2.pcm")
    ).stdout.decode(errors="replace")
    pat = (
        r"rgsdCoefficient\[0\] (\S+), rgsdCoefficient\[1\] (\S+), "
        r"rgsdCoefficient\[2\] (\S+)"
    )
    want = re.findall(pat, out)
    assert want, out[:200]

    nlms(inp, refp, str(tmp_path / "g1.pcm"), str(tmp_path / "g2.pcm"), verbose=True)
    got = re.findall(pat, capsys.readouterr().out)
    assert len(got) == len(want)
    np.testing.assert_allclose(
        np.array(got, np.float64), np.array(want, np.float64), rtol=0, atol=0
    )


def test_viterbi_verbose_matches_binary(tmp_path, capsys):
    """Per-time 'max accumulated prob' lines + the '%d ,' path print vs the
    compiled Viterbi binary (stdbuf line-buffered; the binary heap-corrupts
    after printing, so only the per-time lines are anchorable)."""
    from jeicyboodsp_tpu.models import serialization as ser
    from jeicyboodsp_tpu.pipelines.registry import viterbi

    r = np.random.default_rng(909)
    states = []
    for m in range(6):
        alpha = np.full(4, 0.25)
        mean = np.zeros((4, 12))
        mean[:, :4] = r.normal(0, 2, (4, 4))
        cov = np.zeros((4, 12, 12))
        for k in range(4):
            np.fill_diagonal(cov[k], 0.05)  # densities >> 1: log-log stays finite
        ev = np.zeros((4, 12, 4))
        for k in range(4):
            q, _ = np.linalg.qr(r.normal(0, 1, (12, 4)))
            ev[k] = q
        states.append((alpha, mean, cov, ev))
    trans = r.dirichlet(np.ones(6), size=6) + 0.5
    trans /= trans.sum(axis=1, keepdims=True)
    hmm_path = str(tmp_path / "hmm.bin")
    open(hmm_path, "wb").write(ser.pack_hmm(states, trans))

    T = 16
    seq = r.integers(0, 6, T)
    obs = np.zeros((T, 12))
    for t in range(T):
        a, mn, cv, ev = states[seq[t]]
        obs[t] = ev[0] @ mn[0][:4] + r.normal(0, 0.02, 12)
    mfc = str(tmp_path / "obs.mfc")
    obs.astype("<f8").tofile(mfc)
    lst = str(tmp_path / "v.lst")
    open(lst, "w").write(mfc)  # no trailing newline (fscanf %s + feof)
    main = str(tmp_path / "vmain.lst")
    open(main, "w").write(lst)

    out = subprocess.run(
        ["stdbuf", "-oL", _bin("viterbi"), main, hmm_path],
        stdin=subprocess.DEVNULL, capture_output=True, timeout=300,
    ).stdout.decode(errors="replace")
    want = [float(v) for v in re.findall(r"max accumulated prob (\S+)", out)]
    assert len(want) == T - 1

    viterbi(lst, hmm_path, verbose=True)  # registry takes the .mfc list directly
    mine = capsys.readouterr().out
    got = [float(v) for v in re.findall(r"max accumulated prob (\S+)", mine)]
    assert len(got) == T - 1
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)
    assert re.search(r"decoding result ! \n(\d+ ,)+\n", mine), mine[-200:]


def test_gmm_train_verbose_likelihoods_match_binary(tmp_path, capsys):
    """EM ' before X after Y' lines vs the compiled trainer, including the
    cumulative-dTemp2 likelihood quirk and the per-file dTempBf reset."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_oracle_vs_binary import _synth_class_frames, _write_list

    from jeicyboodsp_tpu.pipelines.registry import gmm_train

    # the binary hard-loops NUM_OF_CLASS=25 main-list lines (segfaults on
    # fewer); classes 0-1 get a second file (multi-file EM loop)
    classes, lists = [], []
    for c in range(25):
        files = [_synth_class_frames(1000 + c)]
        if c < 2:
            files.append(_synth_class_frames(2000 + c))
        paths = []
        for j, fr in enumerate(files):
            p = str(tmp_path / f"c{c}_{j}.mfc")
            fr.astype("<f8").tofile(p)
            paths.append(p)
        lst = str(tmp_path / f"c{c}.lst")
        _write_list(lst, paths)
        classes.append(files)
        lists.append(lst)
    main = str(tmp_path / "train.lst")
    _write_list(main, lists)

    out = _run(_bin("gmm_train"), main, str(tmp_path / "m.bin")).stdout.decode(errors="replace")
    pat = r" before (\S+) after (\S+)"
    want = np.array(re.findall(pat, out), np.float64)
    assert len(want) == 81  # 3 iterations x (25 classes + 2 extra files)

    gmm_train(main, str(tmp_path / "m2.bin"), verbose=True)
    got = np.array(re.findall(pat, capsys.readouterr().out), np.float64)
    assert got.shape == want.shape
    # %.5f prints; eigensolver roundoff differences land in the last digit
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=2e-4)
