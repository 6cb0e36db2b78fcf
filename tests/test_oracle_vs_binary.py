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


# ---------------------------------------------------------------------------
# Components 15-17: GMM train / GMM classify / Viterbi, anchored to the
# compiled reference binaries (shim/Eigen/Eigenvalues provides a cyclic-Jacobi
# EigenSolver; agreement bound is eigensolver roundoff, measured ~1.5e-12
# relative, asserted at 1e-6 with eigenvector-sign normalization).
# ---------------------------------------------------------------------------

TRAIN_STRUCT_BYTES = 8096  # GMMParameter with PCA_LEN 8 (trainer layout)


def _write_list(path, entries):
    """Reference list files are parsed with fscanf(%s)+feof; a trailing
    newline makes the loop re-enter with an empty path and crash on
    fseek(NULL), so lists must end WITHOUT trailing whitespace
    (GMMAlgorithm_Train_Auto_ver2.cpp:76-118)."""
    open(path, "w").write("\n".join(entries))


def _synth_class_frames(seed, n=48):
    """Four separated sub-clusters arranged so the trainer's k-means seeds
    (frames 0,4,8,12 -- GMMAlgorithm_Train_Auto_ver2.cpp:121-126) each land
    in a distinct cluster; otherwise empty clusters yield NaN covariances."""
    r = np.random.default_rng(seed)
    center = r.normal(0, 10, 12)
    sub = center + r.normal(0, 4.0, (4, 12))
    ids = (np.arange(n) // 4) % 4
    return sub[ids] + r.normal(0, 0.5, (n, 12))


def _sign_cols(a, b):
    """Per-column sign factor aligning eigenvector matrices a and b."""
    s = np.sign(np.sum(a * b, axis=0))
    s[s == 0] = 1.0
    return s


@pytest.fixture(scope="module")
def gmm_train_anchor(tmp_path_factory):
    """Synthetic 25-class corpus -> compiled reference gmm_train -> model."""
    tmp = tmp_path_factory.mktemp("gmm_anchor")
    classes, lists = [], []
    for c in range(25):
        files = [_synth_class_frames(1000 + c)]
        if c < 2:  # exercise the multi-file EM loop (iInitCount branch)
            files.append(_synth_class_frames(2000 + c))
        paths = []
        for j, fr in enumerate(files):
            p = str(tmp / f"c{c}_{j}.mfc")
            fr.astype("<f8").tofile(p)
            paths.append(p)
        lst = str(tmp / f"c{c}.lst")
        _write_list(lst, paths)
        classes.append(files)
        lists.append(lst)
    main = str(tmp / "train.lst")
    _write_list(main, lists)
    model = str(tmp / "model.bin")
    _run(_bin("gmm_train"), main, model)
    assert os.path.getsize(model) == 25 * TRAIN_STRUCT_BYTES
    return classes, model, tmp


def test_gmm_train_binary_anchored(gmm_train_anchor):
    """Oracle trainer vs compiled GMMAlgorithm_Train_Auto_ver2 for all 25
    classes: alpha/cov exact to eigensolver roundoff; mean/eigvec match up
    to the (cancelling) per-column eigenvector sign."""
    from jeicyboodsp_tpu.models import serialization as ser
    from jeicyboodsp_tpu.oracle import gmm as ogmm

    classes, model, _ = gmm_train_anchor
    binp = ser.read_train_layout(model, 25)
    for c in range(25):
        p = ogmm.train_class(classes[c])
        ba, bm, bc, bev = binp[c]
        np.testing.assert_allclose(ba, p.alpha, rtol=1e-8)
        np.testing.assert_allclose(bc, p.cov, rtol=1e-6, atol=1e-10)
        for k in range(4):
            s = _sign_cols(bev[k], p.eigvec[k])
            np.testing.assert_allclose(bev[k] * s, p.eigvec[k], rtol=1e-6, atol=1e-9)
            np.testing.assert_allclose(bm[k][:8] * s, p.mean[k][:8], rtol=1e-6, atol=1e-9)
            np.testing.assert_array_equal(bm[k][8:], p.mean[k][8:])  # zeroed


def test_gmm_train_jax_vs_binary(gmm_train_anchor):
    """The framework's jitted trainer (models.gmm.train_class) against the
    reference binary, including a multi-file class."""
    from jeicyboodsp_tpu.models import gmm as mgmm
    from jeicyboodsp_tpu.models import serialization as ser

    classes, model, _ = gmm_train_anchor
    binp = ser.read_train_layout(model, 25)
    for c in (0, 1, 7, 24):
        alpha, mean, cov, ev = (np.asarray(x) for x in mgmm.train_class(classes[c]))
        ba, bm, bc, bev = binp[c]
        np.testing.assert_allclose(ba, alpha, rtol=1e-6)
        np.testing.assert_allclose(bc, cov, rtol=1e-5, atol=1e-8)
        for k in range(4):
            s = _sign_cols(bev[k], ev[k])
            np.testing.assert_allclose(bev[k] * s, ev[k], rtol=1e-5, atol=1e-8)
            np.testing.assert_allclose(bm[k][:8] * s, mean[k][:8], rtol=1e-5, atol=1e-8)


def test_gmm_classifier_chain_binary(gmm_train_anchor):
    """Train-layout model consumed by the PCA4 classifier binary (the
    misaligned 8096-vs-6560-byte chained read) vs oracle.score_file and the
    framework scorer; per-file argmax decisions must match exactly."""
    from jeicyboodsp_tpu.models import gmm as mgmm
    from jeicyboodsp_tpu.models import serialization as ser
    from jeicyboodsp_tpu.oracle import gmm as ogmm

    classes, model, tmp = gmm_train_anchor
    r = np.random.default_rng(555)
    test_frames, lists = [], []
    for c in range(25):
        base = classes[c][0]
        fr = base[r.integers(0, len(base), 30)] + r.normal(0, 0.3, (30, 12))
        p = str(tmp / f"t{c}.mfc")
        fr.astype("<f8").tofile(p)
        lst = str(tmp / f"t{c}.lst")
        _write_list(lst, [p])
        test_frames.append(fr)
        lists.append(lst)
    main = str(tmp / "test.lst")
    _write_list(main, lists)
    out = _run(_bin("gmm_test"), main, model).stdout.decode(errors="replace")
    probs = [float(x) for x in re.findall(r"-th class probability ([-\w.+]+)", out)]
    results = [int(x) for x in re.findall(r"-th result (\d+)", out)]
    assert len(results) == 25 and len(probs) == 625

    params4 = ser.read_as_test_layout(model, 25)
    for i in range(25):
        scores = []
        for u in range(25):
            alpha, mean, cov, ev = params4[u]
            covd = np.array([np.diag(cov[k])[:4] for k in range(4)])
            scores.append(ogmm.score_file(test_frames[i], alpha, mean, covd, ev))
        # reference argmax: strict <, first wins (incl. NaN stickiness)
        arg, mx = 0, scores[0]
        for u in range(1, 25):
            if mx < scores[u]:
                mx, arg = scores[u], u
        assert results[i] == arg + 1
        for u in range(25):
            want = probs[i * 25 + u]
            if np.isfinite(scores[u]) and np.isfinite(want):
                assert abs(scores[u] - want) < 2e-5 * max(1, abs(scores[u]))
        # framework scorer spot-check against the oracle (full f64 precision)
        if i % 7 == 0:
            alpha, mean, cov, ev = params4[i]
            got = float(mgmm.score_frames(test_frames[i], alpha, mean, cov, ev))
            if np.isfinite(scores[i]):
                np.testing.assert_allclose(got, scores[i], rtol=1e-9)

    # pipeline surface: the registry classifier on the SAME model file must
    # reproduce the binary's decisions exactly (in particular its NaN-argmax
    # semantics -- the mismatched-layout model makes NaN scores the norm)
    from jeicyboodsp_tpu.pipelines.registry import gmm_test as fw_gmm_test

    fw = fw_gmm_test(main, model)
    assert [pred + 1 for _, pred, _ in fw] == results


def _run_linebuf(binary, *args):
    """Run with line-buffered stdout: the viterbi binary heap-corrupts on its
    OOB dDecodingReslt[T-1] write (Viterbi_version1.cpp:209-225) and glibc
    aborts inside free() BEFORE main's final printf, so block-buffered output
    would be lost with it."""
    return subprocess.run(
        ["stdbuf", "-oL", binary, *args],
        stdin=subprocess.DEVNULL,
        capture_output=True,
        timeout=300,
    )


@pytest.mark.parametrize("case,var", [("finite", 0.01), ("nan", 4.0)])
def test_viterbi_binary_anchored(tmp_path, case, var):
    """Viterbi DP vs the compiled reference: anchors the per-time max
    accumulated probabilities (printed at :222, one per t=T-1..1), which pin
    every DP cell the backtrace reads.  The 'finite' case keeps the
    log-of-log recursion positive (small variances -> densities >> 1) so
    real numerics are anchored; the 'nan' case anchors NaN propagation."""
    from jeicyboodsp_tpu.models import hmm as mhmm
    from jeicyboodsp_tpu.models import serialization as ser
    from jeicyboodsp_tpu.oracle.viterbi import gmm_emission, hmm_decode

    r = np.random.default_rng(909)
    states = []
    for m in range(6):
        alpha = np.full(4, 0.25)
        mean = np.zeros((4, 12))
        mean[:, :4] = r.normal(0, 2, (4, 4))
        cov = np.zeros((4, 12, 12))
        for k in range(4):
            np.fill_diagonal(cov[k], var)
        ev = np.zeros((4, 12, 4))
        for k in range(4):
            q, _ = np.linalg.qr(r.normal(0, 1, (12, 4)))
            ev[k] = q
        states.append((alpha, mean, cov, ev))
    trans = (r.dirichlet(np.ones(6), size=6) + 0.5)
    trans /= trans.sum(axis=1, keepdims=True)  # entries >= ~0.07
    hmm_path = str(tmp_path / "hmm.bin")
    open(hmm_path, "wb").write(ser.pack_hmm(states, trans))

    T = 24
    seq = r.integers(0, 6, T)
    obs = np.zeros((T, 12))
    for t in range(T):
        a, mn, cv, ev = states[seq[t]]
        obs[t] = ev[0] @ mn[0][:4] + r.normal(0, 0.02 if case == "finite" else 3.0, 12)
    mfc = str(tmp_path / "obs.mfc")
    obs.astype("<f8").tofile(mfc)
    lst = str(tmp_path / "v.lst")
    _write_list(lst, [mfc])
    main = str(tmp_path / "vmain.lst")
    _write_list(main, [lst])

    out = _run_linebuf(_bin("viterbi"), main, hmm_path).stdout.decode(errors="replace")
    maxprobs = [float(x) for x in re.findall(r"max accumulated prob ([-\w.+]+)", out)]
    assert len(maxprobs) == T - 1

    sts = [(a, m, np.array([np.diag(c[k])[:4] for k in range(4)]), e) for a, m, c, e in states]
    # oracle DP replicated to extract per-time maxima
    P = np.zeros((6, T))
    with np.errstate(invalid="ignore", divide="ignore"):
        for m in range(6):
            P[m, 0] = np.log(gmm_emission(obs[0], *sts[m])) + np.log(1.0 / 6)
        for t in range(1, T):
            for m in range(6):
                emis = gmm_emission(obs[t], *sts[m])
                for u in range(6):
                    cand = np.log(P[u, t - 1]) + np.log(trans[u, m]) + np.log(emis)
                    if u == 0:
                        P[m, t] = cand
                    elif P[m, t] < cand:
                        P[m, t] = cand
    want = []
    for t in range(T - 1, 0, -1):
        best = P[0, t]
        for m in range(1, 6):
            if P[m, t] > best:
                best = P[m, t]
        want.append(best)
    for a, b in zip(maxprobs, want):
        if np.isfinite(b):
            assert abs(a - b) < 2e-5 * max(1, abs(b))  # %f prints 6 decimals
        else:
            assert not np.isfinite(a)

    # oracle + framework compat decode agree with the anchored DP
    opath, oscore = hmm_decode(obs, sts, trans)
    if np.isfinite(want[-1]):
        np.testing.assert_allclose(oscore, want[-1], rtol=1e-12)
    else:
        assert not np.isfinite(oscore)
    alpha6 = np.stack([s[0] for s in states])
    mean6 = np.stack([s[1] for s in states])
    cov6 = np.stack([s[2] for s in states])
    ev6 = np.stack([s[3] for s in states])
    jpath, jscore = mhmm.viterbi(obs, alpha6, mean6, cov6, ev6, trans, compat=True)
    if np.isfinite(oscore):
        np.testing.assert_allclose(float(jscore), oscore, rtol=1e-9)
        np.testing.assert_array_equal(np.asarray(jpath), opath)
    else:
        assert not np.isfinite(float(jscore))


def test_mfcc_gmm_train_chain_binary(tmp_path):
    """End-to-end speech-pipeline anchor: WAV -> reference mfcc binary ->
    .mfc files -> reference gmm_train binary, vs the oracle trainer on the
    SAME mfc bytes (the file boundary is the reference's process boundary,
    SURVEY.md 3.4)."""
    from jeicyboodsp_tpu.models import serialization as ser
    from jeicyboodsp_tpu.oracle import gmm as ogmm

    r = np.random.default_rng(777)
    mfcs, lists = [], []
    for c in range(25):
        # long enough that every k-means cluster gets ~78 frames (>> 12
        # dims): an under-populated cluster has a singular covariance whose
        # roundoff-level eigenvalues differ in SIGN between correct
        # eigensolvers, making the EM chain chaotic (NaN on one side only)
        n = 1024 * 160
        t = np.arange(n) / 16000.0
        f0 = 180 + 37 * c
        # tone multiplier changes every 2048 samples (4 frames) so k-means
        # seed frames 0,4,8,12 land in four distinct spectral clusters;
        # heavy noise + per-block amplitude jitter keep every cluster's MFCC
        # covariance solidly full-rank (a pure tone is near-rank-0 and its
        # roundoff-level eigenvalues flip sign between correct eigensolvers,
        # sending one side of the EM chain to NaN and not the other)
        mult = np.array([1.0, 1.5, 2.2, 3.1])[(np.arange(n) // 2048) % 4]
        amp = 4000 * (0.7 + 0.6 * r.random(n // 512 + 1))[np.arange(n) // 512]
        x = np.clip(
            amp * np.sin(2 * np.pi * f0 * mult * t) + r.normal(0, 1500, n),
            -32768, 32767,
        ).astype(np.int16)
        wav = str(tmp_path / f"c{c}.wav")
        mfc = str(tmp_path / f"c{c}.mfc")
        write_wav(wav, x, 16000)
        plist = str(tmp_path / f"m{c}.lst")
        open(plist, "w").write(f"{wav} {mfc}\n")
        _run(_bin("mfcc"), plist)  # segfault-exit quirk; file already written
        assert os.path.getsize(mfc) >= 13 * 12 * 8
        mfcs.append(mfc)
        lst = str(tmp_path / f"cl{c}.lst")
        _write_list(lst, [mfc])
        lists.append(lst)
    main = str(tmp_path / "train.lst")
    _write_list(main, lists)
    model = str(tmp_path / "model.bin")
    _run(_bin("gmm_train"), main, model)
    assert os.path.getsize(model) == 25 * TRAIN_STRUCT_BYTES

    binp = ser.read_train_layout(model, 25)
    for c in range(25):
        raw = np.fromfile(mfcs[c], dtype="<f8")
        # the trainer reads ftell/8/12 frames and ignores a partial tail
        # (GMMAlgorithm_Train_Auto_ver2.cpp:96-99); the mfcc binary's
        # segfault-exit leaves the file cut at a 4096-byte buffer boundary
        frames = raw[: len(raw) // 12 * 12].reshape(-1, 12)
        # replicate train_class but keep the pre-export eigensystem: real
        # MFCC covariances have near-degenerate noise-floor eigenvalues, and
        # within a degenerate subspace two correct eigensolvers may rotate
        # differently (EM values are invariant to that, which alpha/cov
        # matching below proves) -- so eigvec/mean columns are compared only
        # where the eigenvalue is separated from its neighbors.
        p = ogmm.GMMParams()
        for j in range(4):
            p.mean[j] = frames[j * 4]
        p.mean, p.cov = ogmm.kmeans(frames, p.mean)
        p.alpha[:] = 1.0 / 4
        for _ in range(ogmm.EM_ITERATIONS):
            ogmm.em_step(frames, p)
        vals12 = [ogmm._top_eigpairs(p.cov[k], 12)[0] for k in range(4)]
        ogmm.pca_export(p)
        ba, bm, bc, bev = binp[c]
        np.testing.assert_allclose(ba, p.alpha, rtol=1e-6, equal_nan=True)
        np.testing.assert_allclose(bc, p.cov, rtol=1e-5, atol=1e-8, equal_nan=True)
        for k in range(4):
            if not np.all(np.isfinite(bev[k])):
                assert not np.all(np.isfinite(p.eigvec[k]))
                continue
            v = vals12[k]
            gaps = np.abs(np.diff(v))  # v sorted descending
            scale = max(abs(v[0]), 1e-300)
            s = _sign_cols(bev[k], p.eigvec[k])
            for i in range(8):
                lo = gaps[i - 1] if i > 0 else np.inf
                hi = gaps[i] if i < 11 else np.inf
                if min(lo, hi) / scale < 1e-8:
                    continue  # degenerate subspace: rotation is unanchored
                np.testing.assert_allclose(
                    bev[k][:, i] * s[i], p.eigvec[k][:, i], rtol=1e-5, atol=1e-7
                )
                np.testing.assert_allclose(
                    bm[k][i] * s[i], p.mean[k][i], rtol=1e-5, atol=1e-7
                )
