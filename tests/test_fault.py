"""Pipeline-level fault harness: kill-and-resume == uninterrupted (SURVEY §5
failure detection / elastic recovery).

Extends the session-level checkpoint test (test_streaming.py) to the CLI
surface: a `stream` run is hard-killed mid-stream (os._exit fault injector,
a SIGKILL stand-in that skips every flush/atexit), restarted from its
checkpoint -- twice -- and the final output must be BYTE-IDENTICAL to a
never-interrupted run.
"""

import os
import subprocess
import sys

import numpy as np

from jeicyboodsp_tpu.io.wav import read_pcm16, write_pcm16

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cli(*args, timeout=280):
    return subprocess.run(
        [sys.executable, "-m", "jeicyboodsp_tpu.cli", *args],
        cwd=ROOT,
        capture_output=True,
        timeout=timeout,
    )


def test_kill_and_resume_byte_identical(rng, tmp_path):
    n = 512 * 64
    t = np.arange(n) / 16000
    speech = 5000 * np.sin(2 * np.pi * 313 * t) * (t > 0.4)
    x = np.clip(speech + rng.normal(0, 20, n), -32768, 32767).astype(np.int16)
    inp = str(tmp_path / "in.pcm")
    write_pcm16(inp, x)

    # uninterrupted run
    out_a = str(tmp_path / "a.pcm")
    r = _cli("stream", inp, out_a, "wiener")
    assert r.returncode == 0, r.stderr.decode()[-1500:]

    # interrupted run: killed after 3 chunks, then after 3 more, then allowed
    # to finish -- each restart resumes from the last atomic checkpoint
    out_b = str(tmp_path / "b.pcm")
    ck = str(tmp_path / "ck.npz")
    common = ("stream", inp, out_b, "wiener", "--ckpt", ck, "--ckpt-every", "2")
    r1 = _cli(*common, "--crash-after", "3")
    assert r1.returncode == 137, (r1.returncode, r1.stderr.decode()[-800:])
    assert os.path.exists(ck)  # at least one checkpoint committed
    r2 = _cli(*common, "--crash-after", "3")
    assert r2.returncode == 137
    r3 = _cli(*common)
    assert r3.returncode == 0, r3.stderr.decode()[-1500:]

    a = read_pcm16(out_a)
    b = read_pcm16(out_b)
    np.testing.assert_array_equal(a, b)
    assert len(a) > 0

    # the streaming surface equals the batch pipeline output (same samples)
    from jeicyboodsp_tpu.io.stream import EnhanceSession

    sess = EnhanceSession("wiener")
    want = sess.process(x.reshape(-1, 512))
    np.testing.assert_array_equal(a, want)
