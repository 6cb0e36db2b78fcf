#!/usr/bin/env python3
"""Headline benchmark: Wiener enhancement chain samples/s on one chip.

Protocol (BASELINE.md): generate noisy speech, run the f32 TPU-parallel
enhancement chain (ops.enhance.enhance_blocks) in steady state, report
samples/s and the speedup over the measured single-core C++ reference
binary (bench/ref_cpp/bin/wiener, FFTW-shim build of
WienerFilter_final.cpp).  Also verifies >= 60 dB SNR vs the float64 oracle
on a probe segment.  Prints ONE JSON line.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)

BENCH_SECONDS_DEVICE = 512  # blocks per device batch = BENCH_T
BENCH_T = 16384  # blocks per timed iteration (8.39 M samples)
PROBE_T = 192  # blocks for the SNR probe
FS = 16000


def make_signal(n, rng):
    t = np.arange(n) / FS
    speech = 5000 * np.sin(2 * np.pi * 313 * t) * (np.sin(2 * np.pi * 0.5 * t) > 0.2)
    return np.clip(speech + rng.normal(0, 20, n), -32768, 32767).astype(np.int16)


def measure_cpp_baseline(x):
    """Single-core reference samples/s (returns None if unavailable)."""
    binary = os.path.join(ROOT, "bench", "ref_cpp", "bin", "wiener")
    if not os.path.exists(binary):
        try:
            subprocess.run(
                [os.path.join(ROOT, "bench", "ref_cpp", "build.sh")],
                check=True,
                capture_output=True,
                timeout=300,
            )
        except Exception:
            return None
    if not os.path.exists(binary):
        return None
    inp = "/tmp/bench_in.pcm"
    out = "/tmp/bench_out.pcm"
    x.tofile(inp)
    raw = []
    for _ in range(5):  # median-of-5: single runs scatter ~2x with host load
        t0 = time.perf_counter()
        subprocess.run(
            [binary, inp, out],
            stdin=subprocess.DEVNULL,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
            check=True,
        )
        dt = time.perf_counter() - t0
        raw.append(len(x) / dt)
    return float(np.median(raw))


def main():
    import jax
    import jax.numpy as jnp

    from jeicyboodsp_tpu.ops.enhance import enhance_blocks

    rng = np.random.default_rng(20260817)
    dev = jax.devices()[0]

    def fast_cfg(engine):
        return dict(
            mode="wiener", dtype=jnp.float32, use_assoc_scan=True,
            real_fft=True, resynth="ratio", fft_engine=engine,
        )

    # Engines A/B'd in the SAME process, interleaved (VERDICT r4 item 1):
    # the memory-bound mxu8 engine swings 15-30% day-to-day through the
    # tunnel (r4's driver run read 3.94 G against a committed 6.79 G), so a
    # single-engine headline is fragile.  mxu3 (bf16x3, 90 dB) is the
    # compute-bound fallback; the headline is whichever is faster TODAY,
    # with its own SNR, and both rows ship in the JSON.
    # mxu8f/mxu8: fully-fused / two-kernel int8 engines at the r5 fidelity
    # tier (~84 dB, floor 78); mxu8t: the documented turbo tier (r4 4-dot
    # arithmetic, ~70 dB, floor 65 -- still >= the 60 dB compat bar);
    # mxu3: bf16x3 (90 dB), the compute-bound fallback for memory-slow days.
    # ordered by headline likelihood (mxu8t won the r5 A/B) so the soft
    # deadline below degrades gracefully
    ENGINES = os.environ.get(
        "BENCH_FFT_ENGINE", "mxu8t,mxu8f,mxu8,mxu3"
    ).split(",")

    # --- SNR probe (compat contract, on the exact configs being benched).
    # Probed lazily INSIDE the deadline loop below, so a compile-stall day
    # cannot burn the whole budget on probes before any timing happens. ---
    probe = make_signal(PROBE_T * 512, rng)
    from jeicyboodsp_tpu.oracle import enhance as oenh

    want = oenh.run(probe, "wiener").astype(np.float64)
    snr = {}

    def probe_snr(eng):
        got_blocks, mask = enhance_blocks(
            jnp.asarray(probe.reshape(PROBE_T, 512)), **fast_cfg(eng)
        )
        got = np.asarray(got_blocks)[np.asarray(mask)].reshape(-1).astype(np.float64)
        err = want - got
        snr[eng] = float(10 * np.log10(np.sum(want**2) / max(np.sum(err**2), 1e-30)))

    # --- throughput: chain iterations ON DEVICE so the per-call dispatch
    # overhead (~28 ms on this tunnelled chip) amortizes out; each iteration
    # depends on the previous one's output so nothing can be elided ---
    import functools

    x = make_signal(BENCH_T * 512, rng)
    blocks = jax.device_put(jnp.asarray(x.reshape(BENCH_T, 512)), dev)

    @functools.partial(jax.jit, static_argnames=("n", "engine"))
    def chained(b, n, engine):
        def body(i, carry):
            cur, acc = carry
            out, m = enhance_blocks(cur, **fast_cfg(engine))
            nxt = cur + (out & 1).astype(jnp.int16)
            return nxt, acc + jnp.sum(out.astype(jnp.int32))

        _, acc = jax.lax.fori_loop(0, n, body, (b, jnp.int32(0)))
        return acc

    def timed(eng, n):
        t0 = time.perf_counter()
        jax.device_get(chained(blocks, n, eng))
        return time.perf_counter() - t0

    # min-of-2 per point + a wide 51-iteration window: tunnel jitter is
    # ~ms-scale, so an 11-iteration (~20 ms) window scattered 3.4-5.7 G
    # between runs and a one-off stall inside t1 once inflated the headline
    # 10x.  51 iterations (~90 ms) puts the jitter below a few percent.
    # Points for the engines are interleaved so day/tunnel drift hits all
    # engines alike.  A soft deadline guards against the observed remote-
    # compile-helper stall class (one r5 run took >15 min where the normal
    # 4-engine bench takes ~3.5): once past the deadline, remaining engines
    # are skipped so the driver always gets a JSON line.
    t_start = time.perf_counter()
    deadline = float(os.environ.get("BENCH_DEADLINE_S", "1200"))
    engines_run = []
    for eng in ENGINES:
        probe_snr(eng)
        timed(eng, 1), timed(eng, 51)  # compile + warm both windows
        engines_run.append(eng)
        if time.perf_counter() - t_start > deadline and len(engines_run) >= 1:
            break
    t1 = {e: [] for e in engines_run}
    tn = {e: [] for e in engines_run}
    for _ in range(2):
        for eng in engines_run:
            t1[eng].append(timed(eng, 1))
        for eng in engines_run:
            tn[eng].append(timed(eng, 51))
    sps_by = {
        e: BENCH_T * 512 / ((min(tn[e]) - min(t1[e])) / 50) for e in engines_run
    }
    best = max(engines_run, key=lambda e: sps_by[e])
    sps, snr_db = sps_by[best], snr[best]
    ENGINES = engines_run

    baseline = measure_cpp_baseline(make_signal(FS * 60, rng))
    vs = sps / baseline if baseline else None

    # on-hardware kernel correctness (VERDICT r1 item 3): the driver's bench
    # run also proves the Pallas kernels' bit-exact contracts on real Mosaic
    # codegen, not just speed.  BENCH_SKIP_CHECKS=1 skips (e.g. quick loops).
    checks = None
    if not os.environ.get("BENCH_SKIP_CHECKS"):
        try:
            from jeicyboodsp_tpu.utils.tpu_checks import run_checks

            checks = run_checks()
        except Exception as e:  # report, never mask the headline number
            checks = {"error": repr(e)[:200], "all_ok": False}

    print(
        json.dumps(
            {
                "metric": "enhance_chain_samples_per_sec_per_chip",
                "value": round(sps, 1),
                "unit": "samples/s",
                "vs_baseline": round(vs, 2) if vs else None,
                "snr_db_vs_reference": round(snr_db, 1),
                "engine": best,
                "engines": {
                    e: {"samples_per_sec": round(sps_by[e], 1),
                        "snr_db": round(snr[e], 1)}
                    for e in ENGINES
                },
                "baseline_cpp_samples_per_sec": round(baseline, 1) if baseline else None,
                "device": str(dev),
                "tpu_kernel_checks": checks,
            }
        )
    )


if __name__ == "__main__":
    main()
