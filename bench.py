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

    FAST = dict(
        mode="wiener",
        dtype=jnp.float32,
        use_assoc_scan=True,
        real_fft=True,
        resynth="ratio",
        # mxu8 = full-int8 fused Pallas engine (int8-split forward rDFT +
        # per-row-quantized int8 inverse GEMMs at 2x the bf16 MAC rate):
        # measured 6.79 G samples/s @ 69.5 dB (round 4) vs 5.51 G @ 90.0 dB
        # for the bf16x3 mxu3 engine and 1.66 G @ 104 dB for the XLA VPU
        # FFT.  Both clear the >= 60 dB compat bar; per-engine floors are
        # pinned in tests/test_engine_matrix.py and re-proven on silicon by
        # the tpu_kernel_checks below (mxu8 >= 65, mxu3 >= 85, mxu1 < 60).
        fft_engine=os.environ.get("BENCH_FFT_ENGINE", "mxu8"),
    )

    # --- SNR probe (compat contract, on the exact config being benched) ---
    probe = make_signal(PROBE_T * 512, rng)
    from jeicyboodsp_tpu.oracle import enhance as oenh

    want = oenh.run(probe, "wiener").astype(np.float64)
    got_blocks, mask = enhance_blocks(jnp.asarray(probe.reshape(PROBE_T, 512)), **FAST)
    got = np.asarray(got_blocks)[np.asarray(mask)].reshape(-1).astype(np.float64)
    err = want - got
    snr_db = float(10 * np.log10(np.sum(want**2) / max(np.sum(err**2), 1e-30)))

    # --- throughput: chain iterations ON DEVICE so the per-call dispatch
    # overhead (~28 ms on this tunnelled chip) amortizes out; each iteration
    # depends on the previous one's output so nothing can be elided ---
    import functools

    x = make_signal(BENCH_T * 512, rng)
    blocks = jax.device_put(jnp.asarray(x.reshape(BENCH_T, 512)), dev)

    @functools.partial(jax.jit, static_argnames=("n",))
    def chained(b, n):
        def body(i, carry):
            cur, acc = carry
            out, m = enhance_blocks(cur, **FAST)
            nxt = cur + (out & 1).astype(jnp.int16)
            return nxt, acc + jnp.sum(out.astype(jnp.int32))

        _, acc = jax.lax.fori_loop(0, n, body, (b, jnp.int32(0)))
        return acc

    def timed(n):
        jax.device_get(chained(blocks, n))  # compile + warm
        t0 = time.perf_counter()
        jax.device_get(chained(blocks, n))
        return time.perf_counter() - t0

    # min-of-2 per point + a wide 51-iteration window: tunnel jitter is
    # ~ms-scale, so an 11-iteration (~20 ms) window scattered 3.4-5.7 G
    # between runs and a one-off stall inside t1 once inflated the headline
    # 10x.  51 iterations (~90 ms) puts the jitter below a few percent.
    t1 = min(timed(1), timed(1))
    tn = min(timed(51), timed(51))
    per_iter = (tn - t1) / 50
    sps = BENCH_T * 512 / per_iter

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
                "baseline_cpp_samples_per_sec": round(baseline, 1) if baseline else None,
                "device": str(dev),
                "tpu_kernel_checks": checks,
            }
        )
    )


if __name__ == "__main__":
    main()
