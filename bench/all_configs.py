#!/usr/bin/env python3
"""Per-config benchmark table: TPU samples/s (amortized chained protocol),
single-core C++ reference samples/s, and SNR vs the f64 oracle.

Writes bench/results.json and prints a table.  The headline driver metric
stays in ../bench.py; this feeds BASELINE.md.

Usage: ``python bench/all_configs.py [row ...]`` -- with row names
(e.g. ``mvdr fastconv``) only those sections run and their rows are
merge-updated into results.json; with no arguments everything runs and the
file is rewritten.  Rows with shared setup pull in their dependency
(``bnlms_pallas``->``bnlms``, ``pitch2/3``->``pitch1`` signal).
"""

import json
import os
import subprocess
import sys
import time
from functools import partial

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
BIN = os.path.join(ROOT, "bench", "ref_cpp", "bin")


class _BaselineSps(float):
    """Median single-core C++ samples/s; carries the raw per-run samples in
    ``.raw`` so results.json records the variance behind every ratio
    (VERDICT r2 item 5: best-of-2 let ~2x host-load swings masquerade as
    perf changes)."""

    raw: list


def cpp_sps(binary, args_builder, n_samples, per_sample_files=1, runs=5):
    path = os.path.join(BIN, binary)
    if not os.path.exists(path):
        return None
    args, cleanup_inputs = args_builder()
    raw = []
    for _ in range(runs):  # median-of-5: robust to host-load outliers
        t0 = time.perf_counter()
        subprocess.run(
            [path] + args,
            stdin=subprocess.DEVNULL,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        raw.append(n_samples / (time.perf_counter() - t0))
    out = _BaselineSps(float(np.median(raw)))
    out.raw = [round(s, 1) for s in raw]
    return out


def amortized(fn_calls, n1=1, n2=5):
    """fn_calls(k) runs k chained device iterations and syncs; each k is
    compiled+warmed before its timed run; returns per-iteration seconds.

    Tunnel dispatch jitter (~ms) can exceed (n2-n1) iterations for fast
    sections, even yielding NEGATIVE deltas; on a non-positive or clearly
    jitter-dominated delta the spread is widened (up to 2 retries) so every
    committed row is a real measurement.  Each point is the MIN of two
    timed runs (r4: a single host-side stall inside the wide window once
    deflated the headline row ~2x -- single-run points have no defense
    against one-off stalls; min-of-2 matches bench.py's protocol)."""
    def timed(k):
        fn_calls(k)  # compile + warm
        raw = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn_calls(k)
            raw.append(time.perf_counter() - t0)
        return min(raw)
    for _ in range(3):
        t1, t2 = timed(n1), timed(n2)
        per = (t2 - t1) / (n2 - n1)
        if per > 0 and (t2 - t1) > 0.25 * t1:
            return per
        n2 = n1 + (n2 - n1) * 4  # widen the spread; recompiles once per k
    return float("nan")  # jitter-dominated after retries: visibly invalid,
    # never a silently-wrong committed row


STAMP_GLOBS = (
    "jeicyboodsp_tpu/ops/*.py",
    "jeicyboodsp_tpu/kernels/*.py",
    "jeicyboodsp_tpu/models/*.py",
    "jeicyboodsp_tpu/pipelines/*.py",
    "jeicyboodsp_tpu/parallel/*.py",
    "jeicyboodsp_tpu/io/*.py",
    "jeicyboodsp_tpu/utils/cnum.py",  # the C-numeric semantics every op uses
    "native/*.cpp",
    "bench/all_configs.py",
)


def tree_stamp() -> dict:
    """Content hashes of every file that determines measured performance.

    Written into results.json as ``_benched_tree`` at bench time;
    tests/test_docs_consistency.py fails if HEAD's files differ from the
    stamp -- so a kernel commit that skips re-benching is caught by CI
    instead of shipping a stale record (VERDICT r3 weak-1: the artifact
    lagged HEAD three rounds running)."""
    import glob
    import hashlib

    out = {}
    for pat in STAMP_GLOBS:
        for p in sorted(glob.glob(os.path.join(ROOT, pat))):
            with open(p, "rb") as f:
                out[os.path.relpath(p, ROOT)] = hashlib.sha256(f.read()).hexdigest()[:16]
    return out


KNOWN_ROWS = {
    "enhance", "enhance_wiener", "enhance_specsub", "geq", "fastconv",
    "bnlms", "bnlms_pallas", "bnlms_timeparallel", "mvdr", "mfcc", "fft",
    "fft_roundtrip",
    "pitch", "pitch1", "pitch2", "pitch3", "nlms", "nlms_pallas", "nlms_fast",
    "lpc",
    "viterbi", "viterbi_decode", "viterbi_decode_batched",
    "speech", "speech_pipeline", "gmm", "gmm_train", "gmm_test", "latency",
}


def annotate_rooflines(results: dict) -> dict:
    """Attach roof_sps / roof_bottleneck / pct_of_roof to every row with an
    analytic speed-of-light model (VERDICT r2 item 3): "is 0.31 G good?"
    must be answerable from the artifact alone.  Models live in
    utils/profiling and describe the IMPLEMENTED algorithm, not the
    textbook one.  Re-runnable standalone on a committed results.json:
    ``python bench/all_configs.py --annotate``."""
    from jeicyboodsp_tpu.utils import profiling as prof

    ROOFS = {
        # the headline engine is mxu8 (full int8) since r4; its roof is
        # MEMORY-bound (the int8 MACs moved the compute floor below the
        # inter-kernel plane traffic)
        ("enhance_wiener", "tpu_sps"): prof.enhance_mxu8_roofline,
        ("enhance_specsub", "tpu_sps"): prof.enhance_mxu8_roofline,
        ("enhance_specsub", "tpu_sps_mxu8t"): prof.enhance_mxu8t_roofline,
        ("enhance_wiener", "tpu_sps_mxu3"): prof.enhance_mxu3_roofline,
        ("enhance_wiener", "tpu_sps_mxu8f"): prof.enhance_mxu8f_roofline,
        ("enhance_wiener", "tpu_sps_mxu8t"): prof.enhance_mxu8t_roofline,
        # the benched geq fast path is the SEQUENTIAL Pallas cascade, whose
        # ceiling is the per-sample dependency chain (geq_seq_roofline) --
        # the assoc-scan model put the kernel at an impossible 103%
        ("geq", "tpu_sps"): prof.geq_seq_roofline,
        # (geq quant-compat carries no roof: the df32 bit-exact kernel is a
        # sequential correctness path, not a throughput target)
        ("fastconv", "tpu_sps"): prof.fastconv_roofline,
        ("fastconv", "tpu_sps_sparse"): prof.fastconv_sparse_roofline,
        ("fastconv", "tpu_sps_gemm"): prof.fastconv_gemm_roofline,
        ("fastconv", "tpu_sps_gemm8"): prof.fastconv_gemm8_roofline,
        ("fastconv", "tpu_sps_gemm8hq"): prof.fastconv_gemm8hq_roofline,
        ("bnlms", "tpu_sps"): prof.bnlms_xla_roofline,
        ("bnlms_pallas", "tpu_sps"): prof.bnlms_roofline,
        ("nlms_pallas", "tpu_sps"): prof.nlms_roofline,
        ("mvdr", "tpu_sps"): prof.mvdr_collapsed_roofline,
        ("mfcc", "tpu_sps"): prof.mfcc_roofline,
        ("fft_roundtrip", "tpu_sps"): prof.fft_roundtrip_roofline,
        ("pitch1", "tpu_sps"): prof.wk_pitch_roofline,
        # pitch2's kernel computes lags [96, 512) (lo=96 sublane alignment
        # below the reference's 101 floor), so the roof models those 416
        # lags -- the work actually performed, not the full 512-lag surface
        ("pitch2", "tpu_sps"): lambda: prof.amdf_roofline(lags=(96, 512)),
        ("pitch3", "tpu_sps"): prof.wk_pitch3_roofline,
        ("lpc", "tpu_sps"): prof.lpc_roofline,
    }
    for k, v in results.items():
        for (row, field), model in ROOFS.items():
            if row == k and v.get(field):
                r = model()
                suffix = "" if field == "tpu_sps" else field.replace("tpu_sps", "")
                v[f"roof_sps{suffix}"] = r.bound()["speed_of_light_samples_per_s"]
                v[f"roof_bottleneck{suffix}"] = r.bound()["bottleneck"]
                v[f"pct_of_roof{suffix}"] = round(r.pct_of_roof(v[field]), 1)
    return results


def main(groups=None):
    if groups is not None and "--annotate" in groups:
        out_path = os.path.join(ROOT, "bench", "results.json")
        with open(out_path) as f:
            results = json.load(f)
        annotate_rooflines(results)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=2)
        print(json.dumps({k: {f: v[f] for f in v if f.startswith(("pct_", "roof_"))}
                          for k, v in results.items() if any(f.startswith("pct_") for f in v)},
                         indent=2))
        return
    if groups is not None:
        unknown = set(groups) - KNOWN_ROWS
        if unknown:  # a typo must fail loudly, not silently run nothing
            raise SystemExit(
                f"unknown row(s) {sorted(unknown)}; valid: {sorted(KNOWN_ROWS)}"
            )
    import jax
    import jax.numpy as jnp

    from jeicyboodsp_tpu.io.wav import write_pcm16, write_wav
    from jeicyboodsp_tpu.utils.metrics import snr_db

    rng = np.random.default_rng(1)
    results = {}
    fs = 16000

    def _want(*names):
        return groups is None or bool(groups & set(names))

    def mixed_signal(n, fs_=16000):
        t = np.arange(n) / fs_
        sp = 5000 * np.sin(2 * np.pi * 313 * t) * (np.sin(2 * np.pi * 0.5 * t) > 0.2)
        return np.clip(sp + rng.normal(0, 20, n), -32768, 32767).astype(np.int16)

    # ---------------- enhancement (wiener + specsub) ----------------
    if _want("enhance", "enhance_wiener", "enhance_specsub"):
        from jeicyboodsp_tpu.oracle import enhance as oenh
        from jeicyboodsp_tpu.ops.enhance import enhance_blocks

        T = 16384
        x = mixed_signal(T * 512)
        blocks = jnp.asarray(x.reshape(T, 512))
        probe = x[: 256 * 512]
        for mode in ("wiener", "specsub"):
            row = {}
            want = oenh.run(probe, mode)
            # the shipped headline is best-of-four (bench.py A/B); the
            # record carries all tiers for the wiener row: mxu8 (r5
            # fidelity, suffixless = the quality default), mxu8f (fused
            # single kernel), mxu8t (turbo), mxu3 (bf16x3)
            engines = (
                ("mxu8", "mxu8f", "mxu8t", "mxu3") if mode == "wiener"
                else ("mxu8", "mxu8t")
            )
            for eng in engines:
                FAST = dict(
                    mode=mode, dtype=jnp.float32, use_assoc_scan=True, real_fft=True,
                    resynth="ratio", fft_engine=eng,
                )

                @partial(jax.jit, static_argnames=("n",))
                def chained(b, n, FAST=tuple(FAST.items())):
                    FASTd = dict(FAST)

                    def body(i, carry):
                        cur, acc = carry
                        out, _ = enhance_blocks(cur, **FASTd)
                        return cur + (out & 1).astype(jnp.int16), acc + jnp.sum(out.astype(jnp.int32))

                    return jax.lax.fori_loop(0, n, body, (b, jnp.int32(0)))[1]

                per = amortized(lambda k: jax.device_get(chained(blocks, k)), n1=2, n2=27)
                got, m = enhance_blocks(jnp.asarray(probe.reshape(-1, 512)), **FAST)
                got = np.asarray(got)[np.asarray(m)].reshape(-1)
                suffix = "" if eng == "mxu8" else f"_{eng}"
                row[f"tpu_sps{suffix}"] = T * 512 / per
                row[f"snr_db{suffix}"] = snr_db(want, got)
            # C++ baseline
            write_pcm16("/tmp/b_in.pcm", x[: fs * 60])
            base = cpp_sps(mode if mode != "specsub" else "specsub", lambda: (["/tmp/b_in.pcm", "/tmp/b_out.pcm"], None), fs * 60)
            row["cpp_sps"] = base
            row["engine"] = "mxu8"
            results[f"enhance_{mode}"] = row

    # ---------------- GEQ ----------------
    if _want("geq"):
        from jeicyboodsp_tpu.kernels.biquad_pallas import geq_cascade_pallas, pack_coefficients
        from jeicyboodsp_tpu.ops.geq import geq_coefficients

        b, a = geq_coefficients()
        coef = pack_coefficients(b, a)
        B, Tg = 2048, 49152
        xg = jnp.asarray(rng.normal(0, 1000, (B, Tg)).astype(np.float32))

        @partial(jax.jit, static_argnames=("n",))
        def geq_chain(x0, n):
            return jax.lax.fori_loop(0, n, lambda i, acc: geq_cascade_pallas(acc, coef), x0)

        per = amortized(lambda k: jax.device_get(geq_chain(xg, k).sum()))
        tq = np.arange(512 * 187) / 48000.0
        xq = np.clip(
            1200 * np.sin(2 * np.pi * 700 * tq) + rng.normal(0, 150, 512 * 187), -32768, 32767
        ).astype(np.int16)  # quiet: the +12dB bands must not hit the int16 wrap the
        # reference's requantization applies (fast mode is deliberately unwrapped)
        from jeicyboodsp_tpu.oracle import geq as ogeq

        want = ogeq.run(xq)  # compat (native) path is bit-exact; measure fast-path SNR
        fast = np.asarray(geq_cascade_pallas(jnp.asarray(xq[None].astype(np.float32)), coef))[0]
        write_wav("/tmp/b_geq.wav", mixed_signal(48000 * 60, 48000), 48000)
        base = cpp_sps("geq", lambda: (["/tmp/b_geq.wav", "/tmp/b_geq_out.pcm"], None), 48000 * 60)

        # quantized-feedback df32 kernel: bit-exact compat ON TPU
        from jeicyboodsp_tpu.kernels.biquad_pallas import (
            geq_cascade_pallas_quant,
            pack_coefficients_df,
        )

        coef_df = jnp.asarray(pack_coefficients_df(b, a))

        @partial(jax.jit, static_argnames=("n",))
        def geq_chain_q(x0, n):
            return jax.lax.fori_loop(
                0, n, lambda i, acc: geq_cascade_pallas_quant(acc, coef_df)[0], x0
            )

        per_q = amortized(lambda k: jax.device_get(geq_chain_q(xg, k).sum()))
        got_q = np.asarray(geq_cascade_pallas_quant(jnp.asarray(xq[None]), coef_df)[0])[0]
        results["geq"] = {
            "tpu_sps": B * Tg / per,
            "tpu_sps_quant_compat": B * Tg / per_q,
            "cpp_sps": base,
            "snr_db_fast_vs_ref": snr_db(want, np.trunc(fast)),
            "quant_kernel_exact": bool((got_q.astype(np.int64) == want.astype(np.int64)).all()),
            "compat_exact": True,  # native kernel, asserted in tests
        }

    # ---------------- fast convolution ----------------
    if _want("fastconv"):
        from jeicyboodsp_tpu.ops.fastconv import (
            _toeplitz_matrix,
            fastconv_blocks,
            fastconv_blocks_gemm,
            filter_spectrum,
        )

        Tc = 2048
        xc = mixed_signal(Tc * 1024)
        cblocks = jnp.asarray(xc.reshape(Tc, 1024))
        H32r, H32i = filter_spectrum(dtype=jnp.float32, real_fft=True)

        @partial(jax.jit, static_argnames=("n",))
        def fc_chain(bk, n):
            def body(i, carry):
                cur, acc = carry
                out = fastconv_blocks(cur, H32r, H32i, dtype=jnp.float32, real_fft=True)
                nxt = cur.at[7:].set(cur[7:] + (out & 1).astype(jnp.int16))
                return nxt, acc + jnp.sum(out.astype(jnp.int32))

            return jax.lax.fori_loop(0, n, body, (bk, jnp.int32(0)))[1]

        per = amortized(lambda k: jax.device_get(fc_chain(cblocks, k)))
        from jeicyboodsp_tpu.oracle import fastconv as ofc

        probe = xc[: 64 * 1024]
        want = ofc.run(probe)
        got = np.asarray(
            fastconv_blocks(jnp.asarray(probe.reshape(-1, 1024)), H32r, H32i, dtype=jnp.float32, real_fft=True)
        ).reshape(-1)
        write_wav("/tmp/b_fc.wav", xc[: fs * 60], fs)
        base = cpp_sps("fastconv", lambda: (["/tmp/b_fc.wav", "/tmp/b_fc_out.pcm"], None), fs * 60)
        from jeicyboodsp_tpu.ops.fastconv import fastconv_blocks_sparse

        @partial(jax.jit, static_argnames=("n",))
        def fc_chain_sp(bk, n):
            def body(i, carry):
                cur, acc = carry
                out = fastconv_blocks_sparse(cur, dtype=jnp.float32)
                nxt = cur.at[7:].set(cur[7:] + (out & 1).astype(jnp.int16))
                return nxt, acc + jnp.sum(out.astype(jnp.int32))

            return jax.lax.fori_loop(0, n, body, (bk, jnp.int32(0)))[1]

        per_sp = amortized(lambda k: jax.device_get(fc_chain_sp(cblocks, k)), n1=2, n2=12)
        got_sp = np.asarray(
            fastconv_blocks_sparse(jnp.asarray(probe.reshape(-1, 1024)), dtype=jnp.float32)
        ).reshape(-1)

        # dense direct-GEMM engine: one banded-Toeplitz MXU matmul per hop
        Mdev = jax.device_put(jnp.asarray(_toeplitz_matrix("float32")))

        @partial(jax.jit, static_argnames=("n",))
        def fc_chain_gm(bk, M, n):
            def body(i, carry):
                cur, acc = carry
                out = fastconv_blocks_gemm(cur, M, dtype=jnp.float32)
                nxt = cur.at[7:].set(cur[7:] + (out & 1).astype(jnp.int16))
                return nxt, acc + jnp.sum(out.astype(jnp.int32))

            return jax.lax.fori_loop(0, n, body, (bk, jnp.int32(0)))[1]

        per_gm = amortized(lambda k: jax.device_get(fc_chain_gm(cblocks, Mdev, k)), n1=2, n2=12)
        got_gm = np.asarray(
            fastconv_blocks_gemm(jnp.asarray(probe.reshape(-1, 1024)), Mdev, dtype=jnp.float32)
        ).reshape(-1)

        # int8-MXU Toeplitz engine (4 s8xs8 dots = 2.0 bf16-equiv passes)
        from jeicyboodsp_tpu.ops.fastconv import fastconv_blocks_gemm_int8

        @partial(jax.jit, static_argnames=("n",))
        def fc_chain_g8(bk, n):
            def body(i, carry):
                cur, acc = carry
                out = fastconv_blocks_gemm_int8(cur, terms=2)
                nxt = cur.at[7:].set(cur[7:] + (out & 1).astype(jnp.int16))
                return nxt, acc + jnp.sum(out.astype(jnp.int32))

            return jax.lax.fori_loop(0, n, body, (bk, jnp.int32(0)))[1]

        per_g8 = amortized(lambda k: jax.device_get(fc_chain_g8(cblocks, k)), n1=2, n2=12)
        got_g8 = np.asarray(
            fastconv_blocks_gemm_int8(jnp.asarray(probe.reshape(-1, 1024)), terms=2)
        ).reshape(-1)

        # 3-term int8 Toeplitz (gemm8hq, the r5 --fast default)
        @partial(jax.jit, static_argnames=("n",))
        def fc_chain_hq(bk, n):
            def body(i, carry):
                cur, acc = carry
                out = fastconv_blocks_gemm_int8(cur, terms=3)
                nxt = cur.at[7:].set(cur[7:] + (out & 1).astype(jnp.int16))
                return nxt, acc + jnp.sum(out.astype(jnp.int32))

            return jax.lax.fori_loop(0, n, body, (bk, jnp.int32(0)))[1]

        per_hq = amortized(lambda k: jax.device_get(fc_chain_hq(cblocks, k)), n1=2, n2=12)
        got_hq = np.asarray(
            fastconv_blocks_gemm_int8(jnp.asarray(probe.reshape(-1, 1024)), terms=3)
        ).reshape(-1)
        results["fastconv"] = {
            "tpu_sps": Tc * 1024 / per,
            "tpu_sps_sparse": Tc * 1024 / per_sp,
            "tpu_sps_gemm": Tc * 1024 / per_gm,
            "tpu_sps_gemm8": Tc * 1024 / per_g8,
            "tpu_sps_gemm8hq": Tc * 1024 / per_hq,
            "cpp_sps": base,
            "snr_db": snr_db(want, got),
            "snr_db_sparse": snr_db(want, got_sp),
            "snr_db_gemm": snr_db(want, got_gm),
            "snr_db_gemm8": snr_db(want, got_g8),
            "snr_db_gemm8hq": snr_db(want, got_hq),
            "fast_default_engine": "gemm8hq",
        }

    # ---------------- BNLMS ----------------
    if _want("bnlms", "bnlms_pallas", "bnlms_timeparallel"):
        from jeicyboodsp_tpu.ops.nlms import bnlms_apply, bnlms_init_state

        Tb = 512
        xb_ = mixed_signal(Tb * 1024)
        h = rng.normal(0, 0.1, 32)
        h[0] = 0.5
        rb_ = np.clip(np.convolve(xb_.astype(np.float64), h)[: Tb * 1024], -32768, 32767).astype(np.int16)
        xb = jnp.asarray(xb_.reshape(Tb, 1024))
        rb = jnp.asarray(rb_.reshape(Tb, 1024))

        NSTREAMS = 16  # parallel AEC sessions (vmapped) -- the serving workload
        xbm = jnp.broadcast_to(xb, (NSTREAMS,) + xb.shape)
        rbm = jnp.broadcast_to(rb, (NSTREAMS,) + rb.shape)

        @partial(jax.jit, static_argnames=("n",))
        def bn_chain(xx, rr, n):
            def one(x1, r1):
                est, err, _ = bnlms_apply(x1, r1, bnlms_init_state(jnp.float32), dtype=jnp.float32)
                return est, err

            def body(i, carry):
                x0, acc = carry
                est, err = jax.vmap(one)(x0, rr)
                return x0 + (est & 1).astype(jnp.int16), acc + jnp.sum(err.astype(jnp.int32))

            return jax.lax.fori_loop(0, n, body, (xx, jnp.int32(0)))[1]

        per = amortized(lambda k: jax.device_get(bn_chain(xbm, rbm, k)))
        per = per / NSTREAMS
        from jeicyboodsp_tpu.oracle import nlms as onl

        pe, perr = onl.run_bnlms(xb_[: 16 * 1024], rb_[: 16 * 1024])
        est, err, _ = bnlms_apply(
            jnp.asarray(xb_[: 16 * 1024].reshape(-1, 1024)),
            jnp.asarray(rb_[: 16 * 1024].reshape(-1, 1024)),
            bnlms_init_state(jnp.float32),
            dtype=jnp.float32,
        )
        got = np.asarray(est)[1:].reshape(-1)
        write_wav("/tmp/b_nl_in.wav", xb_[: fs * 30], fs)
        write_pcm16("/tmp/b_nl_ref.pcm", rb_[: fs * 30])
        base = cpp_sps(
            "bnlms",
            lambda: (["/tmp/b_nl_in.wav", "/tmp/b_nl_ref.pcm", "/tmp/b_e.pcm", "/tmp/b_r.pcm"], None),
            fs * 30,
        )
        results["bnlms"] = {
            "tpu_sps": Tb * 1024 / per,
            "cpp_sps": base,
            "snr_db": snr_db(pe, got),
        }

        # ------------ BNLMS (Pallas df32, bit-exact compat, 1024 streams) ----
        if _want("bnlms_pallas"):
            from jeicyboodsp_tpu.kernels.nlms_pallas import bnlms_pallas

            Bbn, Tbn = 1024, 65536
            xbn = jnp.asarray(rng.integers(-3000, 3000, (Bbn, Tbn)).astype(np.int16))
            rbn = jnp.asarray(rng.integers(-3000, 3000, (Bbn, Tbn)).astype(np.int16))

            @partial(jax.jit, static_argnames=("k",))
            def bnp_chain(xx, rr, k):
                def body(i, acc):
                    e1, _ = bnlms_pallas(acc, rr)
                    return acc + (e1 & 1)

                return jax.lax.fori_loop(0, k, body, xx)

            per = amortized(lambda k: jax.device_get(bnp_chain(xbn, rbn, k)[0, :4]))
            gb = np.asarray(
                bnlms_pallas(jnp.asarray(xb_[None, : 16 * 1024]), jnp.asarray(rb_[None, : 16 * 1024]))[0]
            )[0][1024:]
            results["bnlms_pallas"] = {
                "tpu_sps": Bbn * Tbn / per,
                "cpp_sps": base,
                "kernel_exact_vs_oracle": bool((gb.astype(np.int64) == pe.astype(np.int64)).all()),
            }

        # ------------ BNLMS time-parallel (affine associative scan) ---------
        if _want("bnlms_timeparallel"):
            from jeicyboodsp_tpu.ops.nlms import bnlms_apply_timeparallel

            Ttp = 1024  # one session, many blocks: the time-sharding shape
            # (W is (T, 1024, 128) f32 = 0.5 GB at this T; the A-build
            # einsums keep peak memory ~2x that)
            xtp = jnp.asarray(np.tile(xb_, -(-Ttp * 1024 // len(xb_)))[: Ttp * 1024]
                              .reshape(Ttp, 1024))
            rtp = jnp.asarray(np.tile(rb_, -(-Ttp * 1024 // len(rb_)))[: Ttp * 1024]
                              .reshape(Ttp, 1024))

            @partial(jax.jit, static_argnames=("k",))
            def tp_chain(xx, rr, k):
                def body(i, acc):
                    e1, _ = bnlms_apply_timeparallel(acc, rr, dtype=jnp.float32)
                    return acc + (e1 & 1)

                return jax.lax.fori_loop(0, k, body, xx)

            per_tp = amortized(lambda k: jax.device_get(tp_chain(xtp, rtp, k)[0, :4]),
                               n1=2, n2=12)
            e_tp, r_tp = bnlms_apply_timeparallel(
                jnp.asarray(xb_[: 16 * 1024].reshape(-1, 1024)),
                jnp.asarray(rb_[: 16 * 1024].reshape(-1, 1024)),
                dtype=jnp.float32,
            )
            gtp = np.asarray(e_tp)[1:].reshape(-1)
            rtp_o = np.asarray(r_tp)[1:].reshape(-1)
            results["bnlms_timeparallel"] = {
                "tpu_sps": Ttp * 1024 / per_tp,
                "cpp_sps": base,
                # vs the f64 oracle (the sequential compat ground truth):
                # the linearized recursion tracks it to +-LSB class.  The
                # SNR basis is the ERROR signal (the AEC output users
                # consume; the est starts near zero, so its SNR is
                # denominated by +-1 LSB flips on a tiny signal)
                "snr_db": float(min(snr_db(perr, rtp_o), 200.0)),
                "max_abs_diff_vs_oracle": int(
                    np.abs(gtp.astype(np.int64) - pe.astype(np.int64)).max()
                ),
            }

    # ---------------- MVDR ----------------
    if _want("mvdr"):
        from jeicyboodsp_tpu.ops.mvdr import mvdr_blocks

        Tm = 8192
        sp = mixed_signal(Tm * 512)
        xl_ = sp
        xr_ = np.clip(0.8 * sp.astype(np.float64) + rng.normal(0, 15, len(sp)), -32768, 32767).astype(np.int16)
        ml = jnp.asarray(xl_.reshape(Tm, 512))
        mr = jnp.asarray(xr_.reshape(Tm, 512))

        @partial(jax.jit, static_argnames=("n",))
        def mv_chain(l, r, n):
            def body(i, carry):
                l0, acc = carry
                out, _ = mvdr_blocks(l0, r, 0.0, dtype=jnp.float32, fft_engine="mxu3")
                return l0 + (out & 1).astype(jnp.int16), acc + jnp.sum(out.astype(jnp.int32))

            return jax.lax.fori_loop(0, n, body, (l, jnp.int32(0)))[1]

        # theta=0 collapsed path is VPU-elementwise (~34 G samples/s): the
        # timing window must out-scale tunnel jitter by a wide margin
        per = amortized(lambda k: jax.device_get(mv_chain(ml, mr, k)), n1=2, n2=302)
        from jeicyboodsp_tpu.oracle import mvdr as omv

        want = omv.run(xl_[: 64 * 512], xr_[: 64 * 512])
        got, msk = mvdr_blocks(
            jnp.asarray(xl_[: 64 * 512].reshape(-1, 512)),
            jnp.asarray(xr_[: 64 * 512].reshape(-1, 512)),
            0.0,
            dtype=jnp.float32,
            fft_engine="mxu3",
        )
        got = np.asarray(got)[np.asarray(msk)].reshape(-1)
        write_wav("/tmp/b_mv_l.wav", xl_[: fs * 30], fs)
        write_wav("/tmp/b_mv_r.wav", xr_[: fs * 30], fs)
        base = cpp_sps(
            "mvdr", lambda: (["/tmp/b_mv_l.wav", "/tmp/b_mv_r.wav", "/tmp/b_mv_o.pcm"], None), fs * 30
        )
        results["mvdr"] = {
            "tpu_sps": Tm * 512 / per,
            "cpp_sps": base,
            "snr_db": snr_db(want, got),
        }

    # ---------------- MFCC ----------------
    if _want("mfcc"):
        from jeicyboodsp_tpu.ops.features import dct_lifter_matrix, mel_matrix, mfcc_blocks

        Tf = 8192
        xf = mixed_signal(Tf * 1024)
        fblocks = jnp.asarray(xf.reshape(Tf, 1024))
        mel_m = jnp.asarray(mel_matrix(np.float32))
        dct_m = jnp.asarray(dct_lifter_matrix(np.float32))

        @partial(jax.jit, static_argnames=("n",))
        def mf_chain(bk, n):
            def body(i, carry):
                cur, acc = carry
                feats = mfcc_blocks(cur, mel_m, dct_m, dtype=jnp.float32, fft_engine="mxu3")
                return cur + (feats[0, 0] > acc).astype(jnp.int16), acc + jnp.sum(feats)

            return jax.lax.fori_loop(0, n, body, (bk, jnp.float32(0)))[1]

        per = amortized(lambda k: jax.device_get(mf_chain(fblocks, k)), n1=2, n2=22)
        from jeicyboodsp_tpu.oracle import mfcc as omf

        probe = xf[: 32 * 1024]
        want = omf.run(probe)
        got = np.asarray(
            mfcc_blocks(
                jnp.asarray(probe.reshape(-1, 1024)), mel_m, dct_m,
                dtype=jnp.float32, fft_engine="mxu3",
            )
        )[1 : 1 + len(want)].reshape(want.shape)
        open("/tmp/b_mfcc_list.txt", "w").write("/tmp/b_mfcc_in.wav /tmp/b_mfcc_out.mfc\n")
        write_wav("/tmp/b_mfcc_in.wav", xf[: fs * 60], fs)
        base = cpp_sps("mfcc", lambda: (["/tmp/b_mfcc_list.txt"], None), fs * 60)
        results["mfcc"] = {
            "tpu_sps": Tf * 1024 / per,
            "cpp_sps": base,
            "snr_db": snr_db(want, np.asarray(got)),
        }

    # ---------------- FFT roundtrip ----------------
    if _want("fft", "fft_roundtrip"):
        from jeicyboodsp_tpu.ops.fft import roundtrip_blocks

        Tr = 16384
        xr2 = mixed_signal(Tr * 512)
        rblocks = jnp.asarray(xr2.reshape(Tr, 512))

        @partial(jax.jit, static_argnames=("n",))
        def rt_chain(bk, n):
            def body(i, carry):
                cur, acc = carry
                out = roundtrip_blocks(cur, dtype=jnp.float32, engine="xla")
                return cur + (out & 1).astype(jnp.int16), acc + jnp.sum(out.astype(jnp.int32))

            return jax.lax.fori_loop(0, n, body, (bk, jnp.int32(0)))[1]

        per = amortized(lambda k: jax.device_get(rt_chain(rblocks, k)))
        write_wav("/tmp/b_fft.wav", xr2[: fs * 60], fs)
        base = cpp_sps("fft", lambda: (["/tmp/b_fft.wav", "/tmp/b_fft_out.pcm"], None), fs * 60)
        from jeicyboodsp_tpu.oracle import fftprog

        want = fftprog.run(xr2[: 16 * 512])
        got = np.asarray(roundtrip_blocks(jnp.asarray(xr2[: 16 * 512].reshape(-1, 512)), dtype=jnp.float32, engine="xla")).reshape(-1)
        results["fft_roundtrip"] = {
            "tpu_sps": Tr * 512 / per,
            "cpp_sps": base,
            "snr_db": snr_db(want, got),
        }

    # ---------------- pitch (methods 1-3 share the frame setup) ----------------
    if _want("pitch", "pitch1", "pitch2", "pitch3"):
        from jeicyboodsp_tpu.ops.features import pitch_frames

        Tp = 16384
        xp = mixed_signal(Tp * 512)
        pb = jnp.asarray(xp.reshape(Tp, 512))
        frames = jnp.concatenate(
            [jnp.concatenate([jnp.zeros((1, 512), jnp.int16), pb[:-1]]), pb], axis=1
        )
        write_wav("/tmp/b_p.wav", xp[: fs * 60], fs)

        if _want("pitch", "pitch1"):
            @partial(jax.jit, static_argnames=("n",))
            def p_chain(fr, n):
                def body(i, carry):
                    cur, acc = carry
                    args, vals, f0 = pitch_frames(cur, method=1, dtype=jnp.float32, fft_engine="mxu3")
                    return cur + (args[0] % 2).astype(jnp.int16), acc + jnp.sum(args)

                return jax.lax.fori_loop(0, n, body, (fr, jnp.int32(0)))[1]

            per = amortized(lambda k: jax.device_get(p_chain(frames, k)), n1=5, n2=105)
            base = cpp_sps("pitch1", lambda: (["/tmp/b_p.wav"], None), fs * 60)
            results["pitch1"] = {"tpu_sps": Tp * 512 / per, "cpp_sps": base}

        # ------------ pitch methods 2 and 3 (AMDF / direct autocorr) ------------
        for method, name in ((2, "pitch2"), (3, "pitch3")):
            if not _want("pitch", name):
                continue

            @partial(jax.jit, static_argnames=("n", "m"))
            def p_chain23(fr, n, m):
                def body(i, carry):
                    cur, acc = carry
                    # m3: Wiener-Khinchin matmul; m2: VMEM-resident Pallas AMDF
                    args, vals, f0 = pitch_frames(cur, method=m, dtype=jnp.float32, fft_engine="mxu")
                    return cur + (args[:, None] % 2).astype(jnp.int16), acc + jnp.sum(args)

                return jax.lax.fori_loop(0, n, body, (fr, jnp.int32(0)))[1]

            per = amortized(
                lambda k: jax.device_get(p_chain23(frames[:2048], k, method)),
                n1=5, n2=105 if method == 3 else 25,
            )
            base = cpp_sps(name, lambda: (["/tmp/b_p.wav"], None), fs * 60)
            results[name] = {"tpu_sps": 2048 * 512 / per, "cpp_sps": base}

    # ---------------- per-sample NLMS (Pallas, 1024 streams) ----------------
    if _want("nlms", "nlms_pallas"):
        from jeicyboodsp_tpu.kernels.nlms_pallas import nlms_pallas
        from jeicyboodsp_tpu.oracle import nlms as onl

        Bn, Tn = 1024, 65536
        xn = jnp.asarray(rng.integers(-3000, 3000, (Bn, Tn)).astype(np.int16))
        rn = jnp.asarray(rng.integers(-3000, 3000, (Bn, Tn)).astype(np.int16))

        @partial(jax.jit, static_argnames=("k",))
        def nl_chain(xx, rr, k):
            def body(i, acc):
                e1, _ = nlms_pallas(acc, rr)
                return acc + (e1 & 1)

            return jax.lax.fori_loop(0, k, body, xx)

        per = amortized(lambda k: jax.device_get(nl_chain(xn, rn, k)[0, :4]))
        # exactness probe vs the f64 oracle (df32 coefficient state)
        npr = 8192
        xo = np.asarray(xn[0, :npr])
        h = rng.normal(0, 0.1, 32)
        h[0] = 0.5
        ro = np.clip(np.convolve(xo.astype(np.float64), h)[:npr], -32768, 32767).astype(np.int16)
        st = onl.NLMSState()
        oe = np.concatenate(
            [onl.nlms_block(st, xo[i : i + 1024], ro[i : i + 1024])[0] for i in range(0, npr, 1024)]
        )
        ge = np.asarray(nlms_pallas(jnp.asarray(xo[None]), jnp.asarray(ro[None]))[0])[0]
        # baseline: input header skipped, reference not (NormalLMS.cpp:65-66)
        reps = fs * 10 // npr + 1
        write_wav("/tmp/b_nlms_in.wav", np.tile(xo, reps)[: fs * 10], fs)
        write_pcm16("/tmp/b_nlms_ref.pcm", np.tile(ro, reps)[: fs * 10])
        base = cpp_sps(
            "nlms",
            lambda: (["/tmp/b_nlms_in.wav", "/tmp/b_nlms_ref.pcm", "/tmp/b_nl_e.pcm", "/tmp/b_nl_r.pcm"], None),
            fs * 10,
        )
        results["nlms_pallas"] = {
            "tpu_sps": Bn * Tn / per,
            "cpp_sps": base,
            "kernel_exact_vs_oracle": bool((ge.astype(np.int64) == oe.astype(np.int64)).all()),
        }

        # fast mode (r5, VERDICT r4 item 8): single-dot estimate + O(1)
        # df32 running window energy; df32 coefficient state retained
        @partial(jax.jit, static_argnames=("k",))
        def nl_chain_fast(xx, rr, k):
            def body(i, acc):
                e1, _ = nlms_pallas(acc, rr, fast=True)
                return acc + (e1 & 1)

            return jax.lax.fori_loop(0, k, body, xx)

        per_f = amortized(lambda k: jax.device_get(nl_chain_fast(xn, rn, k)[0, :4]))
        gf = np.asarray(nlms_pallas(jnp.asarray(xo[None]), jnp.asarray(ro[None]),
                                    fast=True)[0])[0]
        # measured-neutral (r5): the saved reduce/dot did NOT buy throughput
        # -- the df32 coefficient two-sum update (kept per the fidelity
        # contract) is the kernel's real cost, and the fast/exact delta is
        # within tunnel jitter.  Kept as the honest record; snr capped (the
        # probe often comes out truncation-identical -> infinite SNR).
        results["nlms_fast"] = {
            "tpu_sps": Bn * Tn / per_f,
            "cpp_sps": base,
            "snr_db": float(min(snr_db(oe, gf), 200.0)),
        }

    # ---------------- LPC ----------------
    if _want("lpc"):
        from jeicyboodsp_tpu.ops.features import lpc_frames

        Tl = 8192
        xl2 = mixed_signal(Tl * 256)
        lb = xl2.reshape(Tl, 256)
        lframes = jnp.asarray(
            np.concatenate([np.concatenate([np.zeros((1, 256), np.int16), lb[:-1]]), lb], axis=1)
        )

        @partial(jax.jit, static_argnames=("n",))
        def lpc_chain(fr, n):
            def body(i, carry):
                cur, acc = carry
                co = lpc_frames(cur, dtype=jnp.float32, solver="levinson")
                return cur + (co[:, :1] > acc).astype(jnp.int16), acc + jnp.sum(co)

            return jax.lax.fori_loop(0, n, body, (fr, jnp.float32(0)))[1]

        per = amortized(lambda k: jax.device_get(lpc_chain(lframes, k)), n1=2, n2=42)
        write_wav("/tmp/b_lpc.wav", xl2[: fs * 60], fs)
        base = cpp_sps("lpc", lambda: (["/tmp/b_lpc.wav", "/tmp/b_lpc.out"], None), fs * 60)
        results["lpc"] = {"tpu_sps": Tl * 256 / per, "cpp_sps": base}

    # ---------------- Viterbi decode throughput ----------------
    if _want("viterbi", "viterbi_decode", "viterbi_decode_batched"):
        from jeicyboodsp_tpu.models.hmm import viterbi, viterbi_assoc

        F = 4096  # frames
        feats = jnp.asarray(rng.normal(0, 1.0, (F, 12)).astype(np.float32))
        alpha6 = jnp.full((6, 4), 0.25, jnp.float32)
        mean6 = jnp.asarray(rng.normal(0, 1, (6, 4, 12)).astype(np.float32))
        cov6 = jnp.broadcast_to(jnp.eye(12, dtype=jnp.float32), (6, 4, 12, 12)) * 2.0
        eig6 = jnp.broadcast_to(jnp.eye(12, dtype=jnp.float32)[:, :4], (6, 4, 12, 4))
        trans = jnp.full((6, 6), 1.0 / 6, jnp.float32)

        # --- single-core C++ baseline: the reference decodes one utterance
        # per HMMRecognition call and heap-corrupts/aborts inside decode's
        # frees AFTER printing the path (Viterbi_version1.cpp:209-241), so
        # each run decodes exactly one F-frame utterance; timing covers the
        # full DP (the abort happens after the work).  The model is packed
        # with small variances (densities >> 1) so the DP stays finite.
        import tempfile

        from jeicyboodsp_tpu.models import serialization as _ser

        vdir = tempfile.mkdtemp(prefix="bench_vit_")
        _states = []
        for m in range(6):
            _a = np.full(4, 0.25)
            _mn = np.zeros((4, 12))
            _mn[:, :4] = rng.normal(0, 2, (4, 4))
            _cv = np.stack([np.eye(12) * 0.01 for _ in range(4)])
            _ev = np.zeros((4, 12, 4))
            for k in range(4):
                q, _ = np.linalg.qr(rng.normal(0, 1, (12, 4)))
                _ev[k] = q
            _states.append((_a, _mn, _cv, _ev))
        _transn = rng.dirichlet(np.ones(6), size=6) + 0.5
        _transn /= _transn.sum(axis=1, keepdims=True)
        hmm_path = os.path.join(vdir, "hmm.bin")
        open(hmm_path, "wb").write(_ser.pack_hmm(_states, _transn))
        _seq = rng.integers(0, 6, F)
        _obs = np.zeros((F, 12))
        for t in range(F):
            _a, _mn, _cv, _ev = _states[_seq[t]]
            _obs[t] = _ev[0] @ _mn[0][:4] + rng.normal(0, 0.02, 12)
        mfc = os.path.join(vdir, "obs.mfc")
        _obs.astype("<f8").tofile(mfc)
        clst = os.path.join(vdir, "v.lst")
        open(clst, "w").write(mfc)  # no trailing whitespace (fscanf quirk)
        vmain = os.path.join(vdir, "vmain.lst")
        open(vmain, "w").write(clst)
        base_v = cpp_sps("viterbi", lambda: ([vmain, hmm_path], None), F)

        if _want("viterbi", "viterbi_decode"):
            @partial(jax.jit, static_argnames=("n",))
            def vit_chain(f0, n):
                def body(i, carry):
                    cur, acc = carry
                    path, score = viterbi(cur, alpha6, mean6, cov6, eig6, trans, compat=False)
                    return cur + (path[:, None] % 2).astype(jnp.float32) * 1e-6, acc + score

                return jax.lax.fori_loop(0, n, body, (f0, jnp.float32(0)))[1]

            per = amortized(lambda k: jax.device_get(vit_chain(feats, k)), n1=1, n2=5)

            # O(log T) max-plus associative-scan decode (the TPU-native
            # single-utterance fast path; same result as the lax.scan form)
            @partial(jax.jit, static_argnames=("n",))
            def vita_chain(f0, n):
                def body(i, carry):
                    cur, acc = carry
                    path, score = viterbi_assoc(cur, alpha6, mean6, cov6, eig6, trans)
                    return cur + (path[:, None] % 2).astype(jnp.float32) * 1e-6, acc + score

                return jax.lax.fori_loop(0, n, body, (f0, jnp.float32(0)))[1]

            per_a = amortized(lambda k: jax.device_get(vita_chain(feats, k)), n1=2, n2=22)
            results["viterbi_decode"] = {
                "frames_per_s": F / per,
                "frames_per_s_assoc": F / per_a,
                "tpu_sps": F / per_a,  # the shipped single-utterance path
                "cpp_sps": base_v,
            }

        # ------------ batched (corpus) Viterbi decode ------------
        if _want("viterbi", "viterbi_decode_batched"):
            from jeicyboodsp_tpu.models.hmm import viterbi_batched

            U, Tv = 512, 512  # utterances x frames: the corpus-decode axis
            featsB = jnp.asarray(rng.normal(0, 1.0, (U, Tv, 12)).astype(np.float32))
            lensB = jnp.full((U,), Tv, jnp.int32)

            @partial(jax.jit, static_argnames=("n",))
            def vitb_chain(f0, n):
                def body(i, carry):
                    cur, acc = carry
                    paths, scores = viterbi_batched(
                        cur, lensB, alpha6, mean6, cov6, eig6, trans, compat=False
                    )
                    return cur + (paths[..., None] % 2).astype(jnp.float32) * 1e-6, acc + jnp.sum(scores)

                return jax.lax.fori_loop(0, n, body, (f0, jnp.float32(0)))[1]

            per = amortized(lambda k: jax.device_get(vitb_chain(featsB, k)), n1=1, n2=5)
            results["viterbi_decode_batched"] = {
                "frames_per_s": U * Tv / per,
                "utterances": U,
                "tpu_sps": U * Tv / per,
                "cpp_sps": base_v,  # per-frame single-core DP rate (the
                # reference has no batch axis; one utterance per process)
            }

    # ---------------- GMM train / classify vs their binaries ----------------
    # (VERDICT r3 missing-1: the reference's worst hot loops -- per-frame-
    # per-mixture eigendecomposition in training, GMMAlgorithm_Train_Auto_
    # ver2.cpp:189-253 -- had no measured vs-C++ ratio.)
    if _want("gmm", "gmm_train", "gmm_test"):
        import tempfile

        from jeicyboodsp_tpu.models import gmm as MG
        from jeicyboodsp_tpu.models import serialization as gser

        C, Fg = 25, 512

        def synth_class(seed, n):
            # separated sub-clusters so the k-means seeds (frames 0,4,8,12 --
            # the reference's choice) land in distinct clusters; empty
            # clusters would make covariances singular
            r = np.random.default_rng(seed)
            center = r.normal(0, 10, 12)
            sub = center + r.normal(0, 4.0, (4, 12))
            ids = (np.arange(n) // 4) % 4
            return sub[ids] + r.normal(0, 0.5, (n, 12))

        gcls = np.stack([synth_class(1000 + c, Fg) for c in range(C)])
        gdir = tempfile.mkdtemp(prefix="bench_gmm_")
        glists = []
        for c in range(C):
            p = os.path.join(gdir, f"c{c}.mfc")
            gcls[c].astype("<f8").tofile(p)
            lst = os.path.join(gdir, f"c{c}.lst")
            open(lst, "w").write(p)  # no trailing whitespace (fscanf quirk)
            glists.append(lst)
        gmain = os.path.join(gdir, "train.lst")
        open(gmain, "w").write("\n".join(glists))
        gmodel = os.path.join(gdir, "model.bin")

        if _want("gmm", "gmm_train"):
            base_gt = cpp_sps("gmm_train", lambda: ([gmain, gmodel], None), C * Fg)
            frj = jnp.asarray(gcls.astype(np.float32))
            mkj = jnp.ones((C, Fg), bool)

            @partial(jax.jit, static_argnames=("n",))
            def gt_chain(f0, n):
                def body(i, carry):
                    cur, acc = carry
                    a, m, cv, ev = MG.train_classes_batched(cur, mkj)
                    return cur + m[:, :1, :] * 1e-9, acc + jnp.sum(a)

                return jax.lax.fori_loop(0, n, body, (f0, jnp.float32(0)))[1]

            per = amortized(lambda k: jax.device_get(gt_chain(frj, k)), n1=1, n2=5)
            results["gmm_train"] = {
                "tpu_sps": C * Fg / per,  # frames/s through the full
                # seed+kmeans+EMx3+PCA8 chain, all 25 classes batched
                "cpp_sps": base_gt,
                "classes": C,
                "frames_per_class": Fg,
            }
        else:  # gmm_test alone still needs the model file
            subprocess.run(
                [os.path.join(BIN, "gmm_train"), gmain, gmodel],
                stdin=subprocess.DEVNULL, stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
            )

        if _want("gmm", "gmm_test"):
            # test corpus: 4 files x 128 frames per class
            nf, Ft = 4, 128
            r2 = np.random.default_rng(555)
            tfr = []
            tlists = []
            for c in range(C):
                paths = []
                for j in range(nf):
                    fr = gcls[c][r2.integers(0, Fg, Ft)] + r2.normal(0, 0.3, (Ft, 12))
                    p = os.path.join(gdir, f"t{c}_{j}.mfc")
                    fr.astype("<f8").tofile(p)
                    tfr.append(fr)
                    paths.append(p)
                lst = os.path.join(gdir, f"t{c}.lst")
                open(lst, "w").write("\n".join(paths))
                tlists.append(lst)
            tmain = os.path.join(gdir, "test.lst")
            open(tmain, "w").write("\n".join(tlists))
            base_ge = cpp_sps("gmm_test", lambda: ([tmain, gmodel], None), C * nf * Ft)

            # TPU scorer on the SAME (mismatched-layout) model the binary
            # reads -- the authentic chained-system behavior
            params4 = gser.read_as_test_layout(gmodel, C)
            al = jnp.asarray(np.stack([p[0] for p in params4]).astype(np.float32))
            me = jnp.asarray(np.stack([p[1] for p in params4]).astype(np.float32))
            cv = jnp.asarray(np.stack([p[2] for p in params4]).astype(np.float32))
            ev = jnp.asarray(np.stack([p[3] for p in params4]).astype(np.float32))
            tfj = jnp.asarray(np.stack(tfr).astype(np.float32))  # (C*nf, Ft, 12)

            @partial(jax.jit, static_argnames=("n",))
            def ge_chain(f0, n):
                def body(i, carry):
                    cur, acc = carry
                    sc = jax.vmap(
                        lambda f: MG.score_frames_all_classes(f, al, me, cv, ev)
                    )(cur)
                    sc = jnp.nan_to_num(sc)  # mismatched layout -> NaN scores
                    return cur + sc[:, :1, None] * 1e-9, acc + jnp.sum(sc)

                return jax.lax.fori_loop(0, n, body, (f0, jnp.float32(0)))[1]

            # tiny per-iteration time: the window must out-scale ms tunnel
            # jitter (n2=22 NaN'd out through the widening retries)
            per = amortized(lambda k: jax.device_get(ge_chain(tfj, k)), n1=8, n2=808)
            results["gmm_test"] = {
                "tpu_sps": C * nf * Ft / per,  # frames/s, each scored
                # against all 25 classes x 4 mixtures
                "cpp_sps": base_ge,
                "files": C * nf,
            }

    # ---------------- end-to-end speech pipeline (no file boundaries) ----------------
    # reference equivalent: MFCC + GMM-train + GMM-test chained via binary
    # feature files across three processes; here one jitted graph each.
    if _want("speech", "speech_pipeline"):
        from jeicyboodsp_tpu.pipelines.speech import speech_classify, speech_train

        C, Ts = 25, 64  # 25 classes x 64 blocks (128 frames) per class
        audio = jnp.asarray(
            rng.integers(-8000, 8000, (C, Ts, 1024)).astype(np.int16)
        )
        # block_until_ready is unreliable through the axon tunnel: sync by
        # device_get of a scalar (CLAUDE.md).  Includes ~28 ms dispatch overhead.
        def train_sync():
            a, m, c, e = speech_train(audio, fft_engine="mxu3")
            jax.device_get(jnp.sum(m))
            return a, m, c, e

        t0 = time.perf_counter()
        train_sync()
        train_cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        alphas, means, covs, eig = train_sync()
        train_warm = time.perf_counter() - t0
        utt = audio[0]
        eig4 = eig[:, :, :, :4]

        def cls_sync():
            sc = speech_classify(utt, alphas, means, covs, eig4, fft_engine="mxu3")
            jax.device_get(jnp.sum(sc))
            return sc

        scores = cls_sync()
        t0 = time.perf_counter()
        for _ in range(5):
            scores = cls_sync()
        cls_t = (time.perf_counter() - t0) / 5
        results["speech_pipeline"] = {
            "train_s_25cls_x_128frames": train_warm,
            "train_compile_s": train_cold - train_warm,
            "classify_s_per_utterance": cls_t,
            "classify_argmax": int(np.argmax(np.asarray(scores))),
        }

    # ---------------- single-block latency (real-time budget) ----------------
    # The reference is a real-time block processor (512-sample frame =
    # 32 ms at 16 kHz, WienerFilter_final.cpp:43); the throughput rows are
    # amortized over huge batches.  These rows chain SINGLE-block streaming
    # steps with carried state on-device, so per-iteration time is the true
    # on-device block latency (the ~25-30 ms tunnel dispatch floor per host
    # call is reported separately -- it amortizes out of the chain).
    if _want("latency"):
        lat = {}
        # host-call dispatch floor: median round-trip of a trivial jitted op
        triv = jax.jit(lambda v: v + 1)
        jax.device_get(triv(jnp.zeros(8)))
        ds = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.device_get(triv(jnp.zeros(8)))
            ds.append(time.perf_counter() - t0)
        lat["dispatch_floor_ms"] = float(np.median(ds)) * 1e3

        # enhance: the streaming chunk path (enhance_chunk, Tc=1)
        from jeicyboodsp_tpu.ops.enhance import enhance_chunk, stream_init_state

        st0 = stream_init_state(jnp.float32)
        blk1 = jnp.asarray(mixed_signal(512).reshape(1, 512))

        @partial(jax.jit, static_argnames=("n",))
        def enh_lat(b, n):
            def body(i, carry):
                st, acc = carry
                out, m, st = enhance_chunk(st, b, mode="wiener", dtype=jnp.float32)
                return st, acc + jnp.sum(out.astype(jnp.int32))

            return jax.lax.fori_loop(0, n, body, (st0, jnp.int32(0)))[1]

        per = amortized(lambda k: jax.device_get(enh_lat(blk1, k)), n1=16, n2=272)
        lat["enhance_block_us"] = per * 1e6

        # GEQ: the df32 bit-exact streaming cascade on one 512-sample block
        from jeicyboodsp_tpu.kernels.biquad_pallas import (
            geq_cascade_pallas_quant,
            pack_coefficients_df,
        )
        from jeicyboodsp_tpu.ops.geq import geq_coefficients

        bq, aq = geq_coefficients()
        coefq = jnp.asarray(pack_coefficients_df(bq, aq))
        gblk = jnp.asarray(mixed_signal(512, 48000).reshape(1, 512))

        @partial(jax.jit, static_argnames=("n",))
        def geq_lat(b, n):
            y0, s0 = geq_cascade_pallas_quant(b, coefq)

            def body(i, carry):
                s, acc = carry
                y, s = geq_cascade_pallas_quant(b, coefq, state=s)
                return s, acc + jnp.sum(y.astype(jnp.int32))

            return jax.lax.fori_loop(0, n, body, (s0, jnp.int32(0)))[1]

        per = amortized(lambda k: jax.device_get(geq_lat(gblk, k)), n1=16, n2=272)
        lat["geq_block_us"] = per * 1e6

        # BNLMS: one 1024-sample AEC block (estimate + gate + update)
        from jeicyboodsp_tpu.ops.nlms import bnlms_apply_block, bnlms_init_state

        bst0 = bnlms_init_state(jnp.float32)
        xb1 = jnp.asarray(mixed_signal(1024))
        rb1 = jnp.asarray(mixed_signal(1024))

        @partial(jax.jit, static_argnames=("n",))
        def bn_lat(n):
            def body(i, carry):
                st, acc = carry
                est, err, st = bnlms_apply_block(xb1, rb1, st, dtype=jnp.float32)
                return st, acc + jnp.sum(err.astype(jnp.int32))

            return jax.lax.fori_loop(0, n, body, (bst0, jnp.int32(0)))[1]

        per = amortized(lambda k: jax.device_get(bn_lat(k)), n1=16, n2=272)
        lat["bnlms_block_us"] = per * 1e6

        # frame budgets: 512 samples @ 16 kHz = 32 ms (enhance/bnlms uses
        # 1024 @ 16 kHz = 64 ms; geq: 512 @ 48 kHz = 10.67 ms)
        lat["enhance_blocks_per_32ms_budget"] = 32e3 / lat["enhance_block_us"]
        lat["geq_blocks_per_10p67ms_budget"] = (512 / 48000 * 1e6) / lat["geq_block_us"]
        lat["bnlms_blocks_per_64ms_budget"] = 64e3 / lat["bnlms_block_us"]
        results["latency"] = lat

    # ---------------- report ----------------
    for k, v in results.items():
        if v.get("cpp_sps"):
            v["speedup_vs_cpp"] = v["tpu_sps"] / v["cpp_sps"]
            if isinstance(v["cpp_sps"], _BaselineSps):
                v["cpp_raw_sps"] = v["cpp_sps"].raw  # per-run samples (median is cpp_sps)
    annotate_rooflines(results)
    out_path = os.path.join(ROOT, "bench", "results.json")
    merged = {}
    if groups is not None and os.path.exists(out_path):
        with open(out_path) as f:  # partial run: merge-update existing rows
            merged = json.load(f)
    merged.update(results)
    merged["_benched_tree"] = tree_stamp()  # artifact<->code staleness stamp
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    import sys as _sys
    main(set(_sys.argv[1:]) or None)
