#!/usr/bin/env python3
"""r5 TPU sweep: upgraded-fidelity enhance engines, fastconv gemm8 vs
gemm8hq, GEQ quant-kernel (unroll, groups) sweep.  One process."""
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

FS = 16000
rng = np.random.default_rng(20260821)
dev = jax.devices()[0]
out = {}

def make_signal(n):
    t = np.arange(n) / FS
    speech = 5000 * np.sin(2 * np.pi * 313 * t) * (np.sin(2 * np.pi * 0.5 * t) > 0.2)
    return np.clip(speech + rng.normal(0, 20, n), -32768, 32767).astype(np.int16)

def chain_time(fn, x0, n=51, reps=2):
    """min-of-reps chained-iteration timing; returns seconds/iter."""
    @functools.partial(jax.jit, static_argnames=("k",))
    def chained(b, k):
        def body(i, carry):
            cur, acc = carry
            o = fn(cur)
            nxt = cur + (o & 1).astype(cur.dtype)
            return nxt, acc + jnp.sum(o.astype(jnp.int32))
        _, acc = jax.lax.fori_loop(0, k, body, (b, jnp.int32(0)))
        return acc
    jax.device_get(chained(x0, 1)); jax.device_get(chained(x0, n))  # compile
    t1s, tns = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); jax.device_get(chained(x0, 1)); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); jax.device_get(chained(x0, n)); tns.append(time.perf_counter() - t0)
    return (min(tns) - min(t1s)) / (n - 1)

mode = sys.argv[1] if len(sys.argv) > 1 else "all"

if mode in ("all", "enh"):
    from jeicyboodsp_tpu.ops.enhance import enhance_blocks
    from jeicyboodsp_tpu.oracle import enhance as oenh
    T = 16384
    blocks = jax.device_put(jnp.asarray(make_signal(T * 512).reshape(T, 512)), dev)
    probe = make_signal(192 * 512)
    want = oenh.run(probe, "wiener").astype(np.float64)
    for eng in ("mxu8f", "mxu8", "mxu3"):
        cfg = dict(mode="wiener", dtype=jnp.float32, use_assoc_scan=True,
                   real_fft=True, resynth="ratio", fft_engine=eng)
        gb, m = enhance_blocks(jnp.asarray(probe.reshape(192, 512)), **cfg)
        got = np.asarray(gb)[np.asarray(m)].reshape(-1).astype(np.float64)
        snr = 10 * np.log10((want ** 2).sum() / max(((want - got) ** 2).sum(), 1e-30))
        per = chain_time(lambda b: enhance_blocks(b, **cfg)[0], blocks)
        out[f"enh_{eng}"] = {"G_sps": round(T * 512 / per / 1e9, 2),
                             "snr_db": round(float(snr), 2)}
        print(f"enh_{eng}: {out[f'enh_{eng}']}", flush=True)

if mode in ("all", "fc"):
    from jeicyboodsp_tpu.ops.fastconv import fastconv_blocks_gemm_int8
    from jeicyboodsp_tpu.oracle import fastconv as ofc
    Tf = 2048
    fblocks = jax.device_put(jnp.asarray(make_signal(Tf * 1024).reshape(Tf, 1024)), dev)
    xfc = make_signal(16 * 1024)
    want_fc = ofc.run(xfc).astype(np.float64)
    for terms in (2, 3):
        got = np.asarray(fastconv_blocks_gemm_int8(
            jnp.asarray(xfc.reshape(-1, 1024)), terms=terms)).reshape(-1).astype(np.float64)
        snr = 10 * np.log10((want_fc ** 2).sum() / max(((want_fc - got) ** 2).sum(), 1e-30))
        def fcrun(b, terms=terms):
            o = fastconv_blocks_gemm_int8(b, terms=terms)
            return jnp.concatenate([o, jnp.zeros((7, 1024), o.dtype)], axis=0)
        per = chain_time(fcrun, fblocks)
        out[f"fc_gemm8_t{terms}"] = {"G_sps": round((Tf - 7) * 1024 / per / 1e9, 2),
                                     "snr_db": round(float(snr), 2)}
        print(f"fc_gemm8_t{terms}: {out[f'fc_gemm8_t{terms}']}", flush=True)

if mode in ("all", "geq"):
    from jeicyboodsp_tpu.kernels import biquad_pallas as bq
    from jeicyboodsp_tpu.ops.geq import geq_coefficients
    b_, a_ = geq_coefficients()
    coef = bq.pack_coefficients_df(b_, a_)
    B, Tg = 4096, 49152
    xg = jax.device_put(jnp.asarray(
        rng.integers(-3000, 3000, (B, Tg)).astype(np.float32)), dev)
    for (u, g) in ((8, 1), (8, 2), (8, 4), (4, 4), (8, 8)):
        def geqrun(x, u=u, g=g):
            y, _ = bq.geq_cascade_pallas_quant(x, coef, unroll=u, groups=g)
            return y.astype(jnp.int16)
        try:
            per = chain_time(geqrun, xg.astype(jnp.int16), n=11)
            out[f"geq_u{u}_g{g}"] = {"G_sps": round(B * Tg / per / 1e9, 2)}
        except Exception as e:
            out[f"geq_u{u}_g{g}"] = {"error": repr(e)[:120]}
        print(f"geq_u{u}_g{g}: {out[f'geq_u{u}_g{g}']}", flush=True)

print(json.dumps(out))
