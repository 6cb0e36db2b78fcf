#!/usr/bin/env python3
"""TPU trial: mxu8f (fully-fused single-kernel engine) vs mxu8 vs mxu3.

Interleaved chained-fori timing (the only protocol that measures real time
through the tunnel) + SNR probe per engine.  One process so compiles stay
cheap after the first.
"""
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from jeicyboodsp_tpu.ops.enhance import enhance_blocks
from jeicyboodsp_tpu.oracle import enhance as oenh

BENCH_T = 16384
PROBE_T = 192
FS = 16000

def make_signal(n, rng):
    t = np.arange(n) / FS
    speech = 5000 * np.sin(2 * np.pi * 313 * t) * (np.sin(2 * np.pi * 0.5 * t) > 0.2)
    return np.clip(speech + rng.normal(0, 20, n), -32768, 32767).astype(np.int16)

def cfg(engine):
    return dict(mode="wiener", dtype=jnp.float32, use_assoc_scan=True,
                real_fft=True, resynth="ratio", fft_engine=engine)

ENGINES = sys.argv[1].split(",") if len(sys.argv) > 1 else ["mxu8f", "mxu8", "mxu3"]

rng = np.random.default_rng(20260821)
dev = jax.devices()[0]
probe = make_signal(PROBE_T * 512, rng)
want = oenh.run(probe, "wiener").astype(np.float64)
snr = {}
for eng in ENGINES:
    got_blocks, mask = enhance_blocks(jnp.asarray(probe.reshape(PROBE_T, 512)), **cfg(eng))
    got = np.asarray(got_blocks)[np.asarray(mask)].reshape(-1).astype(np.float64)
    err = want - got
    snr[eng] = round(float(10 * np.log10(np.sum(want**2) / max(np.sum(err**2), 1e-30))), 2)
    print(f"{eng}: snr={snr[eng]} dB", flush=True)

x = make_signal(BENCH_T * 512, rng)
blocks = jax.device_put(jnp.asarray(x.reshape(BENCH_T, 512)), dev)

@functools.partial(jax.jit, static_argnames=("n", "engine"))
def chained(b, n, engine):
    def body(i, carry):
        cur, acc = carry
        out, m = enhance_blocks(cur, **cfg(engine))
        nxt = cur + (out & 1).astype(jnp.int16)
        return nxt, acc + jnp.sum(out.astype(jnp.int32))
    _, acc = jax.lax.fori_loop(0, n, body, (b, jnp.int32(0)))
    return acc

def timed(eng, n):
    t0 = time.perf_counter()
    jax.device_get(chained(blocks, n, eng))
    return time.perf_counter() - t0

for eng in ENGINES:
    t0 = time.perf_counter()
    timed(eng, 1); timed(eng, 51)
    print(f"{eng}: warm/compile {time.perf_counter()-t0:.1f}s", flush=True)

t1 = {e: [] for e in ENGINES}
tn = {e: [] for e in ENGINES}
for _ in range(3):
    for eng in ENGINES:
        t1[eng].append(timed(eng, 1))
    for eng in ENGINES:
        tn[eng].append(timed(eng, 51))
res = {}
for e in ENGINES:
    per = (min(tn[e]) - min(t1[e])) / 50
    res[e] = {"G_sps": round(BENCH_T * 512 / per / 1e9, 2), "snr_db": snr[e],
              "t1_ms": [round(v * 1e3, 1) for v in t1[e]],
              "tn_ms": [round(v * 1e3, 1) for v in tn[e]]}
print(json.dumps(res))
