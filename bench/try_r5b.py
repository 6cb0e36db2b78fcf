#!/usr/bin/env python3
"""r5 sweep B: mxu8f tile-size F, turbo-full variant, GEQ (u, g) extras."""
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

FS = 16000
rng = np.random.default_rng(20260822)
dev = jax.devices()[0]
out = {}

def make_signal(n):
    t = np.arange(n) / FS
    speech = 5000 * np.sin(2 * np.pi * 313 * t) * (np.sin(2 * np.pi * 0.5 * t) > 0.2)
    return np.clip(speech + rng.normal(0, 20, n), -32768, 32767).astype(np.int16)

def chain_time(fn, x0, n=51, reps=2):
    @functools.partial(jax.jit, static_argnames=("k",))
    def chained(b, k):
        def body(i, carry):
            cur, acc = carry
            o = fn(cur)
            nxt = cur + (o & 1).astype(cur.dtype)
            return nxt, acc + jnp.sum(o.astype(jnp.int32))
        _, acc = jax.lax.fori_loop(0, k, body, (b, jnp.int32(0)))
        return acc
    jax.device_get(chained(x0, 1)); jax.device_get(chained(x0, n))
    t1s, tns = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); jax.device_get(chained(x0, 1)); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); jax.device_get(chained(x0, n)); tns.append(time.perf_counter() - t0)
    return (min(tns) - min(t1s)) / (n - 1)

mode = sys.argv[1] if len(sys.argv) > 1 else "all"

if mode in ("all", "enh"):
    from jeicyboodsp_tpu.ops import enhance as E
    T = 16384
    blocks = jax.device_put(jnp.asarray(make_signal(T * 512).reshape(T, 512)), dev)
    for name, F, hq in (("f128_hq", 128, True), ("f256_hq", 256, True),
                        ("f512_hq", 512, True), ("f256_turbo", 256, False),
                        ("f512_turbo", 512, False)):
        def run(b, F=F, hq=hq):
            o, _ = E._enhance_fused_full(b, "wiener", emit_all=False, F=F, hq=hq)
            return o
        try:
            per = chain_time(jax.jit(run), blocks)
            out[f"mxu8f_{name}"] = {"G_sps": round(T * 512 / per / 1e9, 2)}
        except Exception as e:
            out[f"mxu8f_{name}"] = {"error": repr(e)[:150]}
        print(f"mxu8f_{name}: {out[f'mxu8f_{name}']}", flush=True)

if mode in ("all", "geq"):
    from jeicyboodsp_tpu.kernels import biquad_pallas as bq
    from jeicyboodsp_tpu.ops.geq import geq_coefficients
    b_, a_ = geq_coefficients()
    coef = bq.pack_coefficients_df(b_, a_)
    B, Tg = 4096, 49152
    xg = jax.device_put(jnp.asarray(
        rng.integers(-3000, 3000, (B, Tg)).astype(np.int16)), dev)
    for (u, g) in ((16, 2), (16, 4), (32, 2), (2, 4)):
        def geqrun(x, u=u, g=g):
            y, _ = bq.geq_cascade_pallas_quant(x, coef, unroll=u, groups=g)
            return y.astype(jnp.int16)
        try:
            per = chain_time(geqrun, xg, n=11)
            out[f"geq_u{u}_g{g}"] = {"G_sps": round(B * Tg / per / 1e9, 2)}
        except Exception as e:
            out[f"geq_u{u}_g{g}"] = {"error": repr(e)[:120]}
        print(f"geq_u{u}_g{g}: {out[f'geq_u{u}_g{g}']}", flush=True)

print(json.dumps(out))
