#!/usr/bin/env python3
"""Stage split for the fused-full engine: XLA pre-stage (VAD + latch
rowpack) vs the kernel; plus a no-VAD variant probe."""
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from jeicyboodsp_tpu.ops import enhance as E

FS = 16000
rng = np.random.default_rng(20260823)
dev = jax.devices()[0]
T = 16384
t = np.arange(T * 512) / FS
speech = 5000 * np.sin(2 * np.pi * 313 * t) * (np.sin(2 * np.pi * 0.5 * t) > 0.2)
x = np.clip(speech + rng.normal(0, 20, T * 512), -32768, 32767).astype(np.int16)
blocks = jax.device_put(jnp.asarray(x.reshape(T, 512)), dev)

def chain_time(fn, x0, n=51, reps=2, out_i16=True):
    @functools.partial(jax.jit, static_argnames=("k",))
    def chained(b, k):
        def body2(i, carry):
            cur, acc = carry
            o = fn(cur)
            if out_i16:
                return cur + (o & 1).astype(cur.dtype), acc + jnp.sum(o.astype(jnp.int32))
            return cur + (o[:, :1] > acc).astype(jnp.int16), acc + jnp.sum(o)
        _, acc = jax.lax.fori_loop(0, k, body2, (b, jnp.int32(0) if out_i16 else jnp.float32(0)))
        return acc
    jax.device_get(chained(x0, 1)); jax.device_get(chained(x0, n))
    t1s, tns = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); jax.device_get(chained(x0, 1)); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); jax.device_get(chained(x0, n)); tns.append(time.perf_counter() - t0)
    return (min(tns) - min(t1s)) / (n - 1)

out = {}

# full turbo engine
def full_turbo(b):
    o, _ = E._enhance_fused_full(b, "wiener", emit_all=False, F=256, hq=False)
    return o
per = chain_time(jax.jit(full_turbo), blocks)
out["full_turbo_ms"] = round(per * 1e3, 3)
out["full_turbo_G"] = round(T * 512 / per / 1e9, 2)
print(out, flush=True)

# pre-stage only: VAD + rowpack (returns f32 (T, 8))
def prestage(b):
    sp = E.vad_flags(b, jnp.float32)
    return E._latch_rowpack(sp, L=64)
per_p = chain_time(jax.jit(prestage), blocks, out_i16=False)
out["prestage_ms"] = round(per_p * 1e3, 3)
print(out, flush=True)

# kernel only (rowpack precomputed outside the loop)
sp0 = E.vad_flags(blocks, jnp.float32)
rp0 = jax.device_put(E._latch_rowpack(sp0, L=64), dev)
M = E._dft_mats_aligned()
J = np.zeros((512, 512), np.float32)
J[np.arange(511, 0, -1), np.arange(1, 512)] = 1.0
from jeicyboodsp_tpu.kernels import enhance_pallas as EP
def kernel_only(b):
    return EP.enhance_full8_pallas(
        b, rp0, E._dft_mats_int8(), E._dft_mats_int8_back(),
        M["nyq"], M["u_nyq"], M["y512col"], J,
        mode="wiener", F=256, hq=False,
    )
per_k = chain_time(jax.jit(kernel_only), blocks)
out["kernel_only_ms"] = round(per_k * 1e3, 3)
out["kernel_only_G"] = round(T * 512 / per_k / 1e9, 2)
print(json.dumps(out), flush=True)
