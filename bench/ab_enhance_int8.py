#!/usr/bin/env python3
"""A/B the enhance fused-kernel engines on the real TPU (chained protocol).

Configs: mxu3 (bf16x3 fwd+back), i8fwd (int8 fwd only -- round-3 mxu8),
i8full (int8 fwd + int8 back), i8back (int8 back only).  Prints per-config
samples/s (min-of-2 of a 51-iteration chained window, 1-iteration
differenced) + SNR vs the f64 oracle on a probe.
"""

import functools
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp

from jeicyboodsp_tpu.ops import enhance as E

T = 16384
FS = 16000


def make_signal(n, rng):
    t = np.arange(n) / FS
    speech = 5000 * np.sin(2 * np.pi * 313 * t) * (np.sin(2 * np.pi * 0.5 * t) > 0.2)
    return np.clip(speech + rng.normal(0, 20, n), -32768, 32767).astype(np.int16)


def main():
    rng = np.random.default_rng(20260820)
    dev = jax.devices()[0]
    x = make_signal(T * 512, rng)
    blocks = jax.device_put(jnp.asarray(x.reshape(T, 512)), dev)

    from jeicyboodsp_tpu.oracle import enhance as oenh

    probe = make_signal(192 * 512, rng)
    want = oenh.run(probe, "wiener").astype(np.float64)

    CONFIGS = {
        "mxu3": dict(),
        "i8full": dict(int8=True),
    }
    out = {}
    for tag, kw in CONFIGS.items():
        @functools.partial(jax.jit, static_argnames=("n",))
        def chained(b, n, kw=tuple(sorted(kw.items()))):
            kwd = dict(kw)

            def body(i, carry):
                cur, acc = carry
                o, m = E._enhance_fused3(cur, "wiener", False, F=512, **kwd)
                return cur + (o & 1).astype(jnp.int16), acc + jnp.sum(o.astype(jnp.int32))

            return jax.lax.fori_loop(0, n, body, (b, jnp.int32(0)))[1]

        def timed(n):
            jax.device_get(chained(blocks, n))
            t0 = time.perf_counter()
            jax.device_get(chained(blocks, n))
            return time.perf_counter() - t0

        t1 = min(timed(1), timed(1))
        tn = min(timed(51), timed(51))
        per = (tn - t1) / 50
        sps = T * 512 / per

        got_b, mask = E._enhance_fused3(
            jnp.asarray(probe.reshape(-1, 512)), "wiener", False, F=512, **kw
        )
        got = np.asarray(got_b)[np.asarray(mask)].reshape(-1).astype(np.float64)
        err = want - got
        snr = 10 * np.log10(np.sum(want ** 2) / max(np.sum(err ** 2), 1e-30))
        out[tag] = {"sps": round(sps / 1e9, 3), "snr_db": round(snr, 1),
                    "t1_ms": round(t1 * 1e3, 1), "per_iter_ms": round(per * 1e3, 3)}
        print(tag, json.dumps(out[tag]), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
