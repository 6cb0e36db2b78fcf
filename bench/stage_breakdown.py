#!/usr/bin/env python3
"""Per-stage timing of the int8 enhance chain on TPU: fwd kernel only,
fwd+latch, full chain.  Chained protocol, differenced."""

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

from jeicyboodsp_tpu.kernels import enhance_pallas as EP
from jeicyboodsp_tpu.ops import enhance as E

T = 16384
FS = 16000


def make_signal(n, rng):
    t = np.arange(n) / FS
    speech = 5000 * np.sin(2 * np.pi * 313 * t) * (np.sin(2 * np.pi * 0.5 * t) > 0.2)
    return np.clip(speech + rng.normal(0, 20, n), -32768, 32767).astype(np.int16)


def timed_chain(fn, blocks):
    @functools.partial(jax.jit, static_argnames=("n",))
    def chained(b, n):
        def body(i, carry):
            cur, acc = carry
            out = fn(cur)
            return cur + (out & 1).astype(jnp.int16), acc + jnp.sum(out.astype(jnp.int32))

        return jax.lax.fori_loop(0, n, body, (b, jnp.int32(0)))[1]

    def timed(n):
        jax.device_get(chained(blocks, n))
        t0 = time.perf_counter()
        jax.device_get(chained(blocks, n))
        return time.perf_counter() - t0

    t1 = min(timed(1), timed(1))
    tn = min(timed(51), timed(51))
    return (tn - t1) / 50


def main():
    rng = np.random.default_rng(20260820)
    dev = jax.devices()[0]
    x = make_signal(T * 512, rng)
    blocks = jax.device_put(jnp.asarray(x.reshape(T, 512)), dev)
    M = E._dft_mats_aligned()
    M8 = E._dft_mats_int8()
    M8B = E._dft_mats_int8_back()
    J = np.zeros((512, 512), np.float32)
    J[np.arange(511, 0, -1), np.arange(1, 512)] = 1.0

    def fwd8(bp):
        return EP.enhance_fwd_int8_pallas(bp, M8, M["nyq"], M["w2"], F=512)

    def stage_fwd(bp):
        re, im, re_n, mag512, mag_n, sp = fwd8(bp)
        return (re + im).astype(jnp.int16)

    def stage_fwd_latch(bp):
        re, im, re_n, mag512, mag_n, sp = fwd8(bp)
        speech = sp[:, 0] > 0.5
        ns512, ns_n = E._noise_latch_parts(speech, (mag512, mag_n))
        return (re + ns512).astype(jnp.int16)

    def full(bp):
        out, mask = E._enhance_fused3(bp, "wiener", False, F=512, int8=True)
        return out

    def stage_fwd_back(bp):  # fwd + back8, latch replaced by a constant
        re, im, re_n, mag512, mag_n, sp = fwd8(bp)
        ns512 = mag512 * 0.5
        ns_n = mag_n * 0.5
        out = EP.enhance_back_ola8_pallas(
            re, im, re_n, ns512, ns_n, M8B, M["u_nyq"], M["y512col"], J, mode="wiener", F=512
        )
        return out

    out = {}
    for tag, fn in (("fwd", stage_fwd), ("fwd+latch", stage_fwd_latch),
                    ("fwd+back", stage_fwd_back), ("full", full)):
        per = timed_chain(fn, blocks)
        out[tag] = round(per * 1e3, 3)
        print(tag, out[tag], "ms", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
