#!/usr/bin/env python3
"""Measure cold vs warm compile cost of the headline enhance chain
(VERDICT r3 item 8: the 2,485 s speech-train compile needed context).

Run TWICE in fresh processes: the first run pays whatever the remote
compile helper charges; the second shows whether the persistent cache
(/tmp/jax_cache on CPU; the axon helper's own caching on TPU) makes it
one-time.  Prints one JSON line per stage.
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

from jeicyboodsp_tpu.ops.enhance import enhance_blocks

T = 16384


def main():
    rng = np.random.default_rng(0)
    x = rng.integers(-3000, 3000, T * 512).astype(np.int16)
    blocks = jnp.asarray(x.reshape(T, 512))
    FAST = dict(mode="wiener", dtype=jnp.float32, use_assoc_scan=True,
                real_fft=True, resynth="ratio", fft_engine="mxu8")

    @functools.partial(jax.jit, static_argnames=("n",))
    def chained(b, n):
        def body(i, carry):
            cur, acc = carry
            out, _ = enhance_blocks(cur, **FAST)
            return cur + (out & 1).astype(jnp.int16), acc + jnp.sum(out.astype(jnp.int32))

        return jax.lax.fori_loop(0, n, body, (b, jnp.int32(0)))[1]

    out = {}
    for n in (1, 51):
        t0 = time.perf_counter()
        jax.device_get(chained(blocks, n))
        out[f"first_call_n{n}_s"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        jax.device_get(chained(blocks, n))
        out[f"second_call_n{n}_s"] = round(time.perf_counter() - t0, 4)
    out["device"] = str(jax.devices()[0])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
