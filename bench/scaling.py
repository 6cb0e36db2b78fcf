#!/usr/bin/env python3
"""Scaling measurement for the time-sharded enhancement chain.

Real multi-chip hardware is not reachable from this environment (one v5e
chip behind a tunnel), so this harness does two honest things:

1. *Correctness + mechanics* on an N-virtual-device CPU mesh
   (xla_force_host_platform_device_count): the sharded pipeline runs with
   real ppermute halos + all_gather prefix combines and matches
   single-device output (also asserted in tests/test_sharded.py).

2. *Analytic communication/compute model* for real ICI: per shard and chunk
   the chain moves a fixed halo (2 blocks) + tiny prefix aggregates over
   ICI, versus O(T_loc) frame compute in HBM -- reported as predicted
   scaling efficiency at the BASELINE workload sizes.

Writes bench/scaling.json.
"""

import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def analytic_efficiency(t_loc_blocks: int, n_shards: int, ici_bw=4.5e10, hbm_bw=8.2e11):
    """Predicted efficiency of the time-sharded enhancement chain.

    Per chunk, per shard:
      compute: ~6 HBM passes over (T_loc, 1024) f32 frames
      comm:    2-block int16 halo + noise-prefix all_gather
               (2 x (1 + 1024 + 1 + 1 + 1024) f32 per shard pair)
    Efficiency = t_compute / (t_compute + t_comm), assuming no overlap
    (pessimistic; halos can overlap with the batched FFTs).
    """
    compute_bytes = 6 * t_loc_blocks * 1024 * 4
    halo_bytes = 2 * 512 * 2
    prefix_bytes = n_shards * (2 * (3 + 2 * 1024) * 4)  # gathered aggregates
    t_compute = compute_bytes / hbm_bw
    t_comm = (halo_bytes + prefix_bytes) / ici_bw
    return t_compute / (t_compute + t_comm)


def main():
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)  # the GEQ check needs real f64
    import jax.numpy as jnp

    from jeicyboodsp_tpu.ops.enhance import enhance_blocks
    from jeicyboodsp_tpu.parallel import make_mesh
    from jeicyboodsp_tpu.parallel.sharded import enhance_sharded

    rng = np.random.default_rng(0)
    T = 512
    x = np.clip(rng.normal(0, 1000, T * 512), -32768, 32767).astype(np.int16)
    blocks = jnp.asarray(x.reshape(T, 512))

    report = {"virtual_cpu_mesh": {}, "predicted_ici_efficiency": {}}
    want, _ = enhance_blocks(blocks, dtype=jnp.float32, use_assoc_scan=True)
    for n in (1, 2, 4, 8):
        mesh = make_mesh((n,), ("time",), devices=jax.devices()[:n])
        got, _ = enhance_sharded(blocks, mesh, dtype=jnp.float32)
        d = np.abs(np.asarray(want).astype(int) - np.asarray(got).astype(int))
        report["virtual_cpu_mesh"][n] = {
            "max_lsb_diff": int(d.max()),
            "flip_fraction": float((d > 0).mean()),
        }

    # sequence-parallel GEQ (state-space cascade; round 2)
    from jeicyboodsp_tpu.ops.geq import geq_apply_fast, geq_coefficients
    from jeicyboodsp_tpu.parallel.sharded import geq_sharded

    bg, ag = geq_coefficients()
    xg = jnp.asarray(x[: 512 * 8])
    want_g = np.asarray(geq_apply_fast(xg, bg, ag, dtype=jnp.float64))
    report["virtual_cpu_mesh"]["geq_timesharded"] = {}
    for n in (2, 8):
        mesh = make_mesh((n,), ("time",), devices=jax.devices()[:n])
        got_g = np.asarray(geq_sharded(xg, bg, ag, mesh, dtype=jnp.float64))
        # max error relative to signal RMS (pointwise relative explodes at
        # zero crossings); ulp-class regrouping differences expected
        err = float(np.max(np.abs(got_g - want_g)) / np.sqrt(np.mean(want_g ** 2)))
        report["virtual_cpu_mesh"]["geq_timesharded"][n] = {"max_err_over_rms": err}

    for shards in (2, 4, 8, 16, 64):
        for t_loc in (512, 2048, 16384):
            report["predicted_ici_efficiency"][f"{shards}shards_x_{t_loc}blocks"] = round(
                analytic_efficiency(t_loc, shards), 4
            )

    path = os.path.join(ROOT, "bench", "scaling.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
