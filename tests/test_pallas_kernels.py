"""Pallas kernels (interpret mode on CPU): equivalence with XLA ops."""

import jax.numpy as jnp
import numpy as np

from jeicyboodsp_tpu.kernels import biquad_pallas as bq
from jeicyboodsp_tpu.ops import geq as jgeq


def test_biquad_cascade_matches_fast_mode(rng, snr):
    b, a = jgeq.geq_coefficients()
    x = rng.normal(0, 1000, (4, 1024)).astype(np.float32)
    want = np.asarray(jgeq.geq_apply_fast(jnp.asarray(x), b, a, dtype=jnp.float64))
    got = np.asarray(
        bq.geq_cascade_pallas(jnp.asarray(x), bq.pack_coefficients(b, a), interpret=True)
    )
    assert snr(want, got) >= 55.0, snr(want, got)  # f32 kernel vs f64 scan
