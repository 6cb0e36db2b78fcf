"""NLMS/BNLMS: JAX ops vs bit-exact oracle (SNR contract; XLA reduction
order differs from the C loops)."""

import numpy as np

from jeicyboodsp_tpu.oracle import nlms as onlms
from jeicyboodsp_tpu.ops import nlms as jnlms


def _signals(rng, n=1024 * 3 + 100):
    x = np.clip(rng.normal(0, 3000, n), -32768, 32767).astype(np.int16)
    h = rng.normal(0, 0.1, 32)
    h[0] = 0.5
    ref = np.clip(
        np.convolve(x.astype(np.float64), h)[:n] + rng.normal(0, 50, n), -32768, 32767
    ).astype(np.int16)
    return x, ref


def test_nlms_matches_oracle(rng, snr):
    x, ref = _signals(rng)
    oe, oerr = onlms.run_nlms(x, ref)
    je, jerr = jnlms.run_nlms_stream(x, ref)
    assert len(oe) == len(je)
    assert snr(oe, je) >= 60.0, snr(oe, je)
    # error signal carries the echo-cancellation residual; compare loosely
    assert snr(oerr, jerr) >= 40.0, snr(oerr, jerr)


def test_bnlms_matches_oracle(rng, snr):
    x, ref = _signals(rng)
    oe, oerr = onlms.run_bnlms(x, ref)
    je, jerr = jnlms.run_bnlms_stream(x, ref)
    assert len(oe) == len(je)
    assert snr(oe, je) >= 60.0, snr(oe, je)
    assert snr(oerr, jerr) >= 40.0, snr(oerr, jerr)


def test_nlms_streaming_state_carry(rng):
    """Two sequential nlms_apply calls == one call on the concatenation."""
    import jax.numpy as jnp

    x, ref = _signals(rng, 2048)
    st = jnlms.nlms_init_state()
    e1, r1, st = jnlms.nlms_apply(jnp.asarray(x[:1024]), jnp.asarray(ref[:1024]), st)
    e2, r2, st = jnlms.nlms_apply(jnp.asarray(x[1024:]), jnp.asarray(ref[1024:]), st)
    ew, rw, _ = jnlms.nlms_apply(jnp.asarray(x), jnp.asarray(ref), jnlms.nlms_init_state())
    np.testing.assert_array_equal(np.concatenate([e1, e2]), np.asarray(ew))
    np.testing.assert_array_equal(np.concatenate([r1, r2]), np.asarray(rw))
