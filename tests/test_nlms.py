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


def test_bnlms_timeparallel_matches_sequential(rng):
    """The affine associative-scan BNLMS (recursion linearized, output
    still c_short-quantized) tracks the f64 sequential compat path to
    +-LSB-class differences: the dropped in-loop truncation perturbs the
    error by <= 0.5 LSB/sample with no wrap amplification."""
    import jax.numpy as jnp

    T = 24
    far = np.clip(rng.normal(0, 3000, (T, 1024)), -32768, 32767).astype(np.int16)
    echo = 0.5 * np.roll(far.reshape(-1), 5).reshape(T, 1024)
    near = np.clip(
        echo + rng.normal(0, 150, (T, 1024)), -32768, 32767
    ).astype(np.int16)
    st = jnlms.bnlms_init_state(jnp.float64)
    e_seq, r_seq, _ = jnlms.bnlms_apply(
        jnp.asarray(far), jnp.asarray(near), st, dtype=jnp.float64
    )
    e_tp, r_tp = jnlms.bnlms_apply_timeparallel(
        jnp.asarray(far), jnp.asarray(near), dtype=jnp.float32
    )
    d_e = np.asarray(e_seq).astype(np.int64) - np.asarray(e_tp).astype(np.int64)
    d_r = np.asarray(r_seq).astype(np.int64) - np.asarray(r_tp).astype(np.int64)
    assert np.abs(d_e).max() <= 2, np.abs(d_e).max()
    assert np.abs(d_r).max() <= 2, np.abs(d_r).max()
    a = np.asarray(r_seq, np.float64)
    s = 10 * np.log10(max((a**2).sum(), 1e-30) / max((d_r.astype(np.float64)**2).sum(), 1e-30))
    assert s >= 60.0, s


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
