"""7-band graphic EQ as a TPU-friendly JAX op.

Reference behavior: ``7Band_GEQ.cpp`` (see :mod:`jeicyboodsp_tpu.oracle.geq`
for the full quirk list).  Two execution modes:

- ``geq_apply``: *compat* mode.  The reference quantizes the direct-form-I
  output to int16 inside the feedback loop (``7Band_GEQ.cpp:284``), making the
  recursion integer-valued and strictly sequential.  We express it as a
  ``lax.scan`` over samples carrying the 2-sample input/output histories of
  all 7 bands; throughput comes from ``vmap`` over independent streams
  (batch) rather than intra-stream parallelism.

- ``geq_apply_fast``: *fast* mode.  Drops the in-loop quantization (pure
  linear cascade), which makes each biquad a 2-dim linear state-space
  recursion that XLA can run as one associative scan per band -- massively
  parallel over time.  Output differs from the reference by the (audible)
  requantization the reference applies; this is the speed-of-light path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jeicyboodsp_tpu.oracle.geq import (  # coefficient math is host-side
    BLOCK_LEN,
    CENTER_FREQS,
    GAINS_DB,
    TOTAL_BANDS,
    calc_coefficients,
)
from jeicyboodsp_tpu.utils.cnum import c_short_jnp


def init_state():
    """Per-band int16 keep buffers: x history (2,) + per-band y history (7,2)."""
    return {
        "xh": jnp.zeros((2,), jnp.int32),
        "yh": jnp.zeros((TOTAL_BANDS, 2), jnp.int32),
    }


@functools.partial(jax.jit, static_argnames=("dtype",))
def geq_apply(x, b, a, state, dtype=jnp.float32):
    """Compat-mode cascade. x: int (N,) -> (y int16 (N,), new_state).

    Exactly reproduces the reference recursion
    ``y[k][n] = short(b0*u[n] + b1*u[n-1] + b2*u[n-2] - a1*y[n-1] - a2*y[n-2])``
    where u is band k-1's quantized output (7Band_GEQ.cpp:279-284).
    """
    b = jnp.asarray(b, dtype)
    a = jnp.asarray(a, dtype)

    def step(carry, xn):
        xh, yh = carry["xh"], carry["yh"]
        new_yh = []
        u2, u1, u0 = xh[0], xh[1], xn  # u[n-2], u[n-1], u[n]
        for k in range(TOTAL_BANDS):
            # accumulate in the C loop's exact order (7Band_GEQ.cpp:279-283):
            # the int16 truncation feedback makes rounding order observable.
            # optimization_barrier pins each product to a separately-rounded
            # multiply -- XLA would otherwise contract mul+add into fma,
            # whose different rounding flips truncation boundaries that then
            # propagate through the integer feedback.
            ob = jax.lax.optimization_barrier
            acc = ob(b[k, 2] * u2.astype(dtype))
            acc = ob(acc - ob(a[k, 2] * yh[k, 0].astype(dtype)))
            acc = ob(acc + ob(b[k, 1] * u1.astype(dtype)))
            acc = ob(acc - ob(a[k, 1] * yh[k, 1].astype(dtype)))
            acc = acc + ob(b[k, 0] * u0.astype(dtype))
            y = c_short_jnp(acc).astype(jnp.int32)
            new_yh.append(jnp.stack([yh[k, 1], y]))
            u2, u1, u0 = yh[k, 0], yh[k, 1], y  # next band's input history
        carry = {
            "xh": jnp.stack([xh[1], xn]),
            "yh": jnp.stack(new_yh),
        }
        return carry, u0  # u0 is band-6 output after the loop

    new_state, y = jax.lax.scan(step, state, x.astype(jnp.int32))
    return y.astype(jnp.int16), new_state


def geq_coefficients(gains_db=GAINS_DB, center_freqs=CENTER_FREQS, compat=True):
    b, a = calc_coefficients(gains_db=gains_db, center_freqs=center_freqs, compat=compat)
    return np.asarray(b), np.asarray(a)


# ---------------------------------------------------------------------------
# fast path: linear cascade without in-loop quantization
# ---------------------------------------------------------------------------


def _biquad_linear(x, b0, b1, b2, a1, a2):
    """One biquad as an associative scan over 2x2 state-space transitions.

    y[n] depends linearly on (y[n-1], y[n-2]); write s[n] = (y[n], y[n-1]):
    s[n] = A s[n-1] + B f[n] with A = [[-a1, -a2], [1, 0]], f[n] the FIR part.
    The affine recursion composes associatively, so XLA evaluates it in
    O(log N) depth on the VPU.
    """
    dtype = x.dtype
    f = b0 * x + b1 * jnp.roll(x, 1).at[0].set(0) + b2 * jnp.roll(x, 2).at[:2].set(0)
    A = jnp.array([[-a1, -a2], [1.0, 0.0]], dtype)
    As = jnp.broadcast_to(A, (x.shape[0], 2, 2))
    Bs = jnp.stack([f, jnp.zeros_like(f)], axis=-1)

    def combine(l, r):
        Al, bl = l
        Ar, br = r
        return Ar @ Al, jnp.einsum("...ij,...j->...i", Ar, bl) + br

    _, s = jax.lax.associative_scan(combine, (As, Bs))
    return s[:, 0]


@functools.partial(jax.jit, static_argnames=("dtype",))
def geq_apply_fast(x, b, a, dtype=jnp.float32):
    """Fast-mode cascade: float linear filtering, no int16 feedback.

    x: (..., N) float or int; returns float32 (..., N).
    """
    y = x.astype(dtype)
    b = jnp.asarray(b, dtype)
    a = jnp.asarray(a, dtype)
    fn = _biquad_linear
    for _ in range(y.ndim - 1):
        fn = jax.vmap(fn, in_axes=(0, None, None, None, None, None))
    for k in range(TOTAL_BANDS):
        y = fn(y, b[k, 0], b[k, 1], b[k, 2], a[k, 1], a[k, 2])
    return y


@functools.partial(jax.jit, static_argnames=())
def geq_apply_fast_qb(x, b, a):
    """Fast mode with inter-band requantization on the FORWARD path only
    (VERDICT r4 item 7) -- a MEASURED NEGATIVE result, kept as the record.

    Hypothesis tested: quantizing each band's output to int16 before the
    next band (7Band_GEQ.cpp:284) while keeping each band's own feedback
    linear might preserve the audible requantization above 60 dB without
    the bit-exact df32 cost.  Measured vs the f64 oracle (r5, 32k-sample
    440 Hz + noise): 30.9 dB clean, ~0 dB with int16-wrap content -- the
    44 Hz shelf's near-unity pole amplifies the <= 1 LSB feedback error
    ~300x, and once the reference's quantized feedback wraps, the linear
    feedback diverges completely.  Conclusion (documented in
    docs/PERFORMANCE.md): the feedback quantization is essential; the
    df32 kernel (geq_cascade_pallas_quant) is the only >= 60 dB engine,
    and its r5 `groups` interleave is the speed path.

    x: (..., N) int16-valued; returns (..., N) f32 holding int16 values.
    Same per-sample DF-II-transposed op order as the Pallas kernel
    (kernels.biquad_pallas._make_kernel(quant_boundaries=True)); used as
    its CI replica.
    """
    b = jnp.asarray(b, jnp.float32)
    a = jnp.asarray(a, jnp.float32)
    xf = x.astype(jnp.float32)
    lead = xf.shape[:-1]
    xt = xf.reshape(-1, xf.shape[-1]).T  # (N, B)

    def step(s, v):
        s2 = []
        for k in range(TOTAL_BANDS):
            s0, s1 = s[2 * k], s[2 * k + 1]
            y = b[k, 0] * v + s0
            s2.append(b[k, 1] * v - a[k, 1] * y + s1)
            s2.append(b[k, 2] * v - a[k, 2] * y)
            ti = jnp.trunc(y).astype(jnp.int32)
            v = (((ti + 0x8000) & 0xFFFF) - 0x8000).astype(jnp.float32)
        return s2, v

    init = [jnp.zeros(xt.shape[1], jnp.float32) for _ in range(2 * TOTAL_BANDS)]
    _, y = jax.lax.scan(step, init, xt)
    return y.T.reshape(lead + (y.shape[0],))


def run_pallas_quant(x, gains_db=GAINS_DB, compat=True, interpret=False):
    """Whole-signal compat-mode GEQ on the TPU Pallas df32 kernel.

    Matches oracle.geq.run() bit-exactly (double-single arithmetic makes the
    f64 truncate-to-int16 feedback boundaries reproducible on f32-only TPU
    hardware; see kernels.biquad_pallas).  Output length is rounded up to a
    512 multiple with the reference's stale-tail fread semantics."""
    from jeicyboodsp_tpu.kernels import biquad_pallas as bq

    b, a = geq_coefficients(gains_db=gains_db, compat=compat)
    coef = bq.pack_coefficients_df(b, a)
    xx = np.asarray(x, np.int16)
    if len(xx) == 0:  # reference emits nothing on an empty payload
        return np.zeros(0, np.int16)
    n_full, rem = divmod(len(xx), BLOCK_LEN)
    if rem:
        prev = (
            xx[(n_full - 1) * BLOCK_LEN : n_full * BLOCK_LEN]
            if n_full
            else np.zeros(BLOCK_LEN, np.int16)
        )
        xx = np.concatenate([xx, prev[rem:]])
    y, _ = bq.geq_cascade_pallas_quant(jnp.asarray(xx[None]), coef, interpret=interpret)
    return np.asarray(y)[0].astype(np.int16)


def stream_blocks(x, gains_db=GAINS_DB, compat=True, dtype=jnp.float64, use_native=True):
    """Host-level convenience: run a whole signal block-by-block (512) and
    return the concatenated int16 output, matching oracle.geq.run().

    For f64 compat the native C++ kernel is preferred: it is bit-exact
    against the reference (XLA's fma contraction can flip truncation
    boundaries in the quantized feedback; see module docstring)."""
    b, a = geq_coefficients(gains_db=gains_db, compat=compat)
    if use_native and dtype == jnp.float64:
        from jeicyboodsp_tpu import native

        if native.available():
            xx = np.asarray(x, np.int16)
            n = len(xx)
            n_full, rem = divmod(n, BLOCK_LEN)
            if rem:  # stale-tail fread semantics: pad from the previous block
                prev = (
                    xx[(n_full - 1) * BLOCK_LEN : n_full * BLOCK_LEN]
                    if n_full
                    else np.zeros(BLOCK_LEN, np.int16)
                )
                xx = np.concatenate([xx, prev[rem:]])
            ki = np.zeros((TOTAL_BANDS, 2), np.int16)
            ko = np.zeros((TOTAL_BANDS, 2), np.int16)
            return native.geq_process(xx, b, a, ki, ko)
    state = init_state()
    n = len(x)
    x = np.asarray(x, dtype=np.int16)
    outs = []
    prev = np.zeros(BLOCK_LEN, dtype=np.int16)
    for s in range(0, n, BLOCK_LEN):
        blk = x[s : s + BLOCK_LEN]
        if len(blk) < BLOCK_LEN:
            blk = np.concatenate([blk, prev[len(blk) :]])
        prev = blk
        y, state = geq_apply(jnp.asarray(blk), b, a, state, dtype=dtype)
        outs.append(np.asarray(y))
    return np.concatenate(outs) if outs else np.zeros(0, np.int16)
