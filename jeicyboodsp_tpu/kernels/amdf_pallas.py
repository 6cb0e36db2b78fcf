"""Pallas TPU kernel: AMDF pitch lag search (PitchEstimation_method2.cpp).

AMDF has no FFT form (|a - b| is not a correlation), so the fast path is a
bandwidth problem: the XLA formulation re-reads the (T, 1024) frame array
once per lag (511x HBM traffic, measured ~80 M samples/s).  This kernel
keeps each zero-padded frame resident in VMEM and loops the 512 lags
on-chip -- one HBM read per frame total.

Layout: 128 frames ride the lanes; the 2048 padded samples (frame + zeros)
ride the sublane axis.  Per lag k the shifted view is a dynamic-start
static-size slice of the SAME VMEM tile.  The kernel emits the unmasked
full-diff sums; the reference's triangular mask is restored host-side via
the identity

    sum_{i<n-k} |u_i - u_{i+k}|  =  sum_{i<n} |u_i - up_{i+k}| - suffix|u|(n-k)

(up is the zero-padded frame, so the tail terms are |u_i - 0| = |u_i|).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
N = 1024
KEEP = 512


def _kernel(x_ref, out_ref):
    """x: (1, 2048, 128) padded frames; out: (1, 512, 128) raw diff sums."""

    def lag(k, _):
        sh = x_ref[0, pl.ds(k, N), :]
        out_ref[0, k, :] = jnp.sum(jnp.abs(x_ref[0, :N, :] - sh), axis=0)
        return 0

    jax.lax.fori_loop(0, KEEP, lag, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def amdf_pallas(frames, interpret: bool = False):
    """(T, 1024) int16/float frames -> (T, 512) AMDF values
    corr[k] = sum_{i<1024-k} |u_i - u_{i+k}| / (1024 - k), matching the
    reference loop (PitchEstimation_method2.cpp:79-95)."""
    T = frames.shape[0]
    Tp = -(-T // LANES) * LANES
    f = jnp.zeros((Tp, N), jnp.float32).at[:T].set(frames.astype(jnp.float32))
    # (tiles, 2048, 128): padded samples on sublanes, frames on lanes
    xt = jnp.concatenate([f, jnp.zeros_like(f)], axis=1)
    xt = xt.reshape(Tp // LANES, LANES, 2 * N).transpose(0, 2, 1)

    raw = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((Tp // LANES, KEEP, LANES), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(Tp // LANES,),
            in_specs=[
                pl.BlockSpec((1, 2 * N, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec(
                (1, KEEP, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
        interpret=interpret,
    )(xt)
    raw = raw.transpose(0, 2, 1).reshape(Tp, KEEP)[:T]  # (T, 512)

    # restore the triangular mask: subtract suffix |u| sums, divide by (n-k)
    au = jnp.abs(f[:T])
    suffix = jnp.cumsum(au[:, ::-1], axis=1)[:, ::-1]  # suffix[i] = sum_{j>=i}
    k = jnp.arange(KEEP)
    # correction for lag k is suffix sum from index n-k (0 for k=0)
    corr = jnp.concatenate([jnp.zeros((T, 1), jnp.float32), suffix[:, N - KEEP + 1 :][:, ::-1]], axis=1)
    return (raw - corr) / (N - k).astype(jnp.float32)
