"""Pallas TPU kernel: AMDF pitch lag search (PitchEstimation_method2.cpp).

AMDF has no FFT form (|a - b| is not a correlation), so the fast path is a
bandwidth problem: the XLA formulation re-reads the (T, 1024) frame array
once per lag (511x HBM traffic, measured ~80 M samples/s).  This kernel
keeps each zero-padded frame resident in VMEM and loops the lags on-chip --
one HBM read per frame total.

Layout: 128 frames ride the lanes; the 2048 padded samples (frame + zeros)
ride the sublane axis.  Per lag k the shifted view is a dynamic-start
static-size slice of the SAME VMEM tile.  The kernel emits the unmasked
full-diff sums; the reference's triangular mask is restored host-side via
the identity

    sum_{i<n-k} |u_i - u_{i+k}|  =  sum_{i<n} |u_i - up_{i+k}| - suffix|u|(n-k)

(up is the zero-padded frame, so the tail terms are |u_i - 0| = |u_i|).

Round-3 shape of the lag loop (measured on v5e, T=16384, kernel-only):

- one fori_loop iteration per GROUP of 8 lags, the 8 inner bodies unrolled
  at trace level, results written as one aligned (8, 128) block instead of
  eight single-sublane rows: 654 -> 1286 M samples/s (per-row dynamic
  writes and loop overhead dominated; a plain 4x unroll only reached
  1089 M, lag truncation alone 780 M, and a FULL 52-group static unroll
  regressed to 1075 M);
- the 8 within-group shifts come from 8 pre-rolled VMEM copies
  (``pltpu.roll`` once per tile, 8 MB scratch), so every lag slice is
  8-sublane-ALIGNED: 1286 -> 1521 M samples/s.  Unaligned dynamic sublane
  slices cost a cross-granule funnel shift per granule; eight whole-tile
  rolls amortize that to ~nothing;
- ``lo`` restricts the computed lags to [lo, 512).  The reference's search
  (PitchEstimation_method2.cpp:103-113) only reads lags 101..511, so the
  pitch path passes lo=96 (largest multiple of 8 below 101), skipping ~19%
  of the work; lo=0 keeps the full AMDF surface for tests/consumers.

Net: 654 -> 1521 M samples/s kernel-only (2.3x); the r4 record reads
1.82 G at ~82% of the 2-op/elem VPU roofline (utils/profiling.
amdf_roofline: subtract+abs issue as one fused op -- the earlier 3-op
count put the kernel impossibly above 100%).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
N = 1024
KEEP = 512


def _make_kernel(lo: int):
    groups = (KEEP - lo) // 8

    def kernel(x_ref, out_ref, scr):
        """x: (1, 2048, 128) padded frames; out: (1, 512-lo, 128) diff sums;
        scr: (8, 2048, 128) pre-rolled copies (roll r => xr[i] = x[i+r])."""
        for r in range(8):
            scr[r] = pltpu.roll(x_ref[0], (2 * N - r) % (2 * N), 0)
        base = x_ref[0, :N, :]

        def grp(b, _):
            rows = []
            for r in range(8):
                # aligned slice: lo and 8*b are both multiples of 8
                sh = scr[r, pl.ds(b * 8 + lo, N), :]
                rows.append(
                    jnp.sum(jnp.abs(base - sh), axis=0).reshape(1, LANES)
                )
            out_ref[0, pl.ds(b * 8, 8), :] = jnp.concatenate(rows, axis=0)
            return 0

        jax.lax.fori_loop(0, groups, grp, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("lo", "interpret"))
def amdf_pallas(frames, lo: int = 0, interpret: bool = False):
    """(T, 1024) int16/float frames -> (T, 512-lo) AMDF values for lags
    k in [lo, 512): corr[k] = sum_{i<1024-k} |u_i - u_{i+k}| / (1024 - k),
    matching the reference loop (PitchEstimation_method2.cpp:79-95).
    ``lo`` must be a multiple of 8 (sublane-aligned group writes)."""
    if lo % 8 != 0 or not 0 <= lo < KEEP:
        # public-API precondition: survives python -O (a bare assert would
        # not), where an unaligned lo silently misaligns the group writes
        raise ValueError(f"lo must be a multiple of 8 in [0, {KEEP}); got {lo}")
    T = frames.shape[0]
    keep = KEEP - lo
    Tp = -(-T // LANES) * LANES
    f = jnp.zeros((Tp, N), jnp.float32).at[:T].set(frames.astype(jnp.float32))
    # (tiles, 2048, 128): padded samples on sublanes, frames on lanes
    xt = jnp.concatenate([f, jnp.zeros_like(f)], axis=1)
    xt = xt.reshape(Tp // LANES, LANES, 2 * N).transpose(0, 2, 1)

    raw = pl.pallas_call(
        _make_kernel(lo),
        out_shape=jax.ShapeDtypeStruct((Tp // LANES, keep, LANES), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(Tp // LANES,),
            in_specs=[
                pl.BlockSpec((1, 2 * N, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec(
                (1, keep, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[pltpu.VMEM((8, 2 * N, LANES), jnp.float32)],
        ),
        interpret=interpret,
    )(xt)
    raw = raw.transpose(0, 2, 1).reshape(Tp, keep)[:T]  # (T, 512-lo)

    # restore the triangular mask: subtract suffix |u| sums, divide by (n-k).
    # The suffix sums ride the MXU as one 0/1 GEMM over the frame tail
    # (corr[k] = sum_{i >= N-k} |u_i|, and N-k >= 512 for k < 512):
    # measured 0.34 ms vs 1.12 ms for the reversed-cumsum form at T=16384.
    # HIGHEST keeps f32-accurate sums (|u| is int16-range: bf16 would round).
    au = jnp.abs(f[:T, KEEP:])  # (T, 512) tail magnitudes
    k = lo + jnp.arange(keep)
    sel = np.zeros((KEEP, keep), np.float32)
    for j in range(keep):
        kk = lo + j
        if kk > 0:
            sel[KEEP - kk :, j] = 1.0  # rows i-512 >= N-k
    corr = jax.lax.dot_general(
        au, jnp.asarray(sel), (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )
    return (raw - corr) / (N - k).astype(jnp.float32)
