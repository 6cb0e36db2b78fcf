"""Pallas TPU kernel: per-sample NLMS across many parallel streams.

Reference workload: ``NormalLMS.cpp`` (256-tap normalized LMS updated every
sample).  A single stream is inherently sequential; the TPU win is running
128 independent AEC streams per lane-tile with the 256-tap coefficient
vector AND the sliding input window resident in VMEM:

  per sample: roll window, append x_t, y = sum(C * W), e = ref - trunc(y),
              C += (2 mu e / (sum(W^2) + eps)) * W

All (256, 128) elementwise work rides the VPU; one int16 read and two
writes per sample-stream hit HBM.  f32 (fast mode) -- the bit-exact compat
path is the native C++ kernel.

Grid: (stream_tiles, time_tiles), state scratch carried across the
sequential time tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
TAPS = 256
TILE_T = 512
MU = 0.0001
EPS = 0.0001


def _c_short_f32(v):
    t = jnp.trunc(v)
    t = jnp.where(jnp.isfinite(t) & (jnp.abs(t) < 2147483648.0), t, -2147483648.0)
    i = t.astype(jnp.int32).astype(jnp.int16).astype(jnp.float32)
    return i


def _two_sum(a, b):
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def _kernel(x_ref, r_ref, est_ref, err_ref, W, V, C, CL):
    """The reference pairs the coefficients REVERSED in the estimate
    (c[255-j]*u[j+i], NormalLMS.cpp:113) but DIRECT in the update
    (c[j] += ...u[j+i], :125) -- a real quirk.  Keeping the window in both
    age orders (W ascending, V descending) makes both pairings elementwise:
        y = sum(C * V),  C += g * W

    The coefficient state is double-single (C hi + CL lo): the per-sample
    update g*w is ~1e-7 of |c| and plain-f32 accumulation swallows it at the
    ulp (the dominant divergence vs the f64 oracle, measured ~55 dB);
    two-sum accumulation carries the swallowed bits, leaving only the dot
    products' own f32 rounding (~100 dB)."""
    t_idx = pl.program_id(1)

    @pl.when(t_idx == 0)
    def _():
        W[:, :] = jnp.zeros_like(W)
        V[:, :] = jnp.zeros_like(V)
        C[:, :] = jnp.zeros_like(C)
        CL[:, :] = jnp.zeros_like(CL)

    T = x_ref.shape[0]

    def step(t, _):
        xt = x_ref[t, :]
        W[:, :] = pltpu.roll(W[:, :], TAPS - 1, 0)  # == shift by -1
        W[TAPS - 1, :] = xt
        V[:, :] = pltpu.roll(V[:, :], 1, 0)
        V[0, :] = xt
        w = W[:, :]
        v = V[:, :]
        c = C[:, :]
        cl = CL[:, :]
        y = jnp.sum(c * v, axis=0) + jnp.sum(cl * v, axis=0)
        y_s = _c_short_f32(y)
        est_ref[t, :] = y_s
        e = r_ref[t, :] - y_s
        norm = jnp.sum(w * w, axis=0)
        err_ref[t, :] = _c_short_f32(e)
        g = (2.0 * MU) * e / (norm + EPS)
        # df += single: (hi, lo) = two_sum(hi, upd); lo' = lo + err, renorm
        upd = g[None, :] * w
        s, err2 = _two_sum(c, upd)
        err2 = err2 + cl
        hi = s + err2
        CL[:, :] = err2 - (hi - s)
        C[:, :] = hi
        return 0

    jax.lax.fori_loop(0, T, step, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def nlms_pallas(x, ref, interpret: bool = False):
    """x, ref: (B, T) int16/float -> (est, err) (B, T) int16 (f32 compute).

    Matches oracle semantics except f32 accumulation (SNR-level equal);
    every stream starts from zero coefficients.
    """
    B, T = x.shape
    Bp = -(-B // LANES) * LANES
    Tp = -(-T // TILE_T) * TILE_T
    xp = jnp.zeros((Tp, Bp), jnp.float32).at[:T, :B].set(x.astype(jnp.float32).T)
    rp = jnp.zeros((Tp, Bp), jnp.float32).at[:T, :B].set(ref.astype(jnp.float32).T)

    grid = (Bp // LANES, Tp // TILE_T)
    est, err = pl.pallas_call(
        _kernel,
        out_shape=(
            jax.ShapeDtypeStruct((Tp, Bp), jnp.float32),
            jax.ShapeDtypeStruct((Tp, Bp), jnp.float32),
        ),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((TILE_T, LANES), lambda i, j: (j, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_T, LANES), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((TILE_T, LANES), lambda i, j: (j, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_T, LANES), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((TAPS, LANES), jnp.float32),
                pltpu.VMEM((TAPS, LANES), jnp.float32),
                pltpu.VMEM((TAPS, LANES), jnp.float32),
                pltpu.VMEM((TAPS, LANES), jnp.float32),
            ],
        ),
        interpret=interpret,
    )(xp, rp)
    return (
        est.T[:B, :T].astype(jnp.int16),
        err.T[:B, :T].astype(jnp.int16),
    )
