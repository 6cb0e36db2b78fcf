"""Pallas TPU kernel: fused 7-band biquad cascade (fast mode).

Reference workload: ``7Band_GEQ.cpp`` (ops/geq.py).  Layout: independent
audio streams ride the 128-wide lane dimension; time advances sequentially
inside the kernel with the full 7-band transposed direct-form-II state
(7 x 2 state rows) held in VMEM scratch that persists across the
sequentially-executed time tiles of the grid -- one HBM read and one write
per sample, zero intermediate traffic, the whole cascade fused per step.

This is the throughput-mode kernel (float, no int16 feedback -- the compat
integer recursion lives in the native host kernel).  Numerically it is also
the *stable* f32 path: the associative-scan formulation in ops/geq.py
amplifies f32 rounding at the 44 Hz shelf's near-unity pole, while this
sequential state-space recursion stays bounded.

Grid: (batch_tiles, time_tiles); time is the fastest (sequential) axis and
the state scratch carries across it, reset at each new batch tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8
STREAMS = SUBLANES * LANES  # 1024 streams per tile -> full VPU width
BANDS = 7
TILE_T = 512


def _kernel(coef_ref, x_ref, out_ref, state):
    """coef: (7, 8); x/out tile: (TILE_T, 8, 128) = 1024 streams per step;
    state: (14, 8, 128) scratch."""
    t_idx = pl.program_id(1)

    @pl.when(t_idx == 0)
    def _():
        state[:, :, :] = jnp.zeros_like(state)

    T = x_ref.shape[1]  # block is (1, TILE_T, 8, 128)

    def step(t, _):
        v = x_ref[0, t]
        for k in range(BANDS):
            b0 = coef_ref[k, 0]
            b1 = coef_ref[k, 1]
            b2 = coef_ref[k, 2]
            a1 = coef_ref[k, 3]
            a2 = coef_ref[k, 4]
            s1 = state[2 * k]
            s2 = state[2 * k + 1]
            y = b0 * v + s1
            state[2 * k] = b1 * v - a1 * y + s2
            state[2 * k + 1] = b2 * v - a2 * y
            v = y
        out_ref[0, t] = v
        return 0

    jax.lax.fori_loop(0, T, step, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def geq_cascade_pallas(x, coef, interpret: bool = False):
    """x: (B, T) float streams -> (B, T) filtered. B padded to 1024."""
    B, T = x.shape
    Bp = -(-B // STREAMS) * STREAMS
    Tp = -(-T // TILE_T) * TILE_T
    xp = jnp.zeros((Bp, Tp), jnp.float32).at[:B, :T].set(x.astype(jnp.float32))
    # (batch_tiles, time, sublanes, lanes)
    xt = xp.reshape(Bp // STREAMS, SUBLANES, LANES, Tp).transpose(0, 3, 1, 2)

    grid = (Bp // STREAMS, Tp // TILE_T)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct(xt.shape, jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((BANDS, 8), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (1, TILE_T, SUBLANES, LANES),
                    lambda i, j: (i, j, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, TILE_T, SUBLANES, LANES),
                lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[pltpu.VMEM((2 * BANDS, SUBLANES, LANES), jnp.float32)],
        ),
        interpret=interpret,
    )(jnp.zeros((BANDS, 8), jnp.float32).at[:, :5].set(jnp.asarray(coef, jnp.float32)), xt)
    return out.transpose(0, 2, 3, 1).reshape(Bp, Tp)[:B, :T]


def pack_coefficients(b, a):
    """(7,3) b + (7,3) a (a[:,0]=0) -> (7,5) [b0 b1 b2 a1 a2]."""
    b = np.asarray(b, np.float32)
    a = np.asarray(a, np.float32)
    return np.concatenate([b, a[:, 1:3]], axis=1)
