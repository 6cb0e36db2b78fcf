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


def _trunc_wrap_f32(y):
    """Single-f32 double->short semantics (7Band_GEQ.cpp:284): truncate
    toward zero, wrap modulo 2^16.  Exact for |y| < 2^24 (the linear
    cascade's range on int16 input)."""
    ti = jnp.trunc(y).astype(jnp.int32)
    ti = ((ti + 0x8000) & 0xFFFF) - 0x8000
    return ti.astype(jnp.float32)


def _make_kernel(unroll: int, quant_boundaries: bool = False):
    """coef: (7, 8); x/out tile: (TILE_T, 8, 128) = 1024 streams per step;
    state: (14, 8, 128) scratch.

    r4: the per-sample body is ~63 short VPU ops on (8, 128) tiles, so
    fori_loop overhead dominated (measured 32% of the issue roof).  Same
    medicine as the BNLMS kernel: hoist the coefficient scalars out of the
    loop (one VMEM load each instead of per-step) and unroll ``unroll``
    samples per iteration at trace level (Mosaic only lowers
    unroll=1-or-full).  The state rows carry through registers across the
    unrolled sub-steps.  Measured (T=49152x2048 streams): 4x -> 12.1 G
    (from 4.9 at 1x); see geq_cascade_pallas for the unroll sweep.

    ``quant_boundaries`` (r5, VERDICT item 7 -- MEASURED NEGATIVE): apply
    the reference's int16 truncate-and-wrap at each band BOUNDARY on the
    forward path (7Band_GEQ.cpp:284) while each band's own feedback stays
    linear.  Measured vs the f64 oracle: 30.9 dB on a clean signal and
    ~0 dB under wrap stress -- the 44 Hz shelf's near-unity pole amplifies
    the <= 1 LSB feedback-path error ~300x, and any int16 wrap in the
    reference's (quantized) feedback diverges from the linear one
    entirely.  The feedback quantization IS the audible behavior; there
    is no stable >= 60 dB approximation short of the bit-exact df32
    kernel, which is therefore the only above-bar quantized engine (its
    r5 `groups` interleave recovers most of the speed gap).  Kept as the
    documented measured row (docs/PERFORMANCE.md)."""

    def kernel(coef_ref, x_ref, out_ref, state):
        t_idx = pl.program_id(1)

        @pl.when(t_idx == 0)
        def _():
            state[:, :, :] = jnp.zeros_like(state)

        T = x_ref.shape[1]  # block is (1, TILE_T, 8, 128)
        cc = coef_ref[...]  # hoisted: (7, 8) scalar table

        def stepn(tn, _):
            s = [state[r] for r in range(2 * BANDS)]
            for dt in range(unroll):
                v = x_ref[0, tn * unroll + dt]
                for k in range(BANDS):
                    y = cc[k, 0] * v + s[2 * k]
                    s[2 * k] = cc[k, 1] * v - cc[k, 3] * y + s[2 * k + 1]
                    s[2 * k + 1] = cc[k, 2] * v - cc[k, 4] * y
                    v = _trunc_wrap_f32(y) if quant_boundaries else y
                out_ref[0, tn * unroll + dt] = v
            for r in range(2 * BANDS):
                state[r] = s[r]
            return 0

        jax.lax.fori_loop(0, T // unroll, stepn, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "unroll", "quant_boundaries"))
def geq_cascade_pallas(x, coef, interpret: bool = False, unroll: int = 128,
                       quant_boundaries: bool = False):
    """x: (B, T) float streams -> (B, T) filtered. B padded to 1024.

    ``unroll``: samples per trace-level loop iteration (must divide
    TILE_T=512).  r4 sweep on v5e (2048 streams x 49152 samples, chained):
    1x 4.9 G -> 4x 12.1-13.2 -> 8x 17.5 -> 16x 20.2 -> 64x 23.9 ->
    128x 25-28 G samples/s, flat within jitter from 128 up (256/512
    measured 23.3/26.0).  The body is a serial dependency chain (~2
    dependent ops/band, state feeds the next sample), so the win is loop
    bookkeeping removal + Mosaic filling latency slots with the
    off-critical-path state updates; the plateau ~26 G = ~44% of the pure
    issue-rate roof is the chain latency floor.  128 is the shipped
    default (full 512 unroll compiles noticeably slower for no gain)."""
    if TILE_T % unroll:
        raise ValueError(f"unroll must divide {TILE_T}; got {unroll}")
    if interpret:
        # interpret mode executes the trace op by op in Python: a 128x
        # unrolled body is ~30x slower to simulate for identical values --
        # keep CI fast (the unroll changes scheduling, not math)
        unroll = min(unroll, 4)
    B, T = x.shape
    Bp = -(-B // STREAMS) * STREAMS
    Tp = -(-T // TILE_T) * TILE_T
    xp = jnp.zeros((Bp, Tp), jnp.float32).at[:B, :T].set(x.astype(jnp.float32))
    # (batch_tiles, time, sublanes, lanes)
    xt = xp.reshape(Bp // STREAMS, SUBLANES, LANES, Tp).transpose(0, 3, 1, 2)

    grid = (Bp // STREAMS, Tp // TILE_T)
    out = pl.pallas_call(
        _make_kernel(unroll, quant_boundaries),
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


# ---------------------------------------------------------------------------
# quantized-feedback variant: reference int16 requantization inside the loop,
# computed in double-single (two-float) arithmetic so the f64 truncation
# boundaries are reproduced on f32-only TPU hardware
# ---------------------------------------------------------------------------
#
# Plain f32 is hopeless here: a single truncation flip (prob ~1e-3/sample at
# f32 precision) injects a +-1 LSB error that the int16-wrap nonlinearity at
# the +12 dB bands amplifies into full-scale divergence (measured ~2 dB SNR).
# Double-single arithmetic (Dekker two-product / Knuth two-sum on f32 pairs)
# carries ~2^-48 relative error, pushing the flip probability below ~1e-7 per
# sample -- bit-exact vs the f64 oracle on every tested signal, including
# wrap-stress input.  The inputs/outputs are int16-valued (exact in f32);
# the f64 filter coefficients enter as hi/lo f32 pairs.


def _two_sum(a, b):
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def _fast_two_sum(a, b):  # requires |a| >= |b|
    s = a + b
    return s, b - (s - a)


def _split(a):
    t = a * 4097.0  # 2^12 + 1 Dekker split constant for f32
    hi = t - (t - a)
    return hi, a - hi


def _two_prod(a, b):
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    return p, ((ah * bh - p) + ah * bl + al * bh) + al * bl


def _df_add(xh, xl, yh, yl):
    s, e = _two_sum(xh, yh)
    return _fast_two_sum(s, e + (xl + yl))


def _df_term(ch, cl, v):
    """(ch + cl) * v as a double-single, v exact (int16-valued)."""
    ph, pe = _two_prod(ch, v)
    return ph, cl * v + pe


def _trunc_wrap_short_df(sh, sl):
    """double->short semantics of 7Band_GEQ.cpp:284 on a double-single value:
    truncate toward zero, wrap modulo 2^16 into [-32768, 32767].  sh alone
    can be rounded across an integer boundary (e.g. acc=99.9999999 ->
    sh=100.0, sl<0), so the truncation decision uses both components."""
    t1 = jnp.trunc(sh)  # exact: |acc| < 5*4*32768 << 2^24
    f = (sh - t1) + sl  # fractional remainder in (-1-eps, 1+eps)
    ff = jnp.floor(f)
    zfl = t1 + ff  # floor(acc)
    trunc = zfl + jnp.where((zfl <= -1.0) & (f != ff), 1.0, 0.0)
    ti = trunc.astype(jnp.int32)
    ti = ((ti + 0x8000) & 0xFFFF) - 0x8000
    return ti.astype(jnp.float32)


def _make_kernel_quant(unroll: int, groups: int = 1):
    return functools.partial(_kernel_quant_impl, unroll, groups)


def _kernel_quant_impl(unroll, groups, coef_ref, x_ref, state_in_ref, out_ref,
                       state_out_ref, state):
    """Direct-form-I cascade with int16 truncate-and-wrap feedback, matching
    the reference recursion y[k][n] = short(b0*u[n] + b1*u[n-1] + b2*u[n-2]
    - a1*y[n-1] - a2*y[n-2]) where u is band k-1's QUANTIZED output
    (7Band_GEQ.cpp:279-300), in double-single f32.

    coef: (7, 16): [b0 b1 b2 -a1 -a2] hi at cols 0-4, lo at cols 5-9.
    state rows per band: [x1, x2, y1, y2] -> (4*BANDS, 8, 128); threaded
    in/out per batch tile so host-level streaming can checkpoint/resume.

    ``groups`` (r5): INDEPENDENT stream groups (consecutive batch tiles)
    processed per sub-step.  The df chain per sample is ~40 dependent VPU
    ops while each op's inputs come from a different group's chain, so
    interleaving G groups gives the scheduler G independent chains to
    hide latency with -- the same medicine that took the linear kernel
    from 12 -> 27 G.  Pure scheduling: each stream's op sequence (and the
    bit-exact contract) is untouched."""
    t_idx = pl.program_id(1)
    n_t = pl.num_programs(1)

    @pl.when(t_idx == 0)
    def _():
        state[:, :, :, :] = state_in_ref[...]

    T = x_ref.shape[1]
    cc = coef_ref[...]  # hoisted (r4): 70 scalar loads per step otherwise

    def step4(t4, _):
        # state rows carried through registers across the unrolled
        # sub-steps (r4: same loop-overhead medicine as the linear kernel;
        # pure scheduling -- the df arithmetic order, and therefore the
        # bit-exact contract, is untouched ON TPU, where Mosaic preserves
        # FP op ordering.  In interpret mode the body lowers to XLA:CPU,
        # whose fusion clustering CHANGES with the unrolled graph and
        # contracts a mul+add into an fma somewhere inside the Dekker
        # arithmetic -- one input in CI flipped a truncation -- so
        # interpret clamps unroll=1, the shape CI always validated; the
        # silicon lane re-proves bit-exactness at the shipped unroll).
        s = [[state[g, r] for r in range(4 * BANDS)] for g in range(groups)]
        for dt in range(unroll):
            v = [x_ref[g, t4 * unroll + dt] for g in range(groups)]
            for k in range(BANDS):
                for g in range(groups):  # independent chains interleaved
                    x1 = s[g][4 * k]
                    x2 = s[g][4 * k + 1]
                    y1 = s[g][4 * k + 2]
                    y2 = s[g][4 * k + 3]
                    # reference accumulation order (7Band_GEQ.cpp:279-283):
                    # b2*x2 - a2*y2 + b1*x1 - a1*y1 + b0*v, each df-rounded
                    sh, sl = _df_term(cc[k, 2], cc[k, 7], x2)
                    th, tl = _df_term(cc[k, 4], cc[k, 9], y2)
                    sh, sl = _df_add(sh, sl, th, tl)
                    th, tl = _df_term(cc[k, 1], cc[k, 6], x1)
                    sh, sl = _df_add(sh, sl, th, tl)
                    th, tl = _df_term(cc[k, 3], cc[k, 8], y1)
                    sh, sl = _df_add(sh, sl, th, tl)
                    th, tl = _df_term(cc[k, 0], cc[k, 5], v[g])
                    sh, sl = _df_add(sh, sl, th, tl)
                    y = _trunc_wrap_short_df(sh, sl)
                    s[g][4 * k + 1] = x1
                    s[g][4 * k] = v[g]
                    s[g][4 * k + 3] = y1
                    s[g][4 * k + 2] = y
                    v[g] = y
            for g in range(groups):
                out_ref[g, t4 * unroll + dt] = v[g]
        for g in range(groups):
            for r in range(4 * BANDS):
                state[g, r] = s[g][r]
        return 0

    jax.lax.fori_loop(0, T // unroll, step4, 0)

    @pl.when(t_idx == n_t - 1)
    def _():
        state_out_ref[...] = state[:, :, :, :]


def pack_coefficients_df(b, a):
    """f64 (7,3) b + (7,3) a -> (7,16) f32 [b0 b1 b2 -a1 -a2]x{hi,lo} + pad.

    The a-coefficients are negated host-side so the kernel's df arithmetic is
    all additions (the reference's subtraction order is preserved because
    -a*y is the same f64 value as the subtraction's operand)."""
    b = np.asarray(b, np.float64)
    a = np.asarray(a, np.float64)
    c = np.stack([b[:, 0], b[:, 1], b[:, 2], -a[:, 1], -a[:, 2]], axis=1)
    hi = c.astype(np.float32)
    lo = (c - hi.astype(np.float64)).astype(np.float32)
    out = np.zeros((BANDS, 16), np.float32)
    out[:, :5] = hi
    out[:, 5:10] = lo
    return out


def init_quant_state(n_batch_tiles: int = 1):
    """Zero carried state for :func:`geq_cascade_pallas_quant`:
    (batch_tiles, 4*BANDS, SUBLANES, LANES) f32 (int16-valued)."""
    return jnp.zeros((n_batch_tiles, 4 * BANDS, SUBLANES, LANES), jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret", "unroll", "groups"))
def geq_cascade_pallas_quant(x, coef_df, state=None, interpret: bool = False,
                             unroll: int = 16, groups: int = 4):
    """Quantized-feedback cascade: x (B, T) int16-valued -> (B, T) f32
    holding int16 values (the reference's requantized band-6 output), plus
    the carried filter state for streaming continuation.

    coef_df from :func:`pack_coefficients_df`.  Same layout/grid as
    :func:`geq_cascade_pallas`; bit-exact vs the f64 oracle (df32 math).
    Returns (y, new_state); pass state=None (zeros) for a fresh stream.

    ``unroll``: trace-level samples per loop iteration on TPU.  Interpret
    mode CLAMPS it to 1: the unrolled body lowers to XLA:CPU whose fusion
    clustering contracts a mul+add into an fma inside the Dekker
    arithmetic on some inputs (one CI input flipped a truncation); Mosaic
    preserves FP op ordering, and the silicon lane (utils/tpu_checks,
    every driver bench) re-proves bit-exactness at the shipped unroll.
    r4 sweep (2048 streams x 49k, bit-exact verified on silicon at each):
    1x 2.14 -> 4x 4.27 -> 8x 4.69 G samples/s.

    ``groups`` (r5): independent 1024-stream groups interleaved per
    sub-step so their dependency chains hide each other's latency (the
    kernel docstring has the scheduling story); the time tile shrinks by
    the same factor to keep VMEM flat.  Also clamped to 1 in interpret
    mode (CI validates the per-stream math; silicon proves the shipped
    shape).  r5 sweep (4096 streams x 49k, bit-exact on silicon at every
    point via tpu_checks): (u8,g1) 4.24 -> (u8,g2) 4.56 -> (u8,g4) 4.65 ->
    (u16,g4) 4.79 G samples/s; (u8,g8) collapses to 2.64 (VMEM cliff).
    Only +13% total: the df32 body is ISSUE-bound (4 independent df_term
    products per band already fill latency slots), unlike the linear
    kernel whose unroll sweep gained 5x.  (16, 4) ships."""
    if interpret:
        unroll = 1
        groups = 1
    B, T = x.shape
    # never pad the batch just to fill groups (a 1-stream CLI call should
    # not cost 2048 padded streams)
    groups = max(1, min(groups, -(-B // STREAMS)))
    tile_t = TILE_T // groups  # keep the VMEM window flat as groups grow
    if tile_t % unroll:
        raise ValueError(f"unroll must divide {tile_t}; got {unroll}")
    Bp = -(-B // (groups * STREAMS)) * (groups * STREAMS)
    Tp = -(-T // tile_t) * tile_t
    xp = jnp.zeros((Bp, Tp), jnp.float32).at[:B, :T].set(x.astype(jnp.float32))
    xt = xp.reshape(Bp // STREAMS, SUBLANES, LANES, Tp).transpose(0, 3, 1, 2)

    grid = (Bp // (groups * STREAMS), Tp // tile_t)
    if state is None:
        state = init_quant_state(Bp // STREAMS)
    want = (Bp // STREAMS, 4 * BANDS, SUBLANES, LANES)
    if tuple(state.shape) != want:  # pallas would silently read OOB blocks
        raise ValueError(f"state shape {tuple(state.shape)} != {want}")
    out, state_out = pl.pallas_call(
        _make_kernel_quant(unroll, groups),
        out_shape=(
            jax.ShapeDtypeStruct(xt.shape, jnp.float32),
            jax.ShapeDtypeStruct(state.shape, jnp.float32),
        ),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((BANDS, 16), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (groups, tile_t, SUBLANES, LANES),
                    lambda i, j: (i, j, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (groups, 4 * BANDS, SUBLANES, LANES),
                    lambda i, j: (i, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=(
                pl.BlockSpec(
                    (groups, tile_t, SUBLANES, LANES),
                    lambda i, j: (i, j, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (groups, 4 * BANDS, SUBLANES, LANES),
                    lambda i, j: (i, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ),
            scratch_shapes=[
                pltpu.VMEM((groups, 4 * BANDS, SUBLANES, LANES), jnp.float32)
            ],
        ),
        interpret=interpret,
    )(jnp.asarray(coef_df, jnp.float32), xt, state)
    return out.transpose(0, 2, 3, 1).reshape(Bp, Tp)[:B, :T], state_out
