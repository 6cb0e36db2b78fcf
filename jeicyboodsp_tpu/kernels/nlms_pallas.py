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
import numpy as np
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


def _make_nlms_kernel(fast: bool):
    return functools.partial(_nlms_kernel_impl, fast)


def _nlms_kernel_impl(fast, x_ref, r_ref, est_ref, err_ref, W, V, C, CL, NRM):
    """The reference pairs the coefficients REVERSED in the estimate
    (c[255-j]*u[j+i], NormalLMS.cpp:113) but DIRECT in the update
    (c[j] += ...u[j+i], :125) -- a real quirk.  Keeping the window in both
    age orders (W ascending, V descending) makes both pairings elementwise:
        y = sum(C * V),  C += g * W

    The coefficient state is double-single (C hi + CL lo): the per-sample
    update g*w is ~1e-7 of |c| and plain-f32 accumulation swallows it at the
    ulp (the dominant divergence vs the f64 oracle, measured ~55 dB);
    two-sum accumulation carries the swallowed bits, leaving only the dot
    products' own f32 rounding (~100 dB).

    ``fast`` (r5, VERDICT item 8): keep df32 ONLY where it buys fidelity --
    the coefficient accumulator.  The estimate drops the cl dot (cl ~ 1e-7
    of c: one (256, 128) multiply-reduce saved), and the window energy
    becomes an O(1) df32 RUNNING accumulator (+x_t^2 - x_{t-256}^2 with
    two-sum carry; the naive f32 running sum random-walks ~1e-4 relative
    over 100k samples, the df32 one stays at the f64 class) replacing the
    second (256, 128) reduce.  The per-term x^2 f32 rounding is identical
    to the full reduce's; only summation error changes class (improves)."""
    t_idx = pl.program_id(1)

    @pl.when(t_idx == 0)
    def _():
        W[:, :] = jnp.zeros_like(W)
        V[:, :] = jnp.zeros_like(V)
        C[:, :] = jnp.zeros_like(C)
        CL[:, :] = jnp.zeros_like(CL)
        NRM[:, :] = jnp.zeros_like(NRM)

    T = x_ref.shape[0]

    def step(t, _):
        xt = x_ref[t, :]
        old = W[0, :]  # oldest sample, leaves the window this step
        W[:, :] = pltpu.roll(W[:, :], TAPS - 1, 0)  # == shift by -1
        W[TAPS - 1, :] = xt
        V[:, :] = pltpu.roll(V[:, :], 1, 0)
        V[0, :] = xt
        w = W[:, :]
        v = V[:, :]
        c = C[:, :]
        cl = CL[:, :]
        if fast:
            y = jnp.sum(c * v, axis=0)
            d = xt * xt - old * old  # exact f32 difference of rounded squares
            s_n, lo_n = _two_sum(NRM[0, :], d)
            lo_n = lo_n + NRM[1, :]
            hi_n = s_n + lo_n
            NRM[1, :] = lo_n - (hi_n - s_n)
            NRM[0, :] = hi_n
            norm = hi_n
        else:
            y = jnp.sum(c * v, axis=0) + jnp.sum(cl * v, axis=0)
            norm = jnp.sum(w * w, axis=0)
        y_s = _c_short_f32(y)
        est_ref[t, :] = y_s
        e = r_ref[t, :] - y_s
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


BN_TAPS = 128
BN_BLOCK = 1024
BN_KEEP = 127
BN_MU = 0.01
BN_EPS = 0.00001


def _bnlms_kernel(x_ref, r_ref, gate_ref, est_ref, err_ref, W, V, C, CL, G, GL):
    """Block NLMS (``BNLMS.cpp:103-162``): coefficients FROZEN across the
    1024-sample block, gradient accumulated per sample and applied once at
    the block boundary (averaged by BLOCK_LEN, gated by the double-talk
    detector).  Same reversed-estimate / direct-update pairing quirk as the
    per-sample kernel (BNLMS.cpp:126-128 vs :144), so the window is kept in
    both age orders.  Coefficient state AND the gradient accumulator are
    double-single f32: the per-sample gradient terms are ~1e-7 of the block
    sum and plain-f32 accumulation loses the bits that decide int16
    truncations downstream.  The gate is per-stream, precomputed host-side
    (it depends only on the inputs, never on coefficient state)."""
    t_idx = pl.program_id(1)

    @pl.when(t_idx == 0)
    def _():
        W[:, :] = jnp.zeros_like(W)
        V[:, :] = jnp.zeros_like(V)
        C[:, :] = jnp.zeros_like(C)
        CL[:, :] = jnp.zeros_like(CL)

    G[:, :] = jnp.zeros_like(G)
    GL[:, :] = jnp.zeros_like(GL)

    def step(t, _):
        xt = x_ref[t, :]
        W[:, :] = pltpu.roll(W[:, :], BN_TAPS - 1, 0)
        W[BN_TAPS - 1, :] = xt
        V[:, :] = pltpu.roll(V[:, :], 1, 0)
        V[0, :] = xt
        w = W[:, :]
        y = jnp.sum(C[:, :] * V[:, :], axis=0) + jnp.sum(CL[:, :] * V[:, :], axis=0)
        y_s = _c_short_f32(y)
        est_ref[t, :] = y_s
        e = r_ref[t, :] - y_s
        err_ref[t, :] = _c_short_f32(e)
        norm = jnp.sum(w * w, axis=0)
        gi = (2.0 * BN_MU) * e / (norm + BN_EPS)
        s, lo = _two_sum(G[:, :], gi[None, :] * w)
        lo = lo + GL[:, :]
        hi = s + lo
        GL[:, :] = lo - (hi - s)
        G[:, :] = hi
        return 0

    # 4x manual unroll: the 128-tap body is short enough that per-iteration
    # loop overhead dominates -- measured 305 -> 412 M samples/s (8x
    # regresses; Mosaic's fori lowering only takes unroll=1 or full, so the
    # unroll happens at trace level)
    def step4(t4, _):
        for q in range(4):
            step(t4 * 4 + q, 0)
        return 0

    jax.lax.fori_loop(0, BN_BLOCK // 4, step4, 0)

    gate = gate_ref[0, :]  # 1.0 = update (not double talk)
    upd_hi = G[:, :] * (gate[None, :] / BN_BLOCK)  # /1024 exact (power of 2)
    upd_lo = GL[:, :] * (gate[None, :] / BN_BLOCK)
    s, lo = _two_sum(C[:, :], upd_hi)
    lo = lo + CL[:, :] + upd_lo
    hi = s + lo
    CL[:, :] = lo - (hi - s)
    C[:, :] = hi


_GATE_M = 2176  # any m >= 1151 + 1023 gives linear correlation; no radix need


@functools.lru_cache(maxsize=1)
def _gate_bases():
    """Matmul-DFT bases for the double-talk correlation (host constants).

    The gate only needs the SIGN of max_k corr[k]; an XLA FFT round-trip
    (m=4096 rfft x2 + irfft) measured 457 M samples/s-equivalent on the VPU
    -- 2/3 of the whole BNLMS pipeline.  As three MXU GEMMs at m=2176 the
    transform work is ~43 M hw flops per block (~10x cheaper wall-clock):
    forward (1151, 1089) cos/sin planes over the nonzero input rows only,
    inverse (1089, 1024) with the irfft weights folded in."""
    m = _GATE_M
    nbin = m // 2 + 1
    i = np.arange(BN_BLOCK + BN_KEEP)[:, None] * np.arange(nbin)[None, :]
    ang = -2.0 * np.pi * i / m
    Fc = np.cos(ang).astype(np.float32)
    Fs = np.sin(ang).astype(np.float32)
    wk = np.full(nbin, 2.0)
    wk[0] = wk[-1] = 1.0
    kl = np.arange(nbin)[:, None] * np.arange(BN_BLOCK)[None, :]
    ang2 = 2.0 * np.pi * kl / m
    Ic = (wk[:, None] * np.cos(ang2) / m).astype(np.float32)
    Is = (wk[:, None] * np.sin(ang2) / m).astype(np.float32)
    return Fc, Fs, Ic, Is


def _bnlms_gates(xp, rp):
    """Double-talk gate per (block, stream), vectorized (BNLMS.cpp:164-186).

    corr[k] = sum_i u[i]*r[i+k] / (2*BLOCK-k) over the 1151-sample
    processing buffers (keep(127) + block), out-of-bounds reads defined as
    zero (see oracle module docstring); update fires iff max_k corr[k] > 0.
    Pure function of the inputs -- computed once, batched over every block
    of every stream as MXU matmul-DFT GEMMs (precision HIGH), and handed to
    the kernel as a (Tb, B) flag plane.  bf16x3 transform rounding: the
    sign decision matches the f64 oracle except when max|corr| is within
    rounding of zero (probes are far from it), same contract as the
    previous f32-FFT gate."""
    B, T = xp.shape
    tb = T // BN_BLOCK
    xb = xp.reshape(B, tb, BN_BLOCK)
    rb = rp.reshape(B, tb, BN_BLOCK)

    def with_keep(blocks):
        halo = jnp.pad(blocks, ((0, 0), (1, 0), (0, 0)))[:, :-1, BN_BLOCK - BN_KEEP :]
        return jnp.concatenate([halo, blocks], axis=-1)  # (B, tb, 1151)

    u = with_keep(xb).reshape(B * tb, BN_BLOCK + BN_KEEP)
    r = with_keep(rb).reshape(B * tb, BN_BLOCK + BN_KEEP)
    Fc, Fs, Ic, Is = _gate_bases()
    mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGH)
    Ur, Ui = mm(u, Fc), mm(u, Fs)
    Rr, Ri = mm(r, Fc), mm(r, Fs)
    Pr = Ur * Rr + Ui * Ri  # conj(U) * R
    Pi = Ur * Ri - Ui * Rr
    corr = mm(Pr, Ic) - mm(Pi, Is)  # (B*tb, 1024) linear correlation lags
    corr = corr / (2.0 * BN_BLOCK - jnp.arange(BN_BLOCK, dtype=jnp.float32))
    return (jnp.max(corr, axis=-1) > 0.0).astype(jnp.float32).reshape(B, tb)


@functools.partial(jax.jit, static_argnames=("interpret",))
def bnlms_pallas(x, ref, interpret: bool = False):
    """Batched block-NLMS streams: x, ref (B, T) -> (est, err) (B, T) int16.

    Bit-exact-compat fast path for ``BNLMS.cpp`` on TPU (the f64 anchor is
    the native C++ kernel): double-single coefficient/gradient state; every
    stream starts from zero coefficients; the caller drops the first block
    (BNLMS.cpp suppresses it).  T is padded to a 1024 multiple with zeros.
    """
    B, T = x.shape
    if x.shape != ref.shape:
        raise ValueError(f"x/ref shape mismatch: {x.shape} vs {ref.shape}")
    if B == 0 or T == 0:  # Mosaic rejects zero-sized operands
        return jnp.zeros((B, T), jnp.int16), jnp.zeros((B, T), jnp.int16)
    Bp = -(-B // LANES) * LANES
    Tp = -(-T // BN_BLOCK) * BN_BLOCK
    xp = jnp.zeros((Bp, Tp), jnp.float32).at[:B, :T].set(x.astype(jnp.float32))
    rp = jnp.zeros((Bp, Tp), jnp.float32).at[:B, :T].set(ref.astype(jnp.float32))
    # (tb, Bp) replicated to 8 sublanes per block row (Mosaic tile minimum)
    gates = jnp.repeat(_bnlms_gates(xp, rp).T, 8, axis=0)

    grid = (Bp // LANES, Tp // BN_BLOCK)
    est, err = pl.pallas_call(
        _bnlms_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((Tp, Bp), jnp.float32),
            jax.ShapeDtypeStruct((Tp, Bp), jnp.float32),
        ),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((BN_BLOCK, LANES), lambda i, j: (j, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((BN_BLOCK, LANES), lambda i, j: (j, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, LANES), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((BN_BLOCK, LANES), lambda i, j: (j, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((BN_BLOCK, LANES), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((BN_TAPS, LANES), jnp.float32),
                pltpu.VMEM((BN_TAPS, LANES), jnp.float32),
                pltpu.VMEM((BN_TAPS, LANES), jnp.float32),
                pltpu.VMEM((BN_TAPS, LANES), jnp.float32),
                pltpu.VMEM((BN_TAPS, LANES), jnp.float32),
                pltpu.VMEM((BN_TAPS, LANES), jnp.float32),
            ],
        ),
        interpret=interpret,
    )(xp.T, rp.T, gates)
    return (
        est.T[:B, :T].astype(jnp.int16),
        err.T[:B, :T].astype(jnp.int16),
    )


@functools.partial(jax.jit, static_argnames=("interpret", "fast"))
def nlms_pallas(x, ref, interpret: bool = False, fast: bool = False):
    """x, ref: (B, T) int16/float -> (est, err) (B, T) int16 (f32 compute).

    Matches oracle semantics except f32 accumulation (SNR-level equal);
    every stream starts from zero coefficients.  ``fast`` drops the cl
    estimate dot and replaces the window-energy reduce with an O(1) df32
    running accumulator (see :func:`_nlms_kernel_impl`) -- the df32
    COEFFICIENT state stays, so fidelity holds >= 60 dB (pinned in
    tests/test_nlms.py) while the bit-exact contract is traded away.
    """
    B, T = x.shape
    Bp = -(-B // LANES) * LANES
    Tp = -(-T // TILE_T) * TILE_T
    xp = jnp.zeros((Tp, Bp), jnp.float32).at[:T, :B].set(x.astype(jnp.float32).T)
    rp = jnp.zeros((Tp, Bp), jnp.float32).at[:T, :B].set(ref.astype(jnp.float32).T)

    grid = (Bp // LANES, Tp // TILE_T)
    est, err = pl.pallas_call(
        _make_nlms_kernel(fast),
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
                pltpu.VMEM((8, LANES), jnp.float32),  # norm hi/lo rows
            ],
        ),
        interpret=interpret,
    )(xp, rp)
    return (
        est.T[:B, :T].astype(jnp.int16),
        err.T[:B, :T].astype(jnp.int16),
    )
