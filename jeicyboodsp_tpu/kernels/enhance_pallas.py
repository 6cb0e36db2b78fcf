"""Fused Pallas kernels for the enhancement chain's hot path.

Reference hot loop: ``WienerFilter_final.cpp:192-216`` (FFT -> gain -> IFFT
per frame).  The XLA version (`ops.enhance._enhance_fast_mxu`) runs the
stage GEMMs at ``precision=HIGH`` with HBM round-trips between stages; these
kernels fuse each half of the chain into one VMEM-resident pass per frame
tile:

- :func:`enhance_fwd_pallas` -- int16 blocks in; windowed forward rDFT
  (Hamming folded into the bases), Nyquist split out, magnitudes computed
  in-register.  Avoids materializing the (T, 1024) frame array and the
  separate |X| pass.
- :func:`enhance_back_pallas` -- spectra + noise estimate in; Wiener /
  spectral-subtraction gain, the two symmetry-halved inverse GEMMs, and the
  y[512] column, all in VMEM.  Avoids materializing gain/Y/u/v.
- :func:`enhance_back_ola3_pallas` -- back half INCLUDING the OLA: the
  tail's lane flip rides an exact 2-pass 0/1-permutation GEMM, the t-1
  shift a sublane roll with a cross-tile scratch carry, and the c_short
  quantization happens in-register -- head/w2/tail planes never touch HBM.
  Matches enhance_back_pallas + the XLA OLA assembly to +-1 int16
  truncation flips (<0.5%: the in-kernel sum is the exact f32 one; the XLA
  assembly's fused add occasionally rounds across an integer boundary);
  measured +7% end to end (5.16-5.63 vs 4.87-5.05 G samples/s interleaved).
  This is the shipping TPU path (ops.enhance._enhance_fused3).

Mosaic does not implement ``Precision.HIGH``, so the f32 GEMMs are
hand-rolled bf16x3 (`_dot3`): split both operands into bf16 hi + residual
lo and take the three significant cross products -- the same decomposition
XLA's HIGH uses, but with the splits living in VMEM instead of HBM.
Measured (v5e, T=16384, F=512): back half 0.13 ms vs 0.33 ms XLA; values
agree with the XLA path to bf16x3 rounding (~1e-6 relative).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dot3(a, b):
    """f32 GEMM as three bf16 passes (XLA HIGH-equivalent, Mosaic-legal)."""
    ah = a.astype(jnp.bfloat16).astype(jnp.float32)
    al = a - ah
    bh = b.astype(jnp.bfloat16).astype(jnp.float32)
    bl = b - bh
    d = lambda x, y: jax.lax.dot_general(
        x, y, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    return d(ah, bh) + (d(ah, bl) + d(al, bh))


def _vad_rows(cur_f, w2row):
    """In-kernel VAD (WienerFilter_final.cpp:261-296 semantics): int16
    window truncation, energy over 1024, windowed[i] x raw[i+1] ZCR (the
    last sample pairs with OOB -> 0, never < 0).  cur_f: (F, 512) raw block
    values as f32; w2row: (1, 512) second Hamming half.  Returns (F, 1)
    f32 speech flags (1.0 = speech).  Sign decisions are exact (integer
    products never flip sign under f32 rounding); the energy sum's f32
    grouping matches the XLA path's class."""
    s = _c_short_f32(cur_f * w2row)
    energy = jnp.sum(s * s, axis=1, keepdims=True) * (1.0 / 1024.0)
    prod = s[:, :511] * cur_f[:, 1:]
    zcr = jnp.sum((prod < 0.0).astype(jnp.float32), axis=1, keepdims=True)
    return ((energy > 700.0) | (zcr < 200.0)).astype(jnp.float32)


def _fwd_kernel(wcp, wcc, wsp, wsc, nyp, nyc, w2row, prev_ref, cur_ref,
                re_ref, im_ref, ren_ref, mag_ref, magn_ref, sp_ref):
    prev = prev_ref[...].astype(jnp.float32)
    cur = cur_ref[...].astype(jnp.float32)
    re = _dot3(prev, wcp[...]) + _dot3(cur, wcc[...])
    im = _dot3(prev, wsp[...]) + _dot3(cur, wsc[...])
    ren = _dot3(prev, nyp[...]) + _dot3(cur, nyc[...])
    re_ref[...] = re
    im_ref[...] = im
    ren_ref[...] = ren
    mag_ref[...] = jnp.sqrt(re * re + im * im)
    magn_ref[...] = jnp.abs(ren)
    sp_ref[...] = _vad_rows(cur, w2row[...])


def enhance_fwd_pallas(prev, cur, WC, WS, nyq, w2, F: int = 256, interpret: bool = False):
    """(T, 512) int16 prev/cur blocks -> re, im (T, 512), re_n, |X| planes,
    speech flags (T, 1).

    WC/WS: (1024, 512) window-folded forward bases; nyq: (1024,); w2: the
    second Hamming half (512,) for the in-kernel VAD (the separate XLA
    vad_flags pass re-read every block from HBM; the kernel already holds
    them in VMEM, and the VPU work hides under the MXU GEMMs).
    NOT jitted itself: matrices must arrive as host constants (callers are
    jitted; an inner jit would trace them and lose the literal Nyquist term).
    """
    T = prev.shape[0]
    assert T % F == 0, (T, F)
    consts = [
        jnp.asarray(WC[:512]), jnp.asarray(WC[512:]),
        jnp.asarray(WS[:512]), jnp.asarray(WS[512:]),
        jnp.asarray(nyq[:512]).reshape(512, 1), jnp.asarray(nyq[512:]).reshape(512, 1),
        jnp.asarray(w2, jnp.float32).reshape(1, 512),
    ]
    const_specs = [
        pl.BlockSpec(c.shape, lambda i: (0,) * c.ndim, memory_space=pltpu.VMEM)
        for c in consts
    ]
    blk = pl.BlockSpec((F, 512), lambda i: (i, 0), memory_space=pltpu.VMEM)
    col = pl.BlockSpec((F, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _fwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((T, 512), jnp.float32),
            jax.ShapeDtypeStruct((T, 512), jnp.float32),
            jax.ShapeDtypeStruct((T, 1), jnp.float32),
            jax.ShapeDtypeStruct((T, 512), jnp.float32),
            jax.ShapeDtypeStruct((T, 1), jnp.float32),
            jax.ShapeDtypeStruct((T, 1), jnp.float32),
        ),
        grid_spec=pl.GridSpec(
            grid=(T // F,),
            in_specs=const_specs + [blk, blk],
            out_specs=(blk, blk, col, blk, col, col),
        ),
        interpret=interpret,
    )(*consts, prev, cur)


def _i8dot(a, b):
    """int8 x int8 -> int32 MXU dot (runs at 2x the bf16 MAC rate on v5e)."""
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )


def _fwd8_plane(ph, plo, ch, cl, Whp, Wlp, Whc, Wlc, s1p, s2p, s1c, s2c, crow,
                hq: bool = True):
    """One spectral plane from int8-split data and int8-split bases.

    x = 256*xh + xl + 128 exactly (xh = floor(x/256), xl int8), and
    W ~= s1*Wh + s2*Wl per column, so

        x @ W = s1*(256*(xh@Wh) + xl@Wh) + s2*(256*(xh@Wl) + xl@Wl)
                + const_row

    with the +128 shift folded into const_row = 128*(s1*colsum(Wh) +
    s2*colsum(Wl)).  All accumulators fit int32: |256*(xh@Wh) + xl@Wh| <=
    256*128*127*512 + 128*127*512 = 2.139e9 < 2^31-1.  r5: the xl@Wl
    cross term is INCLUDED -- dropping it was the chain's dominant error
    (decomposed numerically: the re plane measured 75.9 dB without the
    crosses, 93.6 dB with them; the old docstring's ~2^-22 estimate
    ignored that the windowed bases' residual correlates with the data's
    low byte across the 1024-sample contraction).  Cost: +2 of 10 int8
    dots on the fwd half."""
    zh = 256 * _i8dot(ph, Whp) + _i8dot(plo, Whp)
    zc = 256 * _i8dot(ch, Whc) + _i8dot(cl, Whc)
    if hq:
        rh = 256 * _i8dot(ph, Wlp) + _i8dot(plo, Wlp)
        rc = 256 * _i8dot(ch, Wlc) + _i8dot(cl, Wlc)
    else:  # turbo: drop the lo-cross dots (the r4 arithmetic, ~70 dB)
        rh = 256 * _i8dot(ph, Wlp)
        rc = 256 * _i8dot(ch, Wlc)
    return (s1p * zh.astype(jnp.float32) + s2p * rh.astype(jnp.float32)
            + s1c * zc.astype(jnp.float32) + s2c * rc.astype(jnp.float32)
            + crow)


def _fwd8_kernel(hq, Whcp, Wlcp, Whcc, Wlcc, Whsp, Wlsp, Whsc, Wlsc,
                 scales, crows, nyp, nyc, w2row, cur_ref,
                 re_ref, im_ref, ren_ref, mag_ref, magn_ref, sp_ref, cprev):
    """Raw (F, 512) int16 blocks in; the exact int8 hi/lo split AND the
    one-row prev shift happen in VMEM (a sublane roll + scratch carry on
    the sequential grid), so the XLA-side split/concat passes -- ~50 MB of
    HBM traffic per 16384-block batch -- disappear."""
    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _():
        cprev[...] = jnp.zeros_like(cprev)  # block -1 is all zeros

    cur = cur_ref[...].astype(jnp.int32)  # Mosaic rotate needs 32-bit data
    F = cur.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (F, 1), 0)
    prev = jnp.where(rows == 0, cprev[...], pltpu.roll(cur, 1, 0))
    cprev[...] = cur[F - 1 :, :]

    def split8(xi):
        xh = jax.lax.shift_right_arithmetic(xi, jnp.int32(8))  # floor(x/256)
        xl = xi - 256 * xh - 128
        return xh.astype(jnp.int8), xl.astype(jnp.int8)

    ph, plo = split8(prev)
    ch, cl = split8(cur)
    s = scales[...]
    re = _fwd8_plane(ph, plo, ch, cl, Whcp[...], Wlcp[...], Whcc[...], Wlcc[...],
                     s[0:1], s[1:2], s[2:3], s[3:4], crows[0:1], hq=hq)
    im = _fwd8_plane(ph, plo, ch, cl, Whsp[...], Wlsp[...], Whsc[...], Wlsc[...],
                     s[4:5], s[5:6], s[6:7], s[7:8], crows[1:2], hq=hq)
    # Nyquist bin: rank-1 against the exact f32 block values (VPU-cheap)
    pf = prev.astype(jnp.float32)
    cf = cur.astype(jnp.float32)
    doth = lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    ren = doth(pf, nyp[...]) + doth(cf, nyc[...])
    re_ref[...] = re
    im_ref[...] = im
    ren_ref[...] = ren
    mag_ref[...] = jnp.sqrt(re * re + im * im)
    magn_ref[...] = jnp.abs(ren)
    sp_ref[...] = _vad_rows(cf, w2row[...])


def enhance_fwd_int8_pallas(cur, M8, nyq, w2, F: int = 512,
                            interpret: bool = False, hq: bool = True):
    """int8-MXU forward rDFT: raw (T, 512) int16 blocks -> re, im, re_n,
    |X| planes, speech flags (same contract as :func:`enhance_fwd_pallas`).

    M8: dict from ops.enhance._dft_mats_int8 -- per-column-scaled int8
    splits of the window-folded bases + the folded +128-shift rows.
    Measured 0.284 ms vs 0.733 ms for the bf16x3 kernel (T=16384): int8
    MACs run at 2x the bf16 rate; the exact data split and the prev-row
    shift happen in VMEM (r4: the XLA-side split/concat variant cost an
    extra ~0.1 ms of HBM passes).
    """
    T = cur.shape[0]
    assert T % F == 0, (T, F)
    consts = [jnp.asarray(M8[k]) for k in
              ("WhCp", "WlCp", "WhCc", "WlCc", "WhSp", "WlSp", "WhSc", "WlSc")]
    consts.append(jnp.asarray(M8["scales"]))  # (8, 512) f32
    consts.append(jnp.asarray(M8["crows"]))   # (2, 512) f32
    consts.append(jnp.asarray(nyq[:512], jnp.float32).reshape(512, 1))
    consts.append(jnp.asarray(nyq[512:], jnp.float32).reshape(512, 1))
    consts.append(jnp.asarray(w2, jnp.float32).reshape(1, 512))
    const_specs = [
        pl.BlockSpec(c.shape, lambda i: (0,) * c.ndim, memory_space=pltpu.VMEM)
        for c in consts
    ]
    blk = pl.BlockSpec((F, 512), lambda i: (i, 0), memory_space=pltpu.VMEM)
    col = pl.BlockSpec((F, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd8_kernel, hq),
        out_shape=(
            jax.ShapeDtypeStruct((T, 512), jnp.float32),
            jax.ShapeDtypeStruct((T, 512), jnp.float32),
            jax.ShapeDtypeStruct((T, 1), jnp.float32),
            jax.ShapeDtypeStruct((T, 512), jnp.float32),
            jax.ShapeDtypeStruct((T, 1), jnp.float32),
            jax.ShapeDtypeStruct((T, 1), jnp.float32),
        ),
        grid_spec=pl.GridSpec(
            grid=(T // F,),
            in_specs=const_specs + [blk],
            out_specs=(blk, blk, col, blk, col, col),
            scratch_shapes=[pltpu.VMEM((1, 512), jnp.int32)],
        ),
        interpret=interpret,
    )(*consts, cur)


def _c_short_f32(v):
    """c_short (utils/cnum) semantics in-kernel: trunc toward zero, NaN/
    overflow -> int32 min, int16 wrap; returned as f32 of the int16 value."""
    t = jnp.trunc(v)
    t = jnp.where(jnp.isfinite(t) & (jnp.abs(t) < 2147483648.0), t, -2147483648.0)
    return t.astype(jnp.int32).astype(jnp.int16).astype(jnp.float32)


def _make_back_ola3_kernel(mode: str, y512n: float, F: int):
    """Like _make_back_ola_kernel but reuses the u/vv contractions: head =
    u - vv, w2 = u + vv as in the shipping kernel, then the OLA tail's lane
    flip runs as an EXACT 2-pass permutation GEMM (a 0/1 matrix is
    bf16-exact, so flip(w2) = w2_hi @ J + w2_lo @ J) instead of doubling
    the inverse contraction (the fused2 variant) or bouncing through XLA."""
    if mode not in ("wiener", "specsub"):
        raise ValueError(mode)

    def kernel(uc, vs, unyq, ycol, J, re_ref, im_ref, ren_ref, ns_ref, nsn_ref,
               out_ref, ctail):
        pid = pl.program_id(0)

        @pl.when(pid == 0)
        def _():
            ctail[...] = jnp.zeros_like(ctail)

        re = re_ref[...]
        im = im_ref[...]
        ns512 = ns_ref[...]
        ren = ren_ref[...]
        nsn = nsn_ref[...]
        if mode == "wiener":
            P = re * re + im * im
            v = ns512 * ns512 / P
            g = 1.0 - jnp.where(v >= 1.0, 1.0, v)
            vn = nsn * nsn / (ren * ren)
            gn = 1.0 - jnp.where(vn >= 1.0, 1.0, vn)
        else:
            mag = jnp.sqrt(re * re + im * im)
            g = (mag - ns512) / mag
            magn = jnp.abs(ren)
            gn = (magn - nsn) / magn
        Yre = re * g
        Yim = im * g
        Yren = ren * gn
        u = _dot3(Yre, uc[...]) + Yren * unyq[...]
        vv = _dot3(Yim, vs[...])
        head = u - vv
        w2 = u + vv
        doth = lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        y512 = doth(Yre, ycol[...]) + Yren * y512n
        # tail = [y512, flip(w2[1:])]: J[s, j] = 1 iff s == 512-j (col 0
        # zero); 0/1 operands are exact in bf16, so two passes suffice
        w2h = w2.astype(jnp.bfloat16).astype(jnp.float32)
        w2l = w2 - w2h
        d1 = lambda x, y: jax.lax.dot_general(
            x, y, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        rows = jax.lax.broadcasted_iota(jnp.int32, (F, 1), 0)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (F, 512), 1)
        tail = d1(w2h, J[...]) + d1(w2l, J[...])
        tail = jnp.where(lanes == 0, y512, tail)
        tail_prev = jnp.where(rows == 0, ctail[...], pltpu.roll(tail, 1, 0))
        ctail[...] = tail[F - 1 :, :]
        gidx = rows + pid * F
        acc = head + tail_prev * (gidx >= 2).astype(jnp.float32)
        out_ref[...] = _c_short_f32(acc * (gidx >= 1).astype(jnp.float32))

    return kernel


def enhance_back_ola3_pallas(re, im, re_n, ns512, ns_n, UC512, VS512, u_nyq,
                             y512col, Jflip, mode: str = "wiener", F: int = 256,
                             interpret: bool = False):
    """Gain + symmetry-halved inverse + in-kernel flip/OLA/c_short."""
    T = re.shape[0]
    assert T % F == 0, (T, F)
    ycol = jnp.asarray(y512col[:512], jnp.float32).reshape(512, 1)
    y512n = float(y512col[512])
    consts = [
        jnp.asarray(UC512, jnp.float32), jnp.asarray(VS512, jnp.float32),
        jnp.asarray(u_nyq, jnp.float32).reshape(1, 512), ycol,
        jnp.asarray(Jflip, jnp.float32),
    ]
    const_specs = [
        pl.BlockSpec(c.shape, lambda i: (0,) * c.ndim, memory_space=pltpu.VMEM)
        for c in consts
    ]
    blk = pl.BlockSpec((F, 512), lambda i: (i, 0), memory_space=pltpu.VMEM)
    col = pl.BlockSpec((F, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_back_ola3_kernel(mode, y512n, F),
        out_shape=jax.ShapeDtypeStruct((T, 512), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(T // F,),
            in_specs=const_specs + [blk, blk, col, blk, col],
            out_specs=blk,
            scratch_shapes=[pltpu.VMEM((1, 512), jnp.float32)],
        ),
        interpret=interpret,
    )(*consts, re, im, re_n, ns512, ns_n)


def _quant_row_int8(Y, hq: bool = True):
    """Per-row TWO-LEVEL quantization of a f32 plane into int8 planes.

    Level 1: Z = rint(Y * 32512/rowmax) is integer-valued in
    [-32512, 32512] (32512 = 127*256: the next integer needs >= 0.5 of f32
    error on a 2-rounding product, impossible), and Z = 256*h + l + 128
    exactly with int8 h, l.  The row scale q = rowmax/32512 factors out of
    the bin contraction (scales ride the row axis, the GEMM contracts
    bins), so dequantization is a post-GEMM broadcast multiply.

    Level 2 (r5): the level-1 residual R = Y - q*Z (|R| <= q/2) gets its
    own int8 plane Z2 = rint(R * 127/rowmax2) with scale q2 <= q/254,
    pushing quantization noise from ~2^-16 to ~2^-23 of the row max.  The
    16-bit quantization was one of the two dominant ~75 dB error sources
    in the r4 engine (numerically decomposed; the other was the dropped
    lo-cross matrix term)."""
    m = jnp.max(jnp.abs(Y), axis=1, keepdims=True)
    ms = jnp.maximum(m, 1e-30)
    Z = jnp.rint(Y * (32512.0 / ms))
    h = jnp.floor(Z * (1.0 / 256.0))
    l = Z - 256.0 * h - 128.0
    q = ms * (1.0 / 32512.0)
    if not hq:  # turbo: single-level (the r4 arithmetic, ~2^-16 of rowmax)
        return h.astype(jnp.int8), l.astype(jnp.int8), q, None, None
    R = Y - q * Z
    m2 = jnp.maximum(jnp.max(jnp.abs(R), axis=1, keepdims=True), 1e-30)
    Z2 = jnp.rint(R * (127.0 / m2))
    return h.astype(jnp.int8), l.astype(jnp.int8), q, Z2.astype(jnp.int8), m2 * (1.0 / 127.0)


def _inv_plane8(h, l, Wh, Wl, s1, s2, crow, q, z2=None, q2=None,
                hq: bool = True):
    """q * (256h + l + 128) @ (s1*Wh + s2*Wl) [+ q2 * z2 @ s1*Wh].

    int32-exact accumulation: |256*(h@Wh) + l@Wh| <= 256*512*127*127 +
    512*128*127 = 2.139e9 < 2^31-1 (the fwd8 bound).  r5: the l@Wl cross
    term is included (dropping it cost ~4 dB on the chain observable --
    same decomposition as _fwd8_plane), and the level-2 residual plane z2
    contracts against Wh only (its Wl pairing is ~2^-8 of an already
    ~2^-23 correction)."""
    z = 256 * _i8dot(h, Wh) + _i8dot(l, Wh)
    r = 256 * _i8dot(h, Wl) + (_i8dot(l, Wl) if hq else 0)
    out = q * (s1 * z.astype(jnp.float32) + s2 * r.astype(jnp.float32) + crow)
    if z2 is not None:
        out = out + (q2 * s1) * _i8dot(z2, Wh).astype(jnp.float32)
    return out


def _make_back_ola8_kernel(mode: str, y512n: float, F: int, emit_all: bool,
                           hq: bool = True):
    """int8-MXU variant of _make_back_ola3_kernel: the two inverse GEMMs
    (Yre@UC, Yim@VS) run as int8 dots at 2x the bf16 MAC rate from
    per-row-quantized data (exact 2xint8 split, scales folded out) and
    per-column int8-split bases.  Gain, Nyquist rank-1 terms, the y512
    column, the J lane flip, and the OLA carry are unchanged (the J flip
    stays a 2-pass bf16 0/1-GEMM: folding it into doubled int8 bases costs
    3.0 bf16-equivalent passes vs J's 2.0)."""
    if mode not in ("wiener", "specsub"):
        raise ValueError(mode)

    def kernel(Uh, Ul, Vh, Vl, sv, cr, unyq, ycol, J, re_ref, im_ref, ren_ref,
               ns_ref, nsn_ref, out_ref, ctail):
        pid = pl.program_id(0)

        @pl.when(pid == 0)
        def _():
            ctail[...] = jnp.zeros_like(ctail)

        re = re_ref[...]
        im = im_ref[...]
        ns512 = ns_ref[...]
        ren = ren_ref[...]
        nsn = nsn_ref[...]
        if mode == "wiener":
            P = re * re + im * im
            v = ns512 * ns512 / P
            g = 1.0 - jnp.where(v >= 1.0, 1.0, v)
            vn = nsn * nsn / (ren * ren)
            gn = 1.0 - jnp.where(vn >= 1.0, 1.0, vn)
        else:
            mag = jnp.sqrt(re * re + im * im)
            g = (mag - ns512) / mag
            magn = jnp.abs(ren)
            gn = (magn - nsn) / magn
        Yre = re * g
        Yim = im * g
        Yren = ren * gn
        hre, lre, qre, z2re, q2re = _quant_row_int8(Yre, hq=hq)
        him, lim, qim, z2im, q2im = _quant_row_int8(Yim, hq=hq)
        u = _inv_plane8(hre, lre, Uh[...], Ul[...], sv[0:1], sv[1:2], cr[0:1],
                        qre, z2re, q2re, hq=hq)
        u = u + Yren * unyq[...]
        vv = _inv_plane8(him, lim, Vh[...], Vl[...], sv[2:3], sv[3:4], cr[1:2],
                         qim, z2im, q2im, hq=hq)
        head = u - vv
        w2 = u + vv
        doth = lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        y512 = doth(Yre, ycol[...]) + Yren * y512n
        w2h = w2.astype(jnp.bfloat16).astype(jnp.float32)
        w2l = w2 - w2h
        d1 = lambda x, y: jax.lax.dot_general(
            x, y, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        rows = jax.lax.broadcasted_iota(jnp.int32, (F, 1), 0)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (F, 512), 1)
        tail = d1(w2h, J[...]) + d1(w2l, J[...])
        tail = jnp.where(lanes == 0, y512, tail)
        tail_prev = jnp.where(rows == 0, ctail[...], pltpu.roll(tail, 1, 0))
        ctail[...] = tail[F - 1 :, :]
        gidx = rows + pid * F
        acc = head + tail_prev * (gidx >= 2).astype(jnp.float32)
        val = _c_short_f32(acc * (gidx >= 1).astype(jnp.float32))
        if not emit_all:  # fold the t<2 warm-up mask + int16 store in-kernel
            val = val * (gidx >= 2).astype(jnp.float32)
        out_ref[...] = val.astype(jnp.int32).astype(jnp.int16)

    return kernel


def enhance_back_ola8_pallas(re, im, re_n, ns512, ns_n, M8B, u_nyq, y512col,
                             Jflip, mode: str = "wiener", F: int = 512,
                             emit_all: bool = False, interpret: bool = False,
                             hq: bool = True):
    """int8-MXU gain + inverse + in-kernel flip/OLA/c_short.

    M8B: dict from ops.enhance._dft_mats_int8_back -- int8 splits of
    UC512/VS512 with per-column scales and folded +128-shift rows.
    Same contract as :func:`enhance_back_ola3_pallas` except the output is
    int16 with the c_short truncation AND the t<2 warm-up mask (unless
    ``emit_all``) applied in-kernel -- the XLA-side cast+where passes cost
    ~0.1 ms of HBM traffic per 16384-block batch.  Fidelity is bounded by
    the ~2^-16 row quantization + matrix-split error (per-engine SNR
    floors pinned in tests/test_engine_matrix.py)."""
    T = re.shape[0]
    assert T % F == 0, (T, F)
    ycol = jnp.asarray(y512col[:512], jnp.float32).reshape(512, 1)
    y512n = float(y512col[512])
    consts = [
        jnp.asarray(M8B["Uh"]), jnp.asarray(M8B["Ul"]),
        jnp.asarray(M8B["Vh"]), jnp.asarray(M8B["Vl"]),
        jnp.asarray(M8B["scales"]),  # (4, 512) f32: s1U, s2U, s1V, s2V
        jnp.asarray(M8B["crows"]),   # (2, 512) f32: U, V +128-shift rows
        jnp.asarray(u_nyq, jnp.float32).reshape(1, 512), ycol,
        jnp.asarray(Jflip, jnp.float32),
    ]
    const_specs = [
        pl.BlockSpec(c.shape, lambda i: (0,) * c.ndim, memory_space=pltpu.VMEM)
        for c in consts
    ]
    blk = pl.BlockSpec((F, 512), lambda i: (i, 0), memory_space=pltpu.VMEM)
    col = pl.BlockSpec((F, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_back_ola8_kernel(mode, y512n, F, emit_all, hq=hq),
        out_shape=jax.ShapeDtypeStruct((T, 512), jnp.int16),
        grid_spec=pl.GridSpec(
            grid=(T // F,),
            in_specs=const_specs + [blk, blk, col, blk, col],
            out_specs=blk,
            scratch_shapes=[pltpu.VMEM((1, 512), jnp.float32)],
        ),
        interpret=interpret,
    )(*consts, re, im, re_n, ns512, ns_n)


def _vad_kernel(w2row, cur_ref, sp_ref):
    sp_ref[...] = _vad_rows(cur_ref[...].astype(jnp.float32), w2row[...])


def vad_flags_pallas(cur, w2, F: int = 512, interpret: bool = False):
    """(T, 512) int16 blocks -> (T, 1) f32 speech flags (vad_flags
    semantics) in ONE read of the input.

    MEASURED NEGATIVE in context (r5c): standalone this kernel is ~10x
    cheaper than the XLA vad_flags pass (which materializes (T, 512) f32
    windowed temps, ~0.22 ms at T=16384), but routing the fused-full
    chain through it measured 7% SLOWER interleaved (6.03 vs 6.50 G):
    XLA overlaps its own VAD pass with the main kernel inside the chained
    graph, while an extra pallas_call serializes.  Kept (with its
    exactness test) as the measured record; the chain uses the XLA
    form."""
    T = cur.shape[0]
    assert T % F == 0, (T, F)
    w2r = jnp.asarray(w2, jnp.float32).reshape(1, 512)
    return pl.pallas_call(
        _vad_kernel,
        out_shape=jax.ShapeDtypeStruct((T, 1), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(T // F,),
            in_specs=[
                pl.BlockSpec((1, 512), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((F, 512), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((F, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(w2r, cur)


def _hi_lo(x):
    """Exact bf16 hi + f32 residual split (Sterbenz: the residual is exact)."""
    xh = x.astype(jnp.bfloat16).astype(jnp.float32)
    return xh, x - xh


def _make_full8_kernel(mode: str, y512n: float, F: int, L: int, emit_all: bool,
                       hq: bool = True):
    """The fully-fused enhancement engine (mxu8f): forward int8 rDFT ->
    in-kernel noise latch -> gain -> int8 inverse -> OLA, one kernel, one
    pass over HBM (input blocks in, int16 samples out; re/im/|X|/ns planes
    never leave VMEM -- r4's mxu8 spent ~70% of its time moving them).

    The only global state, the noise latch (WienerFilter_final.cpp:97-159),
    runs in-VMEM via the closed form of ops.enhance._noise_latch_parts:
    every per-row scalar (weight w = c*2^lk, rescale p = 2^-lk, active
    latch row g, p[g]) is precomputed in XLA from the VAD flags (tiny (T,)
    work) and rides in as a (F, 8) row pack; the data-dependent prefix
        ns[r] = p_g * (A0s[chunk(g)] + sum_{j<=g, same chunk} w_j |X_j|)
    becomes ONE matmul ns = M @ wm with M[r, j] = p_g[r] * [j <= g_r,
    chunk-aligned] -- every M entry is a power of two or zero, hence EXACT
    in bf16, so the pair (M @ wm_hi + M @ wm_lo) is f32-class at 2 MXU
    passes.  Chunk aggregates (SEL), the chunk-base gather (H2) and the
    last-row picks (SELpick) are skinny 0/1 GEMMs; the sequential part --
    the C = F/L chunk-state composition + cross-tile carries (running
    average A0, latched N, prev-block row, OLA tail) -- is O(C) vector ops
    on the kernel's sequential grid.
    """
    if mode not in ("wiener", "specsub"):
        raise ValueError(mode)
    C = F // L
    assert C * L == F, (F, L)

    def kernel(Whcp, Wlcp, Whcc, Wlcc, Whsp, Wlsp, Whsc, Wlsc, fscales, fcrows,
               nyp, nyc, SEL, SELpick, Uh, Ul, Vh, Vl, bscales, bcrows, unyq,
               ycol, J, cur_ref, rp_ref, out_ref,
               cprev, A0c, A0nc, Nc, Nnc, ctail):
        pid = pl.program_id(0)

        @pl.when(pid == 0)
        def _():
            cprev[...] = jnp.zeros_like(cprev)
            A0c[...] = jnp.zeros_like(A0c)
            A0nc[...] = jnp.zeros_like(A0nc)
            Nc[...] = jnp.zeros_like(Nc)
            Nnc[...] = jnp.zeros_like(Nnc)
            ctail[...] = jnp.zeros_like(ctail)

        # ---- forward int8 rDFT (as _fwd8_kernel) ----
        cur = cur_ref[...].astype(jnp.int32)
        rows = jax.lax.broadcasted_iota(jnp.int32, (F, 1), 0)
        prev = jnp.where(rows == 0, cprev[...], pltpu.roll(cur, 1, 0))
        cprev[...] = cur[F - 1 :, :]

        def split8(xi):
            xh = jax.lax.shift_right_arithmetic(xi, jnp.int32(8))
            xl = xi - 256 * xh - 128
            return xh.astype(jnp.int8), xl.astype(jnp.int8)

        ph, plo = split8(prev)
        ch, cl = split8(cur)
        s = fscales[...]
        re = _fwd8_plane(ph, plo, ch, cl, Whcp[...], Wlcp[...], Whcc[...],
                         Wlcc[...], s[0:1], s[1:2], s[2:3], s[3:4], fcrows[0:1])
        im = _fwd8_plane(ph, plo, ch, cl, Whsp[...], Wlsp[...], Whsc[...],
                         Wlsc[...], s[4:5], s[5:6], s[6:7], s[7:8], fcrows[1:2])
        pf = prev.astype(jnp.float32)
        cf = cur.astype(jnp.float32)
        doth = lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        ren = doth(pf, nyp[...]) + doth(cf, nyc[...])

        # ---- in-kernel noise latch (closed form, exact-bf16 M matmuls) ----
        mag = jnp.sqrt(re * re + im * im)
        magn = jnp.abs(ren)
        rp = rp_ref[...]
        w = rp[:, 0:1]
        p = rp[:, 1:2]
        g = rp[:, 2:3]
        pg = rp[:, 3:4]
        d1 = lambda x, y: jax.lax.dot_general(
            x, y, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        wm_h, wm_l = _hi_lo(w * mag)
        wmn_h, wmn_l = _hi_lo(w * magn)
        S_last = d1(SEL[...], wm_h) + d1(SEL[...], wm_l)      # (C, 512)
        S_last_n = d1(SEL[...], wmn_h) + d1(SEL[...], wmn_l)  # (C, 1)
        a_el = d1(SELpick[...], p)                            # (C, 1) 2^-k: exact
        b_el = a_el * S_last
        b_el_n = a_el * S_last_n
        A0 = A0c[...]
        A0n = A0nc[...]
        A0s_rows, A0n_rows = [], []
        for ci in range(C):  # sequential chunk-state composition (tiny)
            A0s_rows.append(A0)
            A0n_rows.append(A0n)
            A0 = a_el[ci : ci + 1] * A0 + b_el[ci : ci + 1]
            A0n = a_el[ci : ci + 1] * A0n + b_el_n[ci : ci + 1]
        A0s = jnp.concatenate(A0s_rows, axis=0)   # (C, 512) chunk entry states
        A0sn = jnp.concatenate(A0n_rows, axis=0)  # (C, 1)
        A0c[...] = A0
        A0nc[...] = A0n

        # tile-local latch row (g is an exact small integer in f32; Mosaic
        # iota is integer-only, so the selector compares run in int32)
        gli = g.astype(jnp.int32) - F * pid
        jlane = jax.lax.broadcasted_iota(jnp.int32, (F, F), 1)
        cg = jnp.floor_divide(gli, L)
        sel = (jlane <= gli) & (jnp.floor_divide(jlane, L) == cg)
        M = pg * sel.astype(jnp.float32)  # rows with g < tile start -> all 0
        ns_in = d1(M, wm_h) + d1(M, wm_l)
        ns_in_n = d1(M, wmn_h) + d1(M, wmn_l)
        clane = jax.lax.broadcasted_iota(jnp.int32, (F, C), 1)
        H2 = ((clane == cg) & (gli >= 0)).astype(jnp.float32)
        A0s_h, A0s_l = _hi_lo(A0s)
        A0sn_h, A0sn_l = _hi_lo(A0sn)
        base = pg * (d1(H2, A0s_h) + d1(H2, A0s_l))
        base_n = pg * (d1(H2, A0sn_h) + d1(H2, A0sn_l))
        in_prev = gli < 0  # latch row in an earlier tile (or none): carried N
        ns512 = jnp.where(in_prev, Nc[...], ns_in + base)
        nsn = jnp.where(in_prev, Nnc[...], ns_in_n + base_n)
        Nc[...] = ns512[F - 1 :, :]
        Nnc[...] = nsn[F - 1 :, :]

        # ---- gain + int8 inverse + OLA (as _make_back_ola8_kernel) ----
        if mode == "wiener":
            P = re * re + im * im
            v = ns512 * ns512 / P
            gn512 = 1.0 - jnp.where(v >= 1.0, 1.0, v)
            vn = nsn * nsn / (ren * ren)
            gnn = 1.0 - jnp.where(vn >= 1.0, 1.0, vn)
        else:
            gn512 = (mag - ns512) / mag
            gnn = (magn - nsn) / magn
        Yre = re * gn512
        Yim = im * gn512
        Yren = ren * gnn
        hre, lre, qre, z2re, q2re = _quant_row_int8(Yre, hq=hq)
        him, lim, qim, z2im, q2im = _quant_row_int8(Yim, hq=hq)
        sv = bscales[...]
        cr = bcrows[...]
        u = _inv_plane8(hre, lre, Uh[...], Ul[...], sv[0:1], sv[1:2], cr[0:1],
                        qre, z2re, q2re, hq=hq)
        u = u + Yren * unyq[...]
        vv = _inv_plane8(him, lim, Vh[...], Vl[...], sv[2:3], sv[3:4], cr[1:2],
                         qim, z2im, q2im, hq=hq)
        head = u - vv
        w2 = u + vv
        y512 = doth(Yre, ycol[...]) + Yren * y512n
        w2h, w2l = _hi_lo(w2)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (F, 512), 1)
        tail = d1(w2h, J[...]) + d1(w2l, J[...])
        tail = jnp.where(lanes == 0, y512, tail)
        tail_prev = jnp.where(rows == 0, ctail[...], pltpu.roll(tail, 1, 0))
        ctail[...] = tail[F - 1 :, :]
        gidx = rows + pid * F
        acc = head + tail_prev * (gidx >= 2).astype(jnp.float32)
        val = _c_short_f32(acc * (gidx >= 1).astype(jnp.float32))
        if not emit_all:
            val = val * (gidx >= 2).astype(jnp.float32)
        out_ref[...] = val.astype(jnp.int32).astype(jnp.int16)

    return kernel


def enhance_full8_pallas(cur, rowpack, M8, M8B, nyq, u_nyq, y512col, Jflip,
                         mode: str = "wiener", F: int = 256, L: int = 64,
                         emit_all: bool = False, interpret: bool = False,
                         hq: bool = True):
    """One-kernel enhancement chain: (T, 512) int16 blocks + (T, 8) latch
    row pack (from ops.enhance._latch_rowpack) -> (T, 512) int16 output.

    See :func:`_make_full8_kernel`.  Same observable as the mxu8 pipeline
    (enhance_fwd_int8_pallas -> XLA closed-form latch ->
    enhance_back_ola8_pallas) up to latch addition grouping -- SNR floors
    pinned in tests/test_engine_matrix.py and utils/tpu_checks.py.
    """
    T = cur.shape[0]
    assert T % F == 0, (T, F)
    C = F // L
    SEL = np.zeros((C, F), np.float32)
    for c in range(C):
        SEL[c, c * L : (c + 1) * L] = 1.0
    SELpick = np.zeros((C, F), np.float32)
    for c in range(C):
        SELpick[c, c * L + L - 1] = 1.0
    consts = [jnp.asarray(M8[k]) for k in
              ("WhCp", "WlCp", "WhCc", "WlCc", "WhSp", "WlSp", "WhSc", "WlSc")]
    consts += [
        jnp.asarray(M8["scales"]), jnp.asarray(M8["crows"]),
        jnp.asarray(nyq[:512], jnp.float32).reshape(512, 1),
        jnp.asarray(nyq[512:], jnp.float32).reshape(512, 1),
        jnp.asarray(SEL), jnp.asarray(SELpick),
        jnp.asarray(M8B["Uh"]), jnp.asarray(M8B["Ul"]),
        jnp.asarray(M8B["Vh"]), jnp.asarray(M8B["Vl"]),
        jnp.asarray(M8B["scales"]), jnp.asarray(M8B["crows"]),
        jnp.asarray(u_nyq, jnp.float32).reshape(1, 512),
        jnp.asarray(y512col[:512], jnp.float32).reshape(512, 1),
        jnp.asarray(Jflip, jnp.float32),
    ]
    y512n = float(y512col[512])
    const_specs = [
        pl.BlockSpec(c.shape, lambda i: (0,) * c.ndim, memory_space=pltpu.VMEM)
        for c in consts
    ]
    blk = pl.BlockSpec((F, 512), lambda i: (i, 0), memory_space=pltpu.VMEM)
    rpk = pl.BlockSpec((F, 8), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_full8_kernel(mode, y512n, F, L, emit_all, hq=hq),
        out_shape=jax.ShapeDtypeStruct((T, 512), jnp.int16),
        grid_spec=pl.GridSpec(
            grid=(T // F,),
            in_specs=const_specs + [blk, rpk],
            out_specs=blk,
            scratch_shapes=[
                pltpu.VMEM((1, 512), jnp.int32),    # cprev
                pltpu.VMEM((1, 512), jnp.float32),  # A0 carry
                pltpu.VMEM((1, 1), jnp.float32),    # A0 nyquist carry
                pltpu.VMEM((1, 512), jnp.float32),  # latched N carry
                pltpu.VMEM((1, 1), jnp.float32),    # latched N nyquist carry
                pltpu.VMEM((1, 512), jnp.float32),  # OLA tail carry
            ],
        ),
        interpret=interpret,
    )(*consts, cur, rowpack)


def _make_back_kernel(mode: str, y512n: float):
    if mode not in ("wiener", "specsub"):  # CPU path raises; match it here
        raise ValueError(mode)

    def kernel(uc, vs, unyq, ycol, re_ref, im_ref, ren_ref, ns_ref, nsn_ref,
               head_ref, w2_ref, y512_ref):
        re = re_ref[...]
        im = im_ref[...]
        ns512 = ns_ref[...]
        ren = ren_ref[...]
        nsn = nsn_ref[...]
        if mode == "wiener":
            P = re * re + im * im
            v = ns512 * ns512 / P  # 0/0 -> NaN, as the reference
            g = 1.0 - jnp.where(v >= 1.0, 1.0, v)
            vn = nsn * nsn / (ren * ren)
            gn = 1.0 - jnp.where(vn >= 1.0, 1.0, vn)
        else:  # specsub
            mag = jnp.sqrt(re * re + im * im)
            g = (mag - ns512) / mag
            magn = jnp.abs(ren)
            gn = (magn - nsn) / magn
        Yre = re * g
        Yim = im * g
        Yren = ren * gn
        u = _dot3(Yre, uc[...]) + Yren * unyq[...]
        vv = _dot3(Yim, vs[...])
        head_ref[...] = u - vv
        w2_ref[...] = u + vv
        doth = lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        y512_ref[...] = doth(Yre, ycol[...]) + Yren * y512n

    return kernel


def enhance_back_pallas(re, im, re_n, ns512, ns_n, UC512, VS512, u_nyq, y512col,
                        mode: str = "wiener", F: int = 256, interpret: bool = False):
    """Gain + symmetry-halved inverse: returns (head, w2, y512).

    head = y[0:512]; w2 = u + v (whose flipped tail is y[513:1024]);
    y512 = the single s=512 sample.  The caller assembles OLA.
    y512col: (513,) inverse column for s=512 (index 512 = Nyquist term).
    """
    T = re.shape[0]
    assert T % F == 0, (T, F)
    ycol = jnp.asarray(y512col[:512], jnp.float32).reshape(512, 1)
    y512n = float(y512col[512])  # Nyquist term baked in as a literal
    consts = [
        jnp.asarray(UC512, jnp.float32), jnp.asarray(VS512, jnp.float32),
        jnp.asarray(u_nyq, jnp.float32).reshape(1, 512), ycol,
    ]
    const_specs = [
        pl.BlockSpec(c.shape, lambda i: (0,) * c.ndim, memory_space=pltpu.VMEM)
        for c in consts
    ]
    blk = pl.BlockSpec((F, 512), lambda i: (i, 0), memory_space=pltpu.VMEM)
    col = pl.BlockSpec((F, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_back_kernel(mode, y512n),
        out_shape=(
            jax.ShapeDtypeStruct((T, 512), jnp.float32),
            jax.ShapeDtypeStruct((T, 512), jnp.float32),
            jax.ShapeDtypeStruct((T, 1), jnp.float32),
        ),
        grid_spec=pl.GridSpec(
            grid=(T // F,),
            in_specs=const_specs + [blk, blk, col, blk, col],
            out_specs=(blk, blk, col),
        ),
        interpret=interpret,
    )(*consts, re, im, re_n, ns512, ns_n)
