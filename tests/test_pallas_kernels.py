"""Pallas kernels (interpret mode on CPU): equivalence with XLA ops."""

import jax.numpy as jnp
import numpy as np

from jeicyboodsp_tpu.kernels import biquad_pallas as bq
from jeicyboodsp_tpu.ops import geq as jgeq


def test_biquad_cascade_matches_fast_mode(rng, snr):
    b, a = jgeq.geq_coefficients()
    x = rng.normal(0, 1000, (4, 1024)).astype(np.float32)
    want = np.asarray(jgeq.geq_apply_fast(jnp.asarray(x), b, a, dtype=jnp.float64))
    got = np.asarray(
        bq.geq_cascade_pallas(jnp.asarray(x), bq.pack_coefficients(b, a), interpret=True)
    )
    assert snr(want, got) >= 55.0, snr(want, got)  # f32 kernel vs f64 scan


def test_biquad_quant_cascade_bit_exact_vs_oracle(rng):
    """df32 quantized-feedback kernel reproduces the f64 oracle bit-exactly,
    including through int16 wraps (the +12 dB bands overflow full-scale)."""
    from jeicyboodsp_tpu.oracle import geq as ogeq

    n = 4096
    t = np.arange(n) / 48000.0
    sig = (
        (8000 * np.sin(2 * np.pi * 440 * t) + 4000 * np.sin(2 * np.pi * 3000 * t)
         + rng.normal(0, 500, n))
        .clip(-32768, 32767)
        .astype(np.int16)
    )
    stress = rng.integers(-32768, 32768, n).astype(np.int16)  # wrap-stress
    b, a = jgeq.geq_coefficients()
    coef = bq.pack_coefficients_df(b, a)
    for x in (sig, stress):
        ref = ogeq.run(x)
        y, _ = bq.geq_cascade_pallas_quant(jnp.asarray(x[None]), coef, interpret=True)
        got = np.asarray(y)[0].astype(np.int64)
        assert (got == ref.astype(np.int64)).all()


def test_biquad_quant_state_threading(rng):
    """Two chained kernel calls (state in/out) == one whole-signal call."""
    from jeicyboodsp_tpu.oracle import geq as ogeq

    n = 2048
    sig = rng.integers(-20000, 20000, n).astype(np.int16)
    ref = ogeq.run(sig)
    b, a = jgeq.geq_coefficients()
    coef = bq.pack_coefficients_df(b, a)
    y1, s1 = bq.geq_cascade_pallas_quant(jnp.asarray(sig[None, : n // 2]), coef, interpret=True)
    y2, _ = bq.geq_cascade_pallas_quant(
        jnp.asarray(sig[None, n // 2 :]), coef, state=s1, interpret=True
    )
    got = np.concatenate([np.asarray(y1)[0], np.asarray(y2)[0]]).astype(np.int64)
    assert (got == ref.astype(np.int64)).all()


def test_geq_run_pallas_quant_matches_oracle(rng):
    from jeicyboodsp_tpu.oracle import geq as ogeq

    sig = rng.integers(-32768, 32768, 1200).astype(np.int16)  # partial block
    ref = ogeq.run(sig)
    got = jgeq.run_pallas_quant(sig, interpret=True)
    assert (got.astype(np.int64) == ref.astype(np.int64)).all()


def test_four_step_fft_matches_numpy(rng):
    from jeicyboodsp_tpu.kernels.fft_pallas import fft_four_step, fft_pallas
    import jax.numpy as jnp

    for n in (512, 1024, 8192):
        x = rng.normal(0, 100, (3, n)).astype(np.float32)
        want = np.fft.fft(x)
        r, i = fft_four_step(jnp.asarray(x), jnp.zeros((3, n), jnp.float32), n)
        got = np.asarray(r) + 1j * np.asarray(i)
        assert np.abs(got - want).max() / np.abs(want).max() < 1e-5
        r2, i2 = fft_pallas(jnp.asarray(x), jnp.zeros((3, n), jnp.float32), n, interpret=True)
        got2 = np.asarray(r2) + 1j * np.asarray(i2)
        assert np.abs(got2 - want).max() / np.abs(want).max() < 1e-5
        # inverse roundtrip
        rr, ri = fft_four_step(r, i, n, forward=False)
        assert np.abs(np.asarray(rr) / n - x).max() < 2e-3


def test_nlms_pallas_matches_oracle(rng, snr):
    from jeicyboodsp_tpu.kernels.nlms_pallas import nlms_pallas
    from jeicyboodsp_tpu.oracle import nlms as onl

    n = 1024 * 2
    x = np.clip(rng.normal(0, 3000, n), -32768, 32767).astype(np.int16)
    h = rng.normal(0, 0.1, 32)
    h[0] = 0.5
    ref = np.clip(np.convolve(x.astype(np.float64), h)[:n], -32768, 32767).astype(np.int16)
    # oracle (bit-exact to the C program); kernel is the f32 batched fast path
    state = onl.NLMSState()
    oe1, oerr1, _ = onl.nlms_block(state, x[:1024], ref[:1024])
    oe2, oerr2, _ = onl.nlms_block(state, x[1024:], ref[1024:])
    want_e = np.concatenate([oe1, oe2])
    est, err = nlms_pallas(jnp.asarray(x[None]), jnp.asarray(ref[None]), interpret=True)
    got_e = np.asarray(est)[0]
    # double-single coefficient state makes the kernel bit-exact vs the
    # f64 oracle (plain-f32 coeff accumulation was the ~55 dB error floor)
    assert (got_e.astype(np.int64) == want_e.astype(np.int64)).all()
    # fast mode (r5, VERDICT item 8): single-dot estimate + O(1) df32
    # running window energy; the df32 COEFFICIENT accumulator (the 55 dB
    # culprit) stays, so the observable holds far above the 60 dB bar
    # (measured truncation-identical on this probe)
    est_f, _ = nlms_pallas(jnp.asarray(x[None]), jnp.asarray(ref[None]),
                           interpret=True, fast=True)
    got_f = np.asarray(est_f)[0].astype(np.float64)
    w = want_e.astype(np.float64)
    s = 10 * np.log10(max((w ** 2).sum(), 1e-30) /
                      max(((w - got_f) ** 2).sum(), 1e-30))
    assert s >= 60.0, s


def test_bnlms_pallas_matches_oracle(rng):
    """df32 block-NLMS kernel is int16-exact vs the f64 bit-exact oracle,
    including the gated (double-talk) no-update path."""
    from jeicyboodsp_tpu.kernels.nlms_pallas import bnlms_pallas
    from jeicyboodsp_tpu.oracle import nlms as onl

    n = 1024 * 3
    x = np.clip(rng.normal(0, 3000, n), -32768, 32767).astype(np.int16)
    h = rng.normal(0, 0.1, 24)
    h[0] = 0.6
    ref = np.clip(np.convolve(x.astype(np.float64), h)[:n], -32768, 32767).astype(np.int16)
    # second stream: anti-correlated ref -> gate blocks the update
    ref2 = np.clip(-ref.astype(np.int32), -32768, 32767).astype(np.int16)

    want = []
    for r in (ref, ref2):
        st = onl.BNLMSState()
        es = [onl.bnlms_block(st, x[s : s + 1024], r[s : s + 1024])[0] for s in range(0, n, 1024)]
        want.append(np.concatenate(es))
    want = np.stack(want)

    est, err = bnlms_pallas(
        jnp.asarray(np.stack([x, x])), jnp.asarray(np.stack([ref, ref2])), interpret=True
    )
    got = np.asarray(est)
    assert (got.astype(np.int64) == want.astype(np.int64)).all()


def test_amdf_kernel_matches_masked_reference(rng):
    """VMEM-resident AMDF == the reference's masked time-domain loop."""
    from jeicyboodsp_tpu.kernels.amdf_pallas import amdf_pallas

    T, n = 5, 1024
    u = rng.integers(-3000, 3000, (T, n)).astype(np.float32)
    want = np.zeros((T, 512), np.float32)
    for k in range(512):
        want[:, k] = np.abs(u[:, : n - k] - u[:, k:]).sum(axis=1) / (n - k)
    got = np.asarray(amdf_pallas(jnp.asarray(u), interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-3)

    # lo=96 (the pitch path's truncation): rows are exactly the tail of lo=0
    got96 = np.asarray(amdf_pallas(jnp.asarray(u), lo=96, interpret=True))
    np.testing.assert_allclose(got96, want[:, 96:], rtol=1e-6, atol=1e-3)


def test_mfcc_fused_kernel_matches_oracle(rng):
    """The fully-fused MFCC kernel (interpret mode): pre-emphasis + window
    folded into the DFT bases, mel/log/DCT in VMEM -- must match the f64
    oracle >= 60 dB and the XLA mxu3 path to bf16x3 regrouping rounding."""
    import jax.numpy as jnp

    from jeicyboodsp_tpu.kernels.mfcc_pallas import mfcc_fused_pallas
    from jeicyboodsp_tpu.ops.features import dct_lifter_matrix, mel_matrix, mfcc_frames
    from jeicyboodsp_tpu.oracle import mfcc as omfcc

    T = 8
    n = T * 1024
    x = np.clip(
        5000 * np.sin(2 * np.pi * 313 * np.arange(n) / 16000) + rng.normal(0, 20, n),
        -32768, 32767,
    ).astype(np.int16)
    flat = np.concatenate([np.zeros(512, np.int16), x])
    rows = flat.reshape(2 * T + 1, 512)
    got = np.asarray(
        mfcc_fused_pallas(jnp.asarray(rows[:-1]), jnp.asarray(rows[1:]), F=8, interpret=True)
    )
    frames = jnp.asarray(np.concatenate([rows[:-1], rows[1:]], axis=1))
    want = np.asarray(mfcc_frames(
        frames, jnp.asarray(mel_matrix(np.float32)), jnp.asarray(dct_lifter_matrix(np.float32)),
        dtype=jnp.float32, fft_engine="mxu3",
    ))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=5e-3)
    oref = omfcc.run(x, skip_first=False)
    s = 10 * np.log10(
        (oref ** 2).sum() / max(((oref - got.astype(np.float64)) ** 2).sum(), 1e-30)
    )
    assert s >= 60.0, s


def test_vad_flags_pallas_matches_xla(rng):
    """The one-read Pallas VAD == ops.enhance.vad_flags exactly (sign
    decisions are integer products; the energy threshold compare is in the
    same f32 rounding class on both paths)."""
    import jax.numpy as jnp
    from jeicyboodsp_tpu.kernels import enhance_pallas as EP
    from jeicyboodsp_tpu.ops import enhance as E

    n = 512 * 24
    t = np.arange(n) / 16000
    sp = 5000 * np.sin(2 * np.pi * 313 * t) * (t > 0.4)
    x = np.clip(sp + rng.normal(0, 20, n), -32768, 32767).astype(np.int16)
    blocks = jnp.asarray(x.reshape(-1, 512))
    want = np.asarray(E.vad_flags(blocks, jnp.float32))
    M = E._dft_mats_aligned()
    got = np.asarray(EP.vad_flags_pallas(blocks, M["w2"], F=8, interpret=True))[:, 0] > 0.5
    np.testing.assert_array_equal(want, got)


def test_enhance_fused_kernels_match_xla_path(rng, snr):
    """The Pallas-fused enhance fast path (interpret mode) matches the
    plain-XLA fast path (f32, HIGH) and holds the oracle SNR contract."""
    import jax
    from jeicyboodsp_tpu.ops import enhance as E
    from jeicyboodsp_tpu.oracle import enhance as oenh

    n = 512 * 40
    t = np.arange(n) / 16000
    speech = 5000 * np.sin(2 * np.pi * 313 * t) * (t > 0.4)
    x = np.clip(speech + rng.normal(0, 20, n), -32768, 32767).astype(np.int16)
    blocks = jnp.asarray(x.reshape(-1, 512))
    for mode in ("wiener", "specsub"):
        out_f, mask_f = E._enhance_fused(blocks, mode, emit_all=False, interpret=True)
        out_x, mask_x = E.enhance_blocks(  # CPU: takes the plain-XLA branch
            blocks, mode=mode, dtype=jnp.float32, use_assoc_scan=True,
            real_fft=True, resynth="ratio", fft_engine="mxu3",
        )
        np.testing.assert_array_equal(np.asarray(mask_f), np.asarray(mask_x))
        a = np.asarray(out_f)[np.asarray(mask_f)].astype(np.float64)
        b = np.asarray(out_x)[np.asarray(mask_x)].astype(np.float64)
        # bf16x3 vs precision=HIGH: identical decomposition, different
        # grouping -- +-1 LSB after int16 quantization
        d = np.abs(a - b)
        assert d.max() <= 1, (mode, d.max())
        want = oenh.run(x, mode).astype(np.float64)
        got = a.reshape(-1)
        s = 10 * np.log10((want ** 2).sum() / max(((want - got) ** 2).sum(), 1e-30))
        assert s >= 60.0, (mode, s)
        # fused3 (in-kernel permutation-GEMM flip + OLA + c_short, the TPU
        # default): same kernel values; the only differences are +-1
        # truncation flips where the XLA assembly's add rounds across an
        # integer boundary (the kernel sum is the exact one)
        out_3, mask_3 = E._enhance_fused3(blocks, mode, emit_all=False,
                                          interpret=True, F=8)
        np.testing.assert_array_equal(np.asarray(mask_f), np.asarray(mask_3))
        d3 = np.asarray(out_f).astype(int) - np.asarray(out_3).astype(int)
        assert np.abs(d3).max() <= 1 and (d3 != 0).mean() < 0.005, (
            mode, np.abs(d3).max(), (d3 != 0).mean(),
        )
        c = np.asarray(out_3)[np.asarray(mask_3)].astype(np.float64).reshape(-1)
        s3 = 10 * np.log10((want ** 2).sum() / max(((want - c) ** 2).sum(), 1e-30))
        assert s3 >= 60.0, (mode, s3)
        # full-int8 engine (mxu8): exact int8 data split + per-column int8
        # matrix split + per-row-quantized inverse -- each term ~2^-16,
        # chain observable ~69-72 dB; the engine's documented floor is 65
        # (config.ENGINE_FIDELITY), re-proven on silicon by tpu_checks
        out_8, mask_8 = E._enhance_fused3(blocks, mode, emit_all=False,
                                          interpret=True, F=8, int8=True)
        np.testing.assert_array_equal(np.asarray(mask_f), np.asarray(mask_8))
        e = np.asarray(out_8)[np.asarray(mask_8)].astype(np.float64).reshape(-1)
        s8 = 10 * np.log10((want ** 2).sum() / max(((want - e) ** 2).sum(), 1e-30))
        assert s8 >= 65.0, (mode, s8)
        # fully-fused single-kernel engine (mxu8f): same int8 fwd/inverse as
        # mxu8; the noise latch runs IN-kernel via exact power-of-two 0/1
        # matmuls (M @ wm), so the only delta vs mxu8 is latch addition
        # grouping -- +-1 LSB flips on a handful of samples
        out_ff, mask_ff = E._enhance_fused_full(blocks, mode, emit_all=False,
                                                interpret=True, F=8, L=4)
        np.testing.assert_array_equal(np.asarray(mask_f), np.asarray(mask_ff))
        dff = np.asarray(out_ff).astype(int) - np.asarray(out_8).astype(int)
        assert np.abs(dff).max() <= 1 and (dff != 0).mean() < 0.01, (
            mode, np.abs(dff).max(), (dff != 0).mean(),
        )
        f = np.asarray(out_ff)[np.asarray(mask_ff)].astype(np.float64).reshape(-1)
        sff = 10 * np.log10((want ** 2).sum() / max(((want - f) ** 2).sum(), 1e-30))
        assert sff >= 65.0, (mode, sff)
