"""Per-(pipeline, engine) fidelity matrix (VERDICT r3 item 6).

Every engine reachable from the CLI (`--engine {xla,mxu,mxu3,mxu8,gemm}`)
runs a small probe and is asserted against its DOCUMENTED SNR floor vs the
f64 oracle, so `--engine` cannot silently ship a sub-bar configuration.

Two lanes:

- the op-level matrix on the CPU backend (plain-XLA forms; CPU ignores the
  bf16 precision knobs, so these floors pin the MATH of each engine, not
  the TPU rounding);
- the fused Pallas kernels in interpret mode (bf16 splits and int8
  quantization evaluated literally), which carry the TRUE TPU floors:
  mxu3-fused >= 85 dB, mxu8/mxu8f (int8 fwd+back) >= 78 dB (r5: the
  lo-cross dots + 2-level row quantization lifted the int8 engines from
  ~70 to ~84 dB measured).  The on-hardware re-check of the same floors
  lives in utils/tpu_checks.py and runs with every driver bench.

The mxu1 (1-pass bf16) engine is EXCLUDED from the CLI because it lands
below the 60 dB compat bar on TPU; CPU ignores DEFAULT-precision rounding
so the exclusion guard also lives in utils/tpu_checks.py (mxu1_below_bar).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from jeicyboodsp_tpu.utils.metrics import snr_db


@pytest.fixture(scope="module")
def probe():
    rng = np.random.default_rng(11)
    t = np.arange(64 * 512) / 16000.0
    sp = 5000 * np.sin(2 * np.pi * 313 * t) * (np.sin(2 * np.pi * 0.5 * t) > 0.2)
    return np.clip(sp + rng.normal(0, 20, 64 * 512), -32768, 32767).astype(np.int16)


@pytest.mark.parametrize(
    "mode,engine,floor",
    [
        ("wiener", "xla", 95.0),
        ("wiener", "mxu", 90.0),
        ("wiener", "mxu3", 90.0),
        ("specsub", "xla", 95.0),
        ("specsub", "mxu3", 90.0),
    ],
)
def test_enhance_engine_floor(probe, mode, engine, floor):
    from jeicyboodsp_tpu.oracle import enhance as oenh
    from jeicyboodsp_tpu.ops import enhance as E

    want = oenh.run(probe, mode)
    got = E.run_stream(probe, mode, dtype=jnp.float32, use_assoc_scan=True, fft_engine=engine)
    assert snr_db(want, got) >= floor


@pytest.mark.parametrize(
    "kw,floor",
    [
        # fused bf16x3 (the TPU mxu3 path): measured ~92.6 dB on this probe
        (dict(), 85.0),
        # full int8 engine (mxu8: int8-split fwd + per-row-quantized
        # inverse): ~84 dB since r5 (lo-cross dots + 2-level row quant)
        (dict(int8=True), 78.0),
        # turbo tier (mxu8t: the r4 4-dot arithmetic): ~70 dB -- an
        # explicit speed/fidelity trade, documented and floor-pinned
        (dict(int8=True, hq=False), 65.0),
    ],
)
@pytest.mark.parametrize("mode", ["wiener", "specsub"])
def test_enhance_fused_kernel_floor(probe, mode, kw, floor):
    """Interpret mode evaluates the bf16/int8 splits literally -- these are
    the TPU engines' fidelity contracts (re-proven on silicon by
    utils/tpu_checks.run_checks with every driver bench)."""
    from jeicyboodsp_tpu.oracle import enhance as oenh
    from jeicyboodsp_tpu.ops import enhance as E

    want = oenh.run(probe, mode).astype(np.float64)
    out, mask = E._enhance_fused3(
        jnp.asarray(probe.reshape(-1, 512)), mode, False, interpret=True, F=8, **kw
    )
    got = np.asarray(out)[np.asarray(mask)].reshape(-1)
    assert snr_db(want, got) >= floor


@pytest.mark.parametrize("mode", ["wiener", "specsub"])
def test_enhance_fused_full_kernel_floor(probe, mode):
    """mxu8f (single-kernel engine incl. the in-kernel noise latch): same
    int8 arithmetic as mxu8, same >= 78 dB contract."""
    from jeicyboodsp_tpu.oracle import enhance as oenh
    from jeicyboodsp_tpu.ops import enhance as E

    want = oenh.run(probe, mode).astype(np.float64)
    out, mask = E._enhance_fused_full(
        jnp.asarray(probe.reshape(-1, 512)), mode, False, interpret=True, F=8, L=4
    )
    got = np.asarray(out)[np.asarray(mask)].reshape(-1)
    assert snr_db(want, got) >= 78.0
    # the turbo tier (mxu8t) routes through this kernel too (hq=False)
    out_t, mask_t = E._enhance_fused_full(
        jnp.asarray(probe.reshape(-1, 512)), mode, False, interpret=True,
        F=8, L=4, hq=False,
    )
    got_t = np.asarray(out_t)[np.asarray(mask_t)].reshape(-1)
    assert snr_db(want, got_t) >= 65.0


@pytest.mark.parametrize("engine,floor", [("xla", 80.0), ("mxu", 80.0), ("mxu3", 80.0)])
def test_mvdr_engine_floor(probe, engine, floor):
    from jeicyboodsp_tpu.oracle import mvdr as omv
    from jeicyboodsp_tpu.ops import mvdr as M

    rng = np.random.default_rng(12)
    xr = np.clip(
        0.8 * probe.astype(np.float64) + rng.normal(0, 15, len(probe)), -32768, 32767
    ).astype(np.int16)
    want = omv.run(probe, xr)
    got = M.run_stream(probe, xr, 0.0, dtype=jnp.float32, fft_engine=engine)
    assert snr_db(want, got) >= floor


@pytest.mark.parametrize("engine,floor", [("xla", 100.0), ("mxu", 100.0), ("mxu3", 100.0)])
def test_mfcc_engine_floor(probe, engine, floor):
    from jeicyboodsp_tpu.oracle import mfcc as omf
    from jeicyboodsp_tpu.ops import features as FE

    want = omf.run(probe)
    got = np.asarray(FE.mfcc_run(probe, dtype=jnp.float32, fft_engine=engine))
    assert snr_db(want, got) >= floor


@pytest.mark.parametrize(
    "engine,floor",
    [("auto", 85.0), ("xla", 88.0), ("mxu3", 88.0), ("gemm", 95.0),
     # 2-term int8 Toeplitz GEMM: operator-split residual bounds it
     # (~76.6-84.9 dB measured; the 3-dot form without l@Ml was 54.6)
     ("gemm8", 70.0),
     # 3-term form (r5, the --fast default): 5th dot recaptures the
     # operator residual -- +21 dB over gemm8 per the numpy decomposition;
     # 86.3 dB on this probe (the residual-free floor: output int16
     # truncation flips on the low-level segments)
     ("gemm8hq", 85.0)],
)
def test_fastconv_engine_floor(probe, engine, floor):
    from jeicyboodsp_tpu.oracle import fastconv as ofc
    from jeicyboodsp_tpu.ops import fastconv as FC

    want = ofc.run(probe)
    got = FC.run_stream(probe, dtype=jnp.float32, real_fft=True, fft_engine=engine)
    assert snr_db(want, got) >= floor


def test_fastconv_sparse_floor(probe):
    from jeicyboodsp_tpu.oracle import fastconv as ofc
    from jeicyboodsp_tpu.ops.fastconv import fastconv_blocks_sparse

    want = ofc.run(probe)
    got = np.asarray(
        fastconv_blocks_sparse(jnp.asarray(probe.reshape(-1, 1024)), dtype=jnp.float32)
    ).reshape(-1)
    assert snr_db(want, got) >= 95.0


@pytest.mark.parametrize("engine,floor", [("xla", 68.0), ("radix2", 65.0)])
def test_fft_engine_floor(probe, engine, floor):
    from jeicyboodsp_tpu.oracle import fftprog
    from jeicyboodsp_tpu.ops import fft as F

    want = fftprog.run(probe[: 16 * 512])
    got = np.asarray(
        F.roundtrip_blocks(jnp.asarray(probe[: 16 * 512].reshape(-1, 512)),
                           dtype=jnp.float32, engine=engine)
    ).reshape(-1)
    assert snr_db(want, got) >= floor
