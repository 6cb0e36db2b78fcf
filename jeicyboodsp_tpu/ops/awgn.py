"""AWGN analysis harness: noise generation + whiteness check.

Reference: ``AnalysisAdditiveWhiteGaussianNoise.cpp``.  The reference draws
sigma=10 Gaussian noise per 512-block from a TIME-SEEDED ``std::
default_random_engine`` (``:86-96``) -- inherently nondeterministic -- so the
compat contract here is distributional: int16-truncated N(0, 10) noise added
with C short-wrap semantics (``:140-142``), plus the FFT-based
autocorrelation whiteness check (``:98-133``), which doubles as the
framework's noise/fault-injection utility (SURVEY §5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jeicyboodsp_tpu.utils.cnum import c_short_jnp

BLOCK = 512
SIGMA = 10.0


@functools.partial(jax.jit, static_argnames=("dtype",))
def add_awgn(key, blocks, sigma=SIGMA, dtype=jnp.float64):
    """(T, 512) int16 + fresh noise per block -> (noisy int16, noise int16)."""
    noise = jax.random.normal(key, blocks.shape, dtype) * sigma
    noise_s = c_short_jnp(noise)  # double -> short truncation (:94)
    out = c_short_jnp(
        (noise_s.astype(jnp.int32) + blocks.astype(jnp.int32)).astype(dtype)
    )  # short + short wraps through the int16 store (:141)
    return out, noise_s


@functools.partial(jax.jit, static_argnames=("dtype",))
def autocorrelation_blocks(blocks, dtype=jnp.float64):
    """Whiteness check: per-block FFT autocorrelation over [prev, cur]
    (:106-124), identical machinery to pitch method 1."""
    prev = jnp.concatenate([jnp.zeros((1, BLOCK), blocks.dtype), blocks[:-1]])
    frames = jnp.concatenate([prev, blocks], axis=1).astype(dtype)
    ctype = jnp.complex128 if dtype == jnp.float64 else jnp.complex64
    X = jnp.fft.fft(frames.astype(ctype))
    P = X.real ** 2 + X.imag ** 2
    return jnp.fft.ifft(P.astype(ctype)).real[:, :BLOCK]


def whiteness_ratio(blocks, dtype=jnp.float64):
    """max |R(k>0)| / R(0): near 0 for white noise."""
    ac = autocorrelation_blocks(blocks, dtype)
    return jnp.max(jnp.abs(ac[:, 1:]), axis=1) / jnp.maximum(ac[:, 0], 1e-30)
