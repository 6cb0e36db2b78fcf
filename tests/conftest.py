"""Test configuration: CPU backend with 8 virtual devices, float64 enabled.

Multi-device sharding tests run on a forced-host-device CPU mesh per
SURVEY.md §4 (no pod required); compat-mode numerics need x64.
"""

import os

TPU_LANE = os.environ.get("JEICYBOO_TPU_TESTS", "").lower() not in ("", "0", "false", "no")  # test_tpu_only.py lane

if not TPU_LANE:
    os.environ["JAX_PLATFORMS"] = "cpu"  # force: env presets the TPU backend
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not TPU_LANE:
    # sitecustomize imports jax with JAX_PLATFORMS=axon baked in, so the env
    # var alone cannot reach CPU -- use the config knob.  (The TPU lane keeps
    # the hardware backend and f32: TPUs have no x64.)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
# Persistent compile cache: XLA compiles dominate test wall-clock on CPU.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(20260817)


def snr_db(ref, test):
    """SNR of `test` against reference signal `ref`, in dB."""
    ref = np.asarray(ref, dtype=np.float64)
    test = np.asarray(test, dtype=np.float64)
    err = ref - test
    p_sig = np.sum(ref ** 2)
    p_err = np.sum(err ** 2)
    if p_err == 0:
        return np.inf
    return 10.0 * np.log10(p_sig / p_err)


@pytest.fixture(scope="session")
def snr():
    return snr_db
