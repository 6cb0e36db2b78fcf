"""On-TPU kernel correctness lane (skipped on CPU).

Run with::

    JEICYBOO_TPU_TESTS=1 python -m pytest tests/test_tpu_only.py -q

conftest.py honors JEICYBOO_TPU_TESTS by NOT forcing the CPU backend / x64,
so these tests exercise real Mosaic codegen.  The same checks ride every
driver bench run via bench.py -> utils.tpu_checks (reported in its JSON).
"""

import jax
import pytest

if jax.default_backend() in ("cpu",):
    pytest.skip("TPU lane: requires a non-CPU backend", allow_module_level=True)


def test_tpu_kernel_contracts():
    from jeicyboodsp_tpu.utils.tpu_checks import run_checks

    results = run_checks()
    assert results["all_ok"], results
