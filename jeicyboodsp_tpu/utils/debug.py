"""Debug-mode numeric guards (SURVEY §5 race detection / sanitizers).

The reference carries real UB (OOB reads, use-after-overwrite); pure
functional JAX removes data races by construction, so the debug surface here
is numeric: NaN/Inf detection on pipeline outputs and a checkify wrapper for
index/NaN errors inside jitted code.  NOTE: several compat pipelines produce
*legitimate* NaN internally (the reference's own 0/0 gains); guards are for
the fast paths and new code, opt-in.
"""

from __future__ import annotations

from contextlib import contextmanager

import jax
from jax.experimental import checkify


@contextmanager
def nan_debug():
    """Globally raise on NaN production (jax debug_nans) within the scope."""
    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


def checked(fn, errors=checkify.float_checks):
    """Wrap a jittable fn with checkify; returns fn' raising on violations."""
    cfn = checkify.checkify(fn, errors=errors)

    def wrapper(*args, **kw):
        err, out = cfn(*args, **kw)
        err.throw()
        return out

    return wrapper


def assert_all_finite(tree, name: str = "output"):
    import jax.numpy as jnp

    leaves = jax.tree_util.tree_leaves(tree)
    for i, leaf in enumerate(leaves):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            if not bool(jnp.isfinite(leaf).all()):
                raise FloatingPointError(f"{name}: non-finite values in leaf {i}")
