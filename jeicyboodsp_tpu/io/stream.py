"""Host-level streaming sessions with checkpoint/resume.

The reference carries all streaming state in C ``static`` locals, so a
crashed run loses everything.  Here the state is an explicit pytree
(SURVEY §5 checkpoint/resume: "resume-from-block-k is trivial --
checkpoint = carries + sample offset"), persisted with
``models.serialization.save_pytree``.
"""

from __future__ import annotations

import numpy as np

from jeicyboodsp_tpu.models.serialization import load_pytree, save_pytree


class GEQSession:
    """Streaming compat GEQ (native bit-exact kernel) with resume."""

    def __init__(self, gains_db=None):
        from jeicyboodsp_tpu.oracle.geq import GAINS_DB, calc_coefficients

        self._b, self._a = calc_coefficients(gains_db=gains_db or GAINS_DB)
        self.keep_in = np.zeros((7, 2), np.int16)
        self.keep_out = np.zeros((7, 2), np.int16)

    def process(self, x: np.ndarray) -> np.ndarray:
        from jeicyboodsp_tpu import native

        return native.geq_process(np.asarray(x, np.int16), self._b, self._a, self.keep_in, self.keep_out)

    def checkpoint(self, path: str) -> None:
        np.savez(path, keep_in=self.keep_in, keep_out=self.keep_out)

    def restore(self, path: str) -> None:
        d = np.load(path)
        self.keep_in = d["keep_in"].copy()
        self.keep_out = d["keep_out"].copy()


class AECSession:
    """Streaming compat NLMS/BNLMS (native bit-exact kernels) with resume."""

    def __init__(self, variant: str = "nlms"):
        self.variant = variant
        if variant == "nlms":
            self.coeff = np.zeros(256, np.float64)
            self.keep = np.zeros(255, np.int16)
        else:
            self.coeff = np.zeros(128, np.float64)
            self.keep = np.zeros(127, np.int16)
            self.keep_ref = np.zeros(127, np.int16)

    def process(self, x: np.ndarray, ref: np.ndarray):
        from jeicyboodsp_tpu import native

        if self.variant == "nlms":
            return native.nlms_process(x, ref, self.coeff, self.keep)
        return native.bnlms_process(x, ref, self.coeff, self.keep, self.keep_ref)

    def checkpoint(self, path: str) -> None:
        state = {"coeff": self.coeff, "keep": self.keep}
        if self.variant != "nlms":
            state["keep_ref"] = self.keep_ref
        np.savez(path, **state)

    def restore(self, path: str) -> None:
        d = np.load(path)
        self.coeff = d["coeff"].copy()
        self.keep = d["keep"].copy()
        if self.variant != "nlms":
            self.keep_ref = d["keep_ref"].copy()


class EnhanceSession:
    """Chunked Wiener / spectral-subtraction streaming with resume."""

    def __init__(self, mode: str = "wiener", dtype=None):
        import jax.numpy as jnp

        from jeicyboodsp_tpu.ops import enhance as E

        self._E = E
        self._mode = mode
        self._dtype = dtype if dtype is not None else jnp.float64
        self.state = E.stream_init_state(self._dtype)

    def process(self, blocks: np.ndarray) -> np.ndarray:
        """(Tc, 512) int16 in -> written output samples out."""
        import jax.numpy as jnp

        out, mask, self.state = self._E.enhance_chunk(
            self.state, jnp.asarray(blocks, jnp.int16), mode=self._mode, dtype=self._dtype
        )
        return np.asarray(out)[np.asarray(mask)].reshape(-1)

    def checkpoint(self, path: str) -> None:
        save_pytree(path, self.state)

    def restore(self, path: str) -> None:
        self.state = load_pytree(path, self.state)

    @property
    def sample_offset(self) -> int:
        return int(self.state["t"]) * self._E.BLOCK_LEN
