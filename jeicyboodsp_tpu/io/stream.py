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
