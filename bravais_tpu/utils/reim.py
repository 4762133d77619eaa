"""Real/imaginary boundary helpers.

The axon TPU platform rejects complex arrays at the host<->device
boundary (see CLAUDE.md). Every public jitted entry point therefore
takes/returns real arrays, packing a complex array ``z`` as a stacked
real array ``[Re z, Im z]`` along a new LEADING axis of size 2.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["to_reim", "from_reim", "to_reim_np", "from_reim_np"]


def to_reim(z):
    """Complex (..., ) -> real (2, ...). Use at the END of a jit."""
    return jnp.stack([jnp.real(z), jnp.imag(z)])


def from_reim(x):
    """Real (2, ...) -> complex (...). Use at the START of a jit."""
    return x[0] + 1j * x[1]


def to_reim_np(z: np.ndarray) -> np.ndarray:
    return np.stack([np.real(z), np.imag(z)]).astype(
        np.finfo(np.asarray(z).dtype).dtype)


def from_reim_np(x: np.ndarray) -> np.ndarray:
    return np.asarray(x)[0] + 1j * np.asarray(x)[1]
