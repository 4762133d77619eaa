"""Numerical-debugging utilities (SURVEY.md §5 "Race detection /
sanitizers"): the JAX-functional analogs of the reference's C++
sanitizers — NaN/Inf guards and checkify-wrapped kernels. Collectives
and reductions here are deterministic by construction, so the
sanitizer surface is numerical validity, not data races.
"""

from __future__ import annotations

import contextlib
from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["nan_check", "assert_all_finite", "debug_nans"]


def assert_all_finite(tree, name: str = "value"):
    """checkify-compatible finite assertion over a pytree (host-side
    eager use; inside jit use :func:`nan_check` on the function)."""
    import numpy as np
    for i, leaf in enumerate(jax.tree_util.tree_leaves(tree)):
        a = np.asarray(leaf)
        if not np.all(np.isfinite(a)):
            bad = int(np.sum(~np.isfinite(a)))
            raise FloatingPointError(
                f"{name}: leaf {i} has {bad} non-finite entries "
                f"(shape {a.shape})")


def nan_check(fn: Callable) -> Callable:
    """Wrap a jittable function with jax.experimental.checkify NaN/Inf
    error tracking. Returns a function with the same signature that
    RAISES on non-finite intermediates when executed."""
    from jax.experimental import checkify

    checked = checkify.checkify(fn, errors=checkify.float_checks)

    def wrapped(*args, **kwargs):
        err, out = checked(*args, **kwargs)
        err.throw()
        return out

    return wrapped


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Context manager toggling jax_debug_nans (eager NaN tracebacks)."""
    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)
