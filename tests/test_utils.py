"""Utility-module tests: reim boundary helpers, debug guards, timers."""

import jax.numpy as jnp
import numpy as np
import pytest

from bravais_tpu.utils.debug import assert_all_finite, nan_check
from bravais_tpu.utils.profiling import PhaseTimer, bench_op
from bravais_tpu.utils.reim import (from_reim, from_reim_np, to_reim,
                                    to_reim_np)


def test_reim_roundtrip():
    rng = np.random.default_rng(0)
    z = rng.standard_normal((3, 4)) + 1j * rng.standard_normal((3, 4))
    np.testing.assert_allclose(np.asarray(from_reim(to_reim(jnp.asarray(z)))),
                               z)
    np.testing.assert_allclose(from_reim_np(to_reim_np(z)), z)


def test_assert_all_finite():
    assert_all_finite({"a": jnp.ones(3)})
    with pytest.raises(FloatingPointError, match="non-finite"):
        assert_all_finite(jnp.asarray([1.0, np.nan]))


def test_nan_check_raises():
    def f(x):
        return jnp.log(x)  # NaN for negative input

    g = nan_check(f)
    assert float(g(jnp.asarray(2.0))) == pytest.approx(np.log(2.0))
    with pytest.raises(Exception):
        g(jnp.asarray(-1.0))


def test_phase_timer_and_bench():
    t = PhaseTimer()
    with t.phase("work", sync=False):
        sum(range(1000))
    rep = t.report()
    assert "work" in rep
    dt = bench_op(lambda x: x + 1, jnp.ones(8), iters=3, warmup=1)
    assert dt >= 0
