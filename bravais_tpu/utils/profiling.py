"""Tracing / profiling utilities (SURVEY.md §5 "Tracing / profiling").

Rebuild equivalents of the reference's mfem::StopWatch phase timers and
hypre print levels: wall-clock phase timers with device synchronization,
op-level micro-benchmarks, and `jax.profiler` trace capture (Perfetto /
TensorBoard) around sweeps.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax

__all__ = ["PhaseTimer", "bench_op", "trace"]


class PhaseTimer:
    """Accumulating phase timer with device sync.

    with timer.phase("assemble"): ...
    print(timer.report())
    """

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync: bool = True):
        t0 = time.perf_counter()
        yield
        if sync:
            try:
                (jax.device_put(0.0) + 0).block_until_ready()
            except Exception:
                pass
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = ["phase                      total_s   calls   per_call_ms"]
        for name, tot in sorted(self.totals.items(), key=lambda x: -x[1]):
            c = self.counts[name]
            lines.append(f"{name:<25} {tot:9.3f} {c:7d} "
                         f"{1e3 * tot / c:12.3f}")
        return "\n".join(lines)


def bench_op(fn: Callable, *args, iters: int = 50, warmup: int = 2,
             name: str = "") -> float:
    """Median-ish wall time per call of a jitted function (seconds).
    The function must return at least one array (synced on)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    if name:
        print(f"{name:<30} {1e3 * dt:10.3f} ms")
    return dt


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax-trace"):
    """Capture a jax.profiler trace (view in Perfetto/TensorBoard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
