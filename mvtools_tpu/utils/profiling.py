"""Tracing / profiling harness (SURVEY.md §5: the reference has none; the
TPU build uses the JAX profiler plus per-stage block_until_ready timers).

Usage:
    with stage_timer("analyse") as t:
        mv = analyse(...)            # t blocks on the pytree at exit
    print(StageStats.summary())

    with trace("/tmp/jax-trace"):    # open in TensorBoard / xprof
        step(...)
"""

from __future__ import annotations

import collections
import contextlib
import time
from typing import Dict, List, Optional

import jax


class StageStats:
    """Process-global accumulation of per-stage wall times."""

    _times: Dict[str, List[float]] = collections.defaultdict(list)

    @classmethod
    def add(cls, name: str, seconds: float) -> None:
        cls._times[name].append(seconds)

    @classmethod
    def reset(cls) -> None:
        cls._times.clear()

    @classmethod
    def summary(cls) -> str:
        lines = []
        for name, ts in sorted(cls._times.items()):
            total = sum(ts)
            lines.append(f"{name}: n={len(ts)} total={total * 1e3:.1f}ms "
                         f"mean={total / len(ts) * 1e3:.2f}ms "
                         f"min={min(ts) * 1e3:.2f}ms "
                         f"max={max(ts) * 1e3:.2f}ms")
        return "\n".join(lines)


class _StageTimer:
    def __init__(self, name: str):
        self.name = name
        self.result = None
        self.elapsed = None

    def block_on(self, pytree):
        """Register the stage output; it is synchronized at context exit
        so async dispatch is charged to the right stage."""
        self.result = pytree
        return pytree


@contextlib.contextmanager
def stage_timer(name: str):
    t = _StageTimer(name)
    t0 = time.perf_counter()
    try:
        yield t
    finally:
        if t.result is not None:
            jax.block_until_ready(t.result)
        t.elapsed = time.perf_counter() - t0
        StageStats.add(name, t.elapsed)


@contextlib.contextmanager
def trace(log_dir: str, host_trace: bool = False):
    """JAX profiler trace around a region (xprof/TensorBoard format)."""
    jax.profiler.start_trace(log_dir,
                             create_perfetto_link=False,
                             create_perfetto_trace=host_trace)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
