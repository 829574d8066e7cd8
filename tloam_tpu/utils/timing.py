"""Timers + profiling hooks.

Replaces the reference's 23-line chrono Timer (include/tloam/models/utils/
utils.hpp:16-40) and its ad-hoc per-frame wall-clock logs
(front_end.cpp:320-322), adding what a TPU build actually needs: stage
timers that block on device work, and jax.profiler trace capture.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class StageTimer:
    """Accumulating per-stage wall-clock timer (device-synchronized)."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        """Time a block. Yields a holder: assign the block's device output to
        ``holder.sync`` and the timer blocks on it before stopping the clock
        (JAX dispatch is async — without this only dispatch time is
        measured)."""

        class _Holder:
            sync = None

        holder = _Holder()
        t0 = time.perf_counter()
        yield holder
        if holder.sync is not None:
            jax.block_until_ready(holder.sync)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name:24s} {total:8.3f}s total  {total/n*1e3:8.2f} ms/call  x{n}")
        return "\n".join(lines)


@contextlib.contextmanager
def profile_trace(logdir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
