"""Tracing / profiling utilities (SURVEY §5.1: the reference has only
perf_counter wall-clock and tqdm; here phase timing and device profiling
are first-class).

* ``PhaseTimer`` — hierarchical wall-clock phase accounting with a
  one-line report (the MC driver logs compile vs execute vs I/O).
* ``device_trace`` — context manager around ``jax.profiler`` writing a
  TensorBoard-loadable trace of the device timeline.
* ``block_and_time`` — time a jitted call properly (block_until_ready).
"""

from __future__ import annotations

import contextlib
import time
from collections import OrderedDict
from pathlib import Path


class PhaseTimer:
    """Accumulates named phase durations; re-entrant phases accumulate."""

    def __init__(self):
        self.phases: "OrderedDict[str, float]" = OrderedDict()
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.phases[name] = self.phases.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        total = sum(self.phases.values())
        lines = [f"total {total:.3f}s"]
        for name, dt in self.phases.items():
            lines.append(
                f"  {name}: {dt:.3f}s ({100 * dt / max(total, 1e-12):.1f}%, "
                f"n={self.counts[name]})"
            )
        return "\n".join(lines)

    def as_dict(self) -> dict:
        return dict(self.phases)


@contextlib.contextmanager
def device_trace(log_dir: str | Path):
    """Capture a device profile (TensorBoard trace) for the enclosed block."""
    import jax

    log_dir = str(log_dir)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def block_and_time(fn, *args, **kwargs):
    """Run ``fn`` and block on its outputs; returns (outputs, seconds)."""
    import jax

    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return out, time.perf_counter() - t0
