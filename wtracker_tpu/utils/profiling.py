"""Profiling & timing instrumentation.

The reference has no tracing at all (SURVEY.md §5 — tqdm progress bars only).
This module provides the TPU-native equivalents: a ``jax.profiler`` trace
context for device timelines, and a lightweight stage timer for host-side
phase breakdowns (with correct device synchronization when timing jax work).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a ``jax.profiler`` trace (open with TensorBoard / Perfetto)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class StageTimer:
    """Accumulates wall-time per named stage; jax results are synchronized.

    Usage::

        timer = StageTimer()
        with timer("detect"):
            out = detect(frames)
        ...
        print(timer.report())
    """

    sync: bool = True
    totals: dict[str, float] = field(default_factory=dict)
    counts: dict[str, int] = field(default_factory=dict)

    @contextlib.contextmanager
    def __call__(self, stage: str):
        start = time.perf_counter()
        try:
            yield
        finally:
            if self.sync:
                import jax

                # wait for everything dispatched inside the block
                (jax.device_put(0.0) + 0).block_until_ready()
            dt = time.perf_counter() - start
            self.totals[stage] = self.totals.get(stage, 0.0) + dt
            self.counts[stage] = self.counts.get(stage, 0) + 1

    def report(self) -> str:
        lines = []
        total = sum(self.totals.values())
        for stage, t in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[stage]
            lines.append(
                f"{stage:24s} {t * 1e3:9.1f} ms  ({n}x, {t / n * 1e3:7.2f} ms/call, {t / total * 100:4.1f}%)"
            )
        return "\n".join(lines)

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()
