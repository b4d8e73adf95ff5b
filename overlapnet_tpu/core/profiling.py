"""Tracing and step-timing hooks.

The reference has no profiling of any kind (only keras ``verbose=1`` progress
bars, reference infer.py:156, testing.py:263). Here: a ``jax.profiler`` trace
context that produces TensorBoard-loadable device traces, plus a lightweight
step timer that accumulates wall time and derives throughput counters — the
north-star pairs/s metric — without forcing a device sync on every step.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field


@contextlib.contextmanager
def trace(out_dir: str | None):
    """Capture a jax.profiler device trace into ``out_dir`` (no-op if falsy).

    View with TensorBoard's profile plugin or Perfetto (trace.json.gz under
    ``out_dir/plugins/profile/...``).
    """
    if not out_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class StepTimer:
    """Accumulate per-step wall times and derive items/s.

    Async-dispatch aware: ``stop`` optionally blocks on a result so the
    measured interval covers device execution, but only when ``sync`` is
    passed (the train loop syncs once per epoch via the loss fetch, so
    per-step overhead stays near zero).
    """

    steps: int = 0
    items: int = 0
    total_s: float = 0.0
    _t0: float = field(default=0.0, repr=False)

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, items: int = 0, sync=None) -> float:
        if sync is not None:
            import jax

            jax.block_until_ready(sync)
        dt = time.perf_counter() - self._t0
        self.steps += 1
        self.items += items
        self.total_s += dt
        return dt

    @property
    def items_per_sec(self) -> float:
        return self.items / self.total_s if self.total_s > 0 else 0.0

    @property
    def sec_per_step(self) -> float:
        return self.total_s / self.steps if self.steps else 0.0

    def summary(self, prefix: str = "") -> dict:
        p = f"{prefix}_" if prefix else ""
        return {
            f"{p}steps": self.steps,
            f"{p}sec_per_step": self.sec_per_step,
            f"{p}items_per_sec": self.items_per_sec,
        }
