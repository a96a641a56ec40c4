"""Profiling / tracing utilities (SURVEY.md §5: the reference has only a
wall-clock + thop harness; TPU-native equivalent is `jax.profiler` with
Perfetto/XPlane traces plus the `weight_test.py` throughput harness)."""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(logdir: str = "/tmp/mmu_trace"):
    """Capture a device trace viewable in Perfetto / TensorBoard:

        with trace("/tmp/mmu_trace"):
            state, scalars, _ = train_step(...)
            jax.block_until_ready(scalars["total_loss"])
    """
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Running average step timer with device synchronisation via a scalar
    fetch (plain `block_until_ready` does not drain remote-tunnel queues)."""

    def __init__(self):
        self.times: list[float] = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, sync_scalar=None) -> float:
        if sync_scalar is not None:
            float(sync_scalar)
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)


def device_memory_report() -> str:
    """Human-readable live-buffer summary per device."""
    import jax

    lines = []
    for d in jax.devices():
        try:
            stats = d.memory_stats()
            used = stats.get("bytes_in_use", 0) / 1e9
            limit = stats.get("bytes_limit", 0) / 1e9
            lines.append(f"{d}: {used:.2f} / {limit:.2f} GB in use")
        except Exception:
            lines.append(f"{d}: memory stats unavailable")
    return "\n".join(lines)
