"""Profiling / tracing helpers (SURVEY.md §5 tracing row).

The reference has no profiling beyond tqdm bars; here:

* `trace(logdir)` — context manager around `jax.profiler` emitting a
  TensorBoard-loadable device trace of whatever runs inside it.
* `StepTimer` — robust steps/sec measurement.  On the tunneled TPU platform
  `block_until_ready` does not reliably wait, so the timer syncs by fetching
  a caller-provided scalar that depends on the computation.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(logdir: str = "/tmp/prdisagg_trace") -> Iterator[None]:
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Measure throughput of a chain of device steps.

    >>> timer = StepTimer()
    >>> timer.start()
    >>> for _ in range(n): state, metrics = step(state, ds)
    >>> sps = timer.stop(n, sync_scalar=metrics["d_loss"])
    """

    def __init__(self):
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, n_steps: int, sync_scalar=None) -> float:
        if sync_scalar is not None:
            float(sync_scalar)  # host fetch = hard sync
        dt = time.perf_counter() - self._t0
        return n_steps / dt
