"""Asynchronous end-of-epoch artifact writing.

Round-1 finding (docs/PERF.md "Sustained long-run"): per-epoch host work —
Orbax save, two ~80 MB weight exports, matplotlib grids — ran synchronously
on the single-core host and ate 60% of wall-clock (71 in-loop steps/s vs 28.6
sustained).  The reference pays the same cost pattern serially each epoch
(gan_train_cwgangp_pixelnorm.py:494-521).

TPU-native fix: the train loop only snapshots the state with a jitted
on-device copy (one cheap dispatch, no host transfer) and enqueues the writes;
a single worker thread does the device->host fetch, .npz/.h5 exports,
hist.csv, matplotlib and Orbax save while the device keeps training.  The
on-device copy is required for correctness, not just speed: the live state's
buffers are donated into the next fused step, so the worker must never read
them.

One worker thread serializes all matplotlib/pyplot use (pyplot is not
thread-safe across threads, safe within one).  Worker exceptions are captured
and re-raised on the next submit/flush so failures cannot pass silently.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Optional

import jax


# jitted identity: returns fresh device buffers (no input/output aliasing is
# requested, so XLA must materialize copies) — safe to read from the worker
# thread even after the original buffers are donated away
@jax.jit
def snapshot(tree):
    return jax.tree_util.tree_map(lambda x: x.copy(), tree)


class ArtifactWriter:
    """Single background worker draining a queue of artifact-writing jobs."""

    def __init__(self, name: str = "artifact-writer"):
        self._q: queue.Queue = queue.Queue()
        # every failed job is kept (two queued jobs can both fail before the
        # next submit/flush — e.g. an Orbax save then a matplotlib plot; the
        # first failure must not be masked by the second)
        self._errors: list[BaseException] = []
        self._thread = threading.Thread(target=self._run, name=name,
                                        daemon=True)
        self._thread.start()

    def _run(self):
        while True:
            job = self._q.get()
            try:
                if job is None:
                    return
                job()
            except BaseException as e:  # noqa: BLE001 — reported on flush
                self._errors.append(e)
            finally:
                self._q.task_done()

    def _check_error(self):
        if self._errors:
            errs, self._errors = self._errors, []
            msg = "; ".join(f"{type(e).__name__}: {e}" for e in errs)
            raise RuntimeError(
                f"{len(errs)} artifact writer job(s) failed: {msg}"
            ) from errs[0]

    def submit(self, job: Callable[[], None]) -> None:
        """Enqueue a no-arg callable.  Raises if a previous job failed."""
        self._check_error()
        if not self._thread.is_alive():
            raise RuntimeError("artifact writer already closed")
        self._q.put(job)

    def flush(self) -> None:
        """Block until every queued job has run; re-raise any job error."""
        self._q.join()
        self._check_error()

    def close(self) -> None:
        self.flush()
        self._q.put(None)
        self._thread.join()


class SyncWriter:
    """Drop-in synchronous fallback (async_artifacts=False)."""

    def submit(self, job: Callable[[], None]) -> None:
        job()

    def flush(self) -> None:
        pass

    def close(self) -> None:
        pass
