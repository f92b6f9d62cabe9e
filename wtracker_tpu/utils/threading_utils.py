"""Async task offload: a single worker thread draining a progress-tracked queue.

Capability parity with the reference ``wtracker/utils/threading_utils.py`` —
the ``adjust_num_workers`` sizing heuristic (8-35), a tqdm-instrumented queue
(38-86), and the queue+worker scheduler (88-150). Used for non-blocking
image/frame saving so disk IO never stalls the simulation loop.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Callable

from tqdm.auto import tqdm as _tqdm


def adjust_num_workers(num_tasks: int, chunk_size: int, num_workers: int | None = None) -> int:
    """Pick a worker count for ``num_tasks`` split into ``chunk_size`` chunks.

    Matches the reference heuristic (threading_utils.py:8-35): ``None``
    auto-sizes to ``round(min(cpus/2, tasks/(2*chunk)))``; any request > 0 is
    honored with at least one worker; a request <= 0 (or an auto-size of 0)
    disables parallelism. The result never exceeds the CPU count or the number
    of full chunks.
    """
    cpus = os.cpu_count() or 1
    requested = num_workers if num_workers is not None else round(min(cpus / 2, num_tasks / (2 * chunk_size)))
    if requested <= 0:
        return 0
    return max(1, min(requested, num_tasks // chunk_size, cpus))


class TqdmQueue(queue.Queue):
    """A ``queue.Queue`` whose put/done activity drives a live tqdm bar.

    The bar's total grows as items are enqueued and its position advances as
    ``task_done()`` is called, so it shows "completed / scheduled so far"
    rather than a fixed-size countdown. ``join()`` closes the bar.
    """

    def __init__(self, maxsize: int = 0, **tqdm_kwargs):
        super().__init__(maxsize=maxsize)
        self.total = 0
        self.pbar = _tqdm(total=1, **tqdm_kwargs)

    def _repaint(self) -> None:
        self.pbar.total = self.total
        self.pbar.refresh()

    def _put(self, item) -> None:
        # Called under the queue's internal mutex — safe to bump the total.
        super()._put(item)
        self.total += 1
        self._repaint()

    def task_done(self) -> None:
        super().task_done()
        self.pbar.update(1)
        self._repaint()

    def join(self) -> None:
        queue.Queue.join(self)
        self.pbar.close()


class TaskScheduler:
    """Run ``task_func`` on queued work items in a dedicated worker thread.

    Shutdown protocol: ``close()`` joins the queue, then posts a ``None``
    sentinel and joins the thread — guaranteeing every scheduled task completes
    before the scheduler returns.

    Robustness (deviation from the reference, threading_utils.py:133-141): a
    task exception is recorded and re-raised from ``close()`` instead of
    silently killing the worker — whose death would deadlock ``queue.join()``.
    """

    def __init__(
        self,
        task_func: Callable,
        maxsize: int = 0,
        tqdm: bool = True,
        **tqdm_kwargs,
    ):
        self._task_func = task_func
        self._errors: list[Exception] = []
        if tqdm:
            self._queue: queue.Queue = TqdmQueue(maxsize, **tqdm_kwargs)
        else:
            self._queue = queue.Queue(maxsize)
        self._worker_thread = threading.Thread(target=self._drain, daemon=True, name="wtracker-io-worker")

    # -- lifecycle ---------------------------------------------------------

    def start(self) -> None:
        self._worker_thread.start()

    def __enter__(self) -> "TaskScheduler":
        self.start()
        return self

    def __exit__(self, *exc_info) -> None:
        self.close()

    def close(self) -> None:
        """Drain the queue, stop the worker, join it; re-raise task errors."""
        self._queue.join()
        self._queue.put(None)
        self._worker_thread.join()
        if self._errors:
            raise RuntimeError(
                f"{len(self._errors)} task(s) failed; first error: {self._errors[0]!r}"
            ) from self._errors[0]

    # -- work submission / execution ----------------------------------------

    def schedule_save(self, *params) -> None:
        """Enqueue one work item (blocks while the queue is full)."""
        self._queue.put(params, block=True)

    def _drain(self) -> None:
        # Iterate until the None shutdown sentinel arrives.
        for work in iter(self._queue.get, None):
            try:
                self._task_func(work)
            except Exception as e:  # keep draining; surface the error on close
                self._errors.append(e)
            finally:
                self._queue.task_done()
