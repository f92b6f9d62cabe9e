"""Async task offload: a single worker thread draining a (tqdm-instrumented) queue.

Capability parity with the reference ``wtracker/utils/threading_utils.py`` —
``adjust_num_workers`` heuristic (8-35), ``TqdmQueue`` (38-86) and
``TaskScheduler`` (88-150).  Used for non-blocking image/frame saving so disk
IO never stalls the simulation loop.
"""

from __future__ import annotations

import multiprocessing
import queue
import threading
from typing import Callable

from tqdm.auto import tqdm as _tqdm


def adjust_num_workers(num_tasks: int, chunk_size: int, num_workers: int | None = None) -> int:
    """Pick a sensible worker count for ``num_tasks`` split into ``chunk_size`` chunks.

    ``None`` auto-sizes to half the CPUs, bounded by the task count; explicit 0
    disables parallelism; the result never exceeds the CPU count or the number
    of chunks.
    """
    cpus = multiprocessing.cpu_count()
    if num_workers is None:
        num_workers = round(min(cpus / 2, num_tasks / (2 * chunk_size)))

    use_parallelism = num_workers > 0
    num_workers = min(num_workers, num_tasks // chunk_size, cpus)
    num_workers = max(num_workers, 0)

    if use_parallelism:
        num_workers = max(num_workers, 1)
    elif num_workers == 1:
        num_workers = 0
    return num_workers


class TqdmQueue(queue.Queue):
    """A ``queue.Queue`` that reports put/done progress through a tqdm bar."""

    def __init__(self, maxsize: int = 0, **kwargs):
        super().__init__(maxsize=maxsize)
        self.pbar = _tqdm(total=1, **kwargs)
        self.total = 0

    def task_done(self) -> None:
        super().task_done()
        self.pbar.update()
        self.pbar.refresh()

    def _put(self, item) -> None:
        super()._put(item)
        self.total += 1
        processed = self.pbar.n
        self.pbar.reset(self.total)
        self.pbar.update(processed)
        self.pbar.refresh()

    def join(self) -> None:
        super().join()
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
        self._queue: queue.Queue = TqdmQueue(maxsize, **tqdm_kwargs) if tqdm else queue.Queue(maxsize)
        self._worker_thread = threading.Thread(target=self._worker, args=(self._queue,), daemon=True)
        self._task_func = task_func
        self._errors: list[Exception] = []

    def start(self) -> None:
        self._worker_thread.start()

    def __enter__(self) -> "TaskScheduler":
        self.start()
        return self

    def __exit__(self, exc_type, exc_value, traceback) -> None:
        self.close()

    def schedule_save(self, *params) -> None:
        """Enqueue one work item (blocks when the queue is full)."""
        self._queue.put(item=params, block=True)

    def _worker(self, q: queue.Queue) -> None:
        while True:
            params = q.get(block=True)
            if params is None:
                break
            try:
                self._task_func(params)
            except Exception as e:  # keep draining; surface the error on close
                self._errors.append(e)
            finally:
                q.task_done()

    def close(self) -> None:
        """Drain the queue, stop the worker, join it; re-raise task errors."""
        self._queue.join()
        self._queue.put(None)
        self._worker_thread.join()
        if self._errors:
            raise RuntimeError(
                f"{len(self._errors)} task(s) failed; first error: {self._errors[0]!r}"
            ) from self._errors[0]
