"""Background-thread batch prefetch.

The reference overlaps host batch prep with device compute through
DataLoader worker processes (/root/reference/train_diffcloth.py:159-162,
``num_workers=6``). The JAX equivalent needs no processes: device dispatch
is asynchronous, so ONE daemon thread preparing the next batch while the
main thread blocks on the device hides the whole host side of the step
(numpy releases the GIL for the array ops that dominate batch prep). On
single-core TPU VMs more workers would only add contention.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, TypeVar

T = TypeVar("T")

_DONE = object()


class _Raised:
    def __init__(self, exc: BaseException):
        self.exc = exc


def prefetch_iterator(it: Iterator[T], depth: int = 2) -> Iterator[T]:
    """Yield items of `it` through a `depth`-deep background queue.

    Items arrive in order and exceptions raised by the producer re-raise at
    the consumer's `next()` call. The worker is a daemon thread: abandoning
    the returned iterator mid-stream (the training loops run forever and are
    torn down by process exit) leaves it parked on a full queue, which is
    harmless and costs nothing.
    """
    if depth < 1:
        raise ValueError(f"prefetch depth must be >= 1, got {depth}")
    q: queue.Queue = queue.Queue(maxsize=depth)

    def worker():
        try:
            for item in it:
                q.put(item)
            q.put(_DONE)
        except BaseException as e:  # noqa: BLE001 — relayed to the consumer
            q.put(_Raised(e))

    threading.Thread(target=worker, daemon=True, name="batch-prefetch").start()

    def gen():
        while True:
            item = q.get()
            if item is _DONE:
                return
            if isinstance(item, _Raised):
                raise item.exc
            yield item

    return gen()
