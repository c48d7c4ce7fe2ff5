"""Background-thread batch prefetching.

The host data path (wav/FLAC decode, log-mel, collation) runs in a worker
thread while the device executes the previous step, hiding data latency the
way fairseq's --num-workers dataloader does for the reference.  Exceptions
propagate to the consumer."""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator


def prefetch(it: Iterable, depth: int = 2) -> Iterator:
    """Run ``it`` in a daemon thread, buffering up to ``depth`` items."""
    q: queue.Queue = queue.Queue(maxsize=max(depth, 1))
    END = object()

    def worker():
        try:
            for item in it:
                q.put(item)
            q.put(END)
        except BaseException as e:  # forward to the consumer
            q.put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is END:
            break
        if isinstance(item, BaseException):
            raise item
        yield item
