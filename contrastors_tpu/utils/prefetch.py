"""Host->device input pipeline: background tokenization + double-buffered
device_put.

The reference feeds the GPU from a single-threaded torch DataLoader
(num_workers=0, reference trainers/text_text.py:216 — a known bottleneck,
SURVEY.md §7 hard part 7). Here a daemon thread runs the (pure-Python)
dataset iterator and tokenizer while the TPU executes the previous step,
and batches are device_put ahead of time so the transfer overlaps compute.
"""

import queue
import threading
from typing import Callable, Iterator, Optional


class PrefetchIterator:
    def __init__(self, it: Iterator, transform: Optional[Callable] = None, depth: int = 2):
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._sentinel = object()
        self._err = None

        def worker():
            try:
                for item in it:
                    if transform is not None:
                        item = transform(item)
                    self._q.put(item)
            except BaseException as e:  # surfaces in the consumer
                self._err = e
            finally:
                self._q.put(self._sentinel)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._sentinel:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item
