"""Host->device transfer pipelining.

The loader's prefetch pool overlaps DECODE/assembly with device execution,
but the host->device transfer itself (shard_batch / device_put of the
assembled batch) still sat on the critical path between steps: the train
loop called it inline, so every iteration paid the full transfer latency
(painful on remotely-attached chips, where a batch put costs a network
round trip; the reference never sees this because torch's DataLoader
pin_memory + cudaMemcpyAsync overlaps it for free).

`device_prefetch` restores that overlap: a background thread pulls items
from the loader and PLACES them (device_put with the step's shardings)
ahead of consumption, keeping `depth` placed batches in flight. JAX
dispatch is thread-safe; transfers issued by the worker overlap the main
thread's running step.

Multi-host note: callers must NOT route `shard_batch`'s
host_local_array_to_global_array path through here -- cross-process
assembly has collective ordering requirements and belongs on the main
thread, in lockstep with the other collectives (checkpoint save, eval
gather). Gate on jax.process_count() == 1.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, TypeVar

T = TypeVar("T")
U = TypeVar("U")

_END = object()


def device_prefetch(
    iterator: Iterable[T], place: Callable[[T], U], depth: int = 2
) -> Iterator[U]:
    """Yield place(item) for item in iterator, placing ahead of consumption.

    `place` runs on a background thread; exceptions it (or the iterator)
    raises re-raise at the consumer's next pull. Closing the generator stops
    the worker promptly (it never blocks forever on a full queue).
    """
    q: queue.Queue = queue.Queue(maxsize=max(1, depth))
    stop = threading.Event()
    err: list = []

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in iterator:
                if stop.is_set() or not _put(place(item)):
                    return
        except BaseException as e:  # surfaced to the consumer
            err.append(e)
        finally:
            _put(_END)

    th = threading.Thread(target=worker, daemon=True, name="device-prefetch")
    th.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()
