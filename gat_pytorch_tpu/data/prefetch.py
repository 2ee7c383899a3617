"""Host-side prefetch: overlap batch preparation/transfer with compute.

The reference's only concurrency is DataLoader worker processes
(`num_workers=os.cpu_count(), pin_memory=True` behind fast_dataloading,
reference: models/GATModel.py:16,273-284). The TPU-native analog: a
background thread that stays `depth` batches ahead, building each Graph
(sampling/batching are host numpy) and issuing `jax.device_put` so the
H2D transfer overlaps the device's work on the previous batch.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional, Sequence

import jax

from ..graph.graph import Graph


class PrefetchIterator:
    """Iterate Graphs with a background device-feed thread.

    src: an iterable of Graphs (or a callable returning one, for epoch
    re-batching). Exceptions in the worker propagate to the consumer.

    put=False skips the device_put — for items the producer already
    placed with their own shardings (Trainer.fit_sharded's epoch groups
    carry NamedShardings; a bare device_put would re-commit them to the
    default device). The thread then only overlaps the host-side BUILD
    work (batching/partitioning/stacking) with device compute.
    """

    _SENTINEL = object()

    def __init__(self, src: Iterable[Graph], depth: int = 2,
                 device: Optional[jax.Device] = None, put: bool = True):
        self._q: "queue.Queue" = queue.Queue(maxsize=max(depth, 1))
        self._device = device
        self._put = put
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(
            target=self._worker, args=(iter(src),), daemon=True)
        self._thread.start()

    def _worker(self, it: Iterator[Graph]) -> None:
        try:
            for g in it:
                if not self._put:
                    pass
                elif self._device is not None:
                    g = jax.device_put(g, self._device)
                else:
                    g = jax.device_put(g)
                self._q.put(g)
        except BaseException as exc:  # noqa: BLE001 — reraised in consumer
            self._err = exc
        finally:
            self._q.put(self._SENTINEL)

    def __iter__(self):
        return self

    def __next__(self) -> Graph:
        item = self._q.get()
        if item is self._SENTINEL:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


def prefetch_epochs(make_epoch: Callable[[int], Sequence[Graph]],
                    num_epochs: int, depth: int = 2
                    ) -> Iterator[Iterator[Graph]]:
    """Per-epoch prefetched streams: epoch i+1's first batches are built
    and transferred while epoch i still trains."""
    for epoch in range(num_epochs):
        yield PrefetchIterator(make_epoch(epoch), depth=depth)
