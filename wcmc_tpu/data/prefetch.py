"""Host -> device double-buffered batch prefetching.

The reference's data path blocks on a synchronous `.cuda()` copy per
batch (reference train_kpcn.py:45-50).  Here a background thread cuts
patches and issues `jax.device_put` for batch N+1 while the device
trains on batch N, so host IO and PCIe/tunnel transfer overlap compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator

import jax

_SENTINEL = object()


class DevicePrefetcher:
    """Wrap a host batch iterable; yields device-resident batches.

    ``depth`` is the number of batches kept in flight (2 = classic
    double buffering).  Exceptions from the source loader propagate to
    the consumer on the next `__next__`.
    """

    def __init__(self, loader: Iterable[dict], depth: int = 2,
                 sharding=None):
        self.loader = loader
        self.depth = depth
        self.sharding = sharding

    def __len__(self):
        return len(self.loader)

    def _put(self, batch: dict) -> dict:
        if self.sharding is not None:
            return {
                k: jax.device_put(v, self.sharding) for k, v in batch.items()
            }
        return {k: jax.device_put(v) for k, v in batch.items()}

    def __iter__(self) -> Iterator[dict]:
        q: queue.Queue = queue.Queue(maxsize=self.depth)

        def producer():
            try:
                for batch in self.loader:
                    q.put(self._put(batch))
            except BaseException as e:  # noqa: BLE001 — relayed to consumer
                q.put(e)
                return
            q.put(_SENTINEL)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _SENTINEL:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
        t.join()
