"""Async host→device prefetching — keep the TPU fed (SURVEY.md hard part #6).

The reference's DataLoader workers only parallelize decode; the device copy
still serializes with the train step. Here a background thread runs the host
pipeline (decode → transform → collate) AND issues the device_put with the
right sharding, so step N+1's batch is resident in HBM while step N computes
— the standard double-buffered input pipeline.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Iterable, Iterator, Optional

import jax

from videotuna_tpu.parallel.sharding import shard_batch


class DevicePrefetcher:
    """Wrap a host batch iterable; yields device-resident batches.

    ``depth`` buffers are in flight (2 = classic double buffering). Errors in
    the worker propagate to the consumer on the next __next__.
    """

    def __init__(self, loader: Iterable, mesh=None, depth: int = 2,
                 prepare=None):
        self.loader = loader
        self.mesh = mesh
        self.depth = depth
        self.prepare = prepare            # optional host-side batch hook

    def __iter__(self) -> Iterator[Any]:
        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        sentinel = object()

        def worker():
            try:
                for batch in self.loader:
                    if self.prepare is not None:
                        batch = self.prepare(batch)
                    if self.mesh is not None:
                        batch = shard_batch(batch, self.mesh)
                    else:
                        batch = jax.tree.map(
                            lambda x: jax.device_put(x)
                            if hasattr(x, "shape") else x, batch)
                    q.put(batch)
                q.put(sentinel)
            except BaseException as e:  # noqa: BLE001 — forward to consumer
                q.put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
