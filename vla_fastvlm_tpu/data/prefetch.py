"""Device prefetching: overlap host->device transfer with device compute.

The reference moves each batch to the device synchronously inside the step
loop (``move_batch_to_device``, reference ``trainer.py:172``). On TPU the
transfer can ride ahead of compute: ``device_prefetch`` wraps a host batch
iterator and keeps ``size`` batches already placed on device (or sharded
over a mesh), so the jitted step never waits on PCIe/host memory. Transfers
are issued by ``jax.device_put`` (async on TPU backends) while the previous
step's computation is still in flight.
"""

from __future__ import annotations

import collections
from typing import Any, Callable, Dict, Iterable, Iterator, Optional

import jax


def device_prefetch(
    iterator: Iterable[Dict[str, Any]],
    size: int = 2,
    placer: Optional[Callable[[Dict[str, Any]], Dict[str, Any]]] = None,
) -> Iterator[Dict[str, Any]]:
    """Yield batches with up to ``size`` already submitted to the device.

    ``placer`` maps a host batch to device arrays — ``jax.device_put`` by
    default; pass ``lambda b: shard_batch(mesh, b)`` for mesh placement.
    Non-array entries (task strings, metadata) pass through untouched.
    """
    if size < 1:
        raise ValueError(f"prefetch size must be >= 1, got {size}")

    if placer is None:
        def placer(batch):
            return {
                key: jax.device_put(value) if hasattr(value, "shape") else value
                for key, value in batch.items()
            }

    queue: collections.deque = collections.deque()
    it = iter(iterator)

    def fill():
        while len(queue) < size:
            try:
                batch = next(it)
            except StopIteration:
                return
            queue.append(placer(batch))

    fill()
    while queue:
        yield queue.popleft()
        fill()
