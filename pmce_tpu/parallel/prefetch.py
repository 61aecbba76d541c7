"""Double-buffered host→device prefetch.

The reference's train loop transfers each batch synchronously
(``.cuda()`` per step, /root/reference/lib/core/base.py:128-130). Here the
next batch's H2D transfer is issued while the current step computes: JAX
transfers are async, so simply staying one batch ahead overlaps DMA with
compute (the "multi-stream" requirement of the north star).
"""

from __future__ import annotations

import collections
from typing import Iterable, Iterator

import jax


def prefetch_to_device(iterator: Iterable, size: int = 2,
                       sharding=None) -> Iterator:
    """Yield device-resident batches, staying ``size`` batches ahead."""
    queue = collections.deque()

    def put(batch):
        if sharding is not None:
            # Multi-host safe: each process contributes only the rows its
            # devices own (parallel.distributed.put_global_batch); on a
            # single process this is a plain async device_put.
            from pmce_tpu.parallel.distributed import put_global_batch

            queue.append(put_global_batch(sharding, batch))
        else:
            queue.append(jax.tree_util.tree_map(jax.device_put, batch))

    it = iter(iterator)
    try:
        for _ in range(size):
            put(next(it))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            put(next(it))
        except StopIteration:
            pass
        yield out
