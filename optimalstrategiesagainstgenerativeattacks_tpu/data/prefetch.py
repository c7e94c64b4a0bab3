"""Double-buffered host->device prefetch.

The reference feeds the device synchronously (``.to(device)`` per batch,
``gim_img_training.py:219-221``).  Here a background thread stages the
next ``depth`` batches onto the device (sharded over the mesh's data axis
when one is given) while the current step runs, hiding H2D latency behind
compute.  Batches stay uint8 until the jitted step normalises them.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import jax

from optimalstrategiesagainstgenerativeattacks_tpu.parallel.mesh import batch_sharding


def device_prefetch(iterator: Iterator, mesh=None, depth: int = 2) -> Iterator:
    """Wrap a host batch iterator with async device staging.

    ``depth <= 0`` disables the background thread and yields host batches
    directly (jit's own H2D transfer) — needed on backends where
    ``device_put`` from a secondary thread can contend with main-thread
    compilation.
    """
    sharding = batch_sharding(mesh) if mesh is not None else None

    def put(batch):
        if sharding is not None:
            return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
        return jax.tree.map(jax.device_put, batch)

    if depth <= 0:
        for batch in iterator:
            yield put(batch)
        return

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()
    err = []

    def producer():
        try:
            for batch in iterator:
                q.put(put(batch))
        except Exception as e:  # surface producer errors to the consumer
            err.append(e)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            if err:
                raise err[0]
            return
        yield item
