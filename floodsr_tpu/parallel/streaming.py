"""Double-buffered host→device streaming.

The SURVEY build plan calls for "double-buffered host→HBM tile streaming"
(SURVEY.md §7 item 3) in place of the reference's synchronous per-tile feed.
``jax.device_put`` is asynchronous, so overlap falls out of dispatch order:
enqueue the NEXT batch's transfer before blocking on the current batch's
results. :func:`prefetch_to_device` packages that pattern for any iterator of
host batches (pytrees of numpy arrays).
"""

from __future__ import annotations

from collections import deque
from collections.abc import Iterable, Iterator
from typing import Any

import jax


def prefetch_to_device(
    batches: Iterable[Any],
    *,
    buffer_size: int = 2,
    sharding=None,
) -> Iterator[Any]:
    """Yield device-resident batches, keeping ``buffer_size`` transfers in flight.

    ``batches`` yields pytrees of host arrays; each is ``jax.device_put`` (with
    the optional sharding) ahead of consumption so the host→device transfer of
    batch ``k+1`` overlaps the compute consuming batch ``k``.
    """
    assert buffer_size >= 1, f"buffer_size must be >= 1; got {buffer_size}"
    queue: deque[Any] = deque()
    iterator = iter(batches)

    def put(batch: Any) -> Any:
        if sharding is not None:
            return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
        return jax.tree.map(jax.device_put, batch)

    try:
        for _ in range(buffer_size):
            queue.append(put(next(iterator)))
    except StopIteration:
        pass

    while queue:
        ready = queue.popleft()
        try:
            queue.append(put(next(iterator)))
        except StopIteration:
            pass
        yield ready
