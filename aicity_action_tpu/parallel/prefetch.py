"""Device prefetch: overlap host→device transfer with device compute.

The reference relies on ``pin_memory`` + ``non_blocking`` H2D copies
(`train_net.py:88-110`); the JAX equivalent is staging the NEXT batch onto
the devices while the current step runs. ``device_put`` is asynchronous, so
a one-element lookahead suffices — the transfer of batch i+1 rides under the
compute of batch i.
"""

from __future__ import annotations

from typing import Callable, Iterable, Iterator


def prefetch_to_device(
    iterator: Iterable,
    put_fn: Callable,
    lookahead: int = 2,
) -> Iterator:
    """Yield ``put_fn(item)`` with ``lookahead`` items staged ahead.

    ``put_fn`` should call ``jax.device_put`` (async); items are yielded in
    order. Also yields the ORIGINAL host item alongside for host-side
    bookkeeping: ``(host_item, device_item)``.
    """
    import collections

    queue = collections.deque()
    it = iter(iterator)
    try:
        for _ in range(lookahead):
            item = next(it)
            queue.append((item, put_fn(item)))
    except StopIteration:
        pass
    while queue:
        host_item, dev_item = queue.popleft()
        try:
            nxt = next(it)
            queue.append((nxt, put_fn(nxt)))
        except StopIteration:
            pass
        yield host_item, dev_item
