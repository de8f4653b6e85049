"""Host→device input prefetching.

Keeps N batches in flight: while the accelerator executes step t, a
producer THREAD is already collating and uploading batches t+1..t+N
(jax dispatch is thread-safe and async, so ``device_put`` overlaps with
compute and the host-side padding/stacking overlaps with the training
loop's blocking metric pulls).  This is the TPU-side replacement for
the reference's DataLoader worker processes
(msa_tts/dataloaders/dataloader_default.py:335-342), whose job was to
hide per-epoch STFT cost that our feature cache already eliminated.

Why a thread and not a synchronous pull-ahead: a deque that builds item
t+N inside the consumer's ``next()`` still runs the collate/stack on
the training thread — between the blocking ``float(loss)`` of step t-1
and the dispatch of step t, i.e. exactly while the device sits idle.
The thread moves that work off the critical path, and as a side effect
a preemption check never waits behind an episode build (the consumer
just stops pulling; the producer notices and exits).
"""

from __future__ import annotations

import queue as _queue
import threading
from typing import Iterable, Iterator

import jax

_SENTINEL = object()


def prefetch_to_device(iterable: Iterable, size: int = 2,
                       device=None, put=None,
                       threaded: bool = True) -> Iterator:
    """Yield items from ``iterable`` with up to ``size`` items built and
    pre-uploaded by a background thread.

    Items may be arbitrary pytrees of numpy arrays (Batch NamedTuples,
    dicts, ...).  ``put`` overrides the placement function (e.g. a
    sharding-aware device_put, or identity when the iterable already
    places its items).  ``threaded=False`` falls back to the synchronous
    pull-ahead (hides only the upload, not the host-side build — kept
    for debugging determinism).
    """
    if put is None:
        put = (
            (lambda x: jax.device_put(x, device))
            if device is not None
            else jax.device_put
        )
    it = iter(iterable)

    if not threaded or size <= 0:
        import collections

        dq = collections.deque()
        try:
            for _ in range(max(size, 1)):
                dq.append(put(next(it)))
        except StopIteration:
            pass
        while dq:
            out = dq.popleft()
            try:
                dq.append(put(next(it)))
            except StopIteration:
                pass
            yield out
        return

    q: _queue.Queue = _queue.Queue(maxsize=size)
    stop = threading.Event()
    err: list = []

    def _offer(item) -> bool:
        """Enqueue unless the consumer has gone away."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except _queue.Full:
                continue
        return False

    def producer():
        try:
            for raw in it:
                if stop.is_set():
                    return
                if not _offer(put(raw)):
                    return
        except BaseException as e:  # noqa: BLE001 — repropagated below
            err.append(e)
        finally:
            _offer(_SENTINEL)

    t = threading.Thread(
        target=producer, daemon=True, name="prefetch_to_device"
    )
    t.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()
