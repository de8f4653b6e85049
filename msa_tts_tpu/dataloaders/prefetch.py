"""Host→device input prefetching.

Keeps N batches in flight: while the accelerator executes step t, the
host is already collating and uploading batch t+1 (jax dispatch is
async, so ``device_put`` overlaps with compute).  This hides the
host-side padding/stacking and the PCIe/tunnel upload behind the step —
the TPU-side replacement for the reference's DataLoader worker processes
(msa_tts/dataloaders/dataloader_default.py:335-342), whose job was to
hide per-epoch STFT cost that our feature cache already eliminated.
"""

from __future__ import annotations

import collections
from typing import Iterable, Iterator

import jax


def prefetch_to_device(iterable: Iterable, size: int = 2,
                       device=None, put=None) -> Iterator:
    """Yield items from ``iterable`` with ``size`` items pre-uploaded.

    Items may be arbitrary pytrees of numpy arrays (Batch NamedTuples,
    dicts, ...).  With ``size=1`` this degrades to plain device_put.
    ``put`` overrides the placement function (e.g. a sharding-aware
    device_put, or identity when the iterable already places its items
    and only the pull-ahead is wanted).
    """
    queue = collections.deque()
    if put is None:
        put = (
            (lambda x: jax.device_put(x, device))
            if device is not None
            else jax.device_put
        )
    it = iter(iterable)
    try:
        for _ in range(size):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield out
