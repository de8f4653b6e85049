"""Buffer (knowledge-distillation) dataloader variant.

Reference: msa_tts/dataloaders/dataloader_default_buffer.py — identical
to the default loader except every item carries a mutable ``melspec``
slot; when set (by the ER-KD trainer at buffer-insertion time) it
replaces the ground-truth mel during batching (:93-96,139-144).

In this framework that capability lives directly on the cached
:class:`~msa_tts_tpu.dataloaders.dataset.Item` (the ``soft_mel`` field)
and in :func:`~msa_tts_tpu.dataloaders.collate.collate`'s
``use_soft_mel`` switch, so the "buffer loader" is the default loader —
this module provides the reference-named entry point.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .dataset import Item
from .loader_default import DataLoader, build_datasets, get_dataloader

__all__ = ["get_dataloader", "DataLoader", "set_soft_target", "build_datasets"]


def set_soft_target(item: Item, soft_mel: np.ndarray) -> Item:
    """Return a copy of ``item`` whose training target is ``soft_mel``
    (the reference mutates the metadata row in place; items here are
    shared across views, so we copy)."""
    return dataclasses.replace(
        item, soft_mel=np.asarray(soft_mel, np.float32)
    )
