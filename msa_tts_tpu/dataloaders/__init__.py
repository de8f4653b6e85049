from .collate import Batch, collate
from .dataset import Item, TTSDataset
from .loader_default import DataLoader, build_datasets, get_dataloader
from .loader_meta import (
    MetaDataLoader,
    TaskBatch,
    get_dataloader as get_dataloader_meta,
    stack_batches,
)
from .metafile import parse_metafile, split_speakers
from .sampler import BinnedLengthSampler

__all__ = [
    "Batch",
    "collate",
    "Item",
    "TTSDataset",
    "DataLoader",
    "build_datasets",
    "get_dataloader",
    "MetaDataLoader",
    "TaskBatch",
    "get_dataloader_meta",
    "stack_batches",
    "parse_metafile",
    "split_speakers",
    "BinnedLengthSampler",
]
