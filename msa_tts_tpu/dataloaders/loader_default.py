"""Default (joint-training) dataloader.

``get_dataloader(**params)`` mirrors the reference entry point
(msa_tts/dataloaders/dataloader_default.py:266-357): parses the
metafile, applies duration budgeting and the train split, builds train
and test loaders, returns ``(train_loader, test_loader, log_string)``.
The loaders here yield ready-to-device :class:`Batch` numpy structs from
the precomputed feature cache.
"""

from __future__ import annotations

from typing import Iterator

import os

from .collate import Batch, collate
from .dataset import TTSDataset
from .metafile import parse_metafile, split_speakers
from .sampler import BinnedLengthSampler, SequentialSampler, ShuffleSampler


class DataLoader:
    """Minimal epoch iterator over a :class:`TTSDataset`."""

    def __init__(
        self,
        dataset: TTSDataset,
        *,
        batch_size: int,
        sampler=None,
        shuffle: bool = False,
        drop_last: bool = False,
        seed: int = 0,
        reduction_factor: int = 1,
        text_pad_multiple: int | None = 16,
        mel_pad_multiple: int | None = 32,
        use_soft_mel: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        if sampler is None:
            sampler = (
                ShuffleSampler(len(dataset), seed)
                if shuffle
                else SequentialSampler(len(dataset))
            )
        self.sampler = sampler
        self.drop_last = drop_last
        self.reduction_factor = reduction_factor
        self.text_pad_multiple = text_pad_multiple
        self.mel_pad_multiple = mel_pad_multiple
        self.use_soft_mel = use_soft_mel

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def skip_epoch(self) -> None:
        """Advance the (stateful) sampler by one epoch without loading
        data — preemption resume uses this to fast-forward the shuffle
        order to the interrupted epoch."""
        for _ in self.sampler:
            pass

    def __iter__(self) -> Iterator[Batch]:
        buf = []
        for idx in self.sampler:
            buf.append(self.dataset[int(idx)])
            if len(buf) == self.batch_size:
                yield self._make_batch(buf)
                buf = []
        if buf and not self.drop_last:
            yield self._make_batch(buf)

    def _make_batch(self, items) -> Batch:
        return collate(
            items,
            reduction_factor=self.reduction_factor,
            text_pad_multiple=self.text_pad_multiple,
            mel_pad_multiple=self.mel_pad_multiple,
            use_soft_mel=self.use_soft_mel,
        )


def build_datasets(**params) -> tuple[TTSDataset, TTSDataset, str]:
    """Parse the metafile and build train/test datasets (shared by the
    default and buffer loaders)."""
    ds_data = params["dataset_train"]
    metafile_path = os.path.join(
        ds_data["dataset_path"], ds_data["meta_file"]
    )
    utts = parse_metafile(metafile_path)
    splits, logs = split_speakers(
        utts,
        ds_data["speakers_list"],
        total_duration_per_spk=ds_data.get("total_duration_per_spk", -1),
        perc_train=ds_data.get("perc_train", 0.9),
        seed=params.get("dataset_random_seed", 0),
    )

    common = dict(
        dataset_path=ds_data["dataset_path"],
        audio_folder=ds_data.get("audio_folder", "wavs"),
        trim_margin_silence=ds_data.get("trim_margin_silence", False),
        ref_level_db=ds_data.get("ref_level_db", 26),
        audio_processor=params.get("audio_processor", "ap"),
        audio_params=params["audio_params"],
    )
    dataset_train = TTSDataset(splits, "train", **common)
    dataset_test = TTSDataset(splits, "test", **common)
    return dataset_train, dataset_test, logs


def get_dataloader(**params) -> tuple[DataLoader, DataLoader, str]:
    dataset_train, dataset_test, logs = build_datasets(**params)
    ds_cfg = params["dataset_train"]
    batch_size = ds_cfg["batch_size"]
    r = params["model"]["n_frames_per_step"]

    use_binned = ds_cfg.get("use_binned_sampler", False)
    if use_binned:
        sampler = BinnedLengthSampler(
            dataset_train.get_audio_durations(),
            batch_size,
            ds_cfg.get("bin_size", batch_size),
            seed=params.get("dataset_random_seed", 0),
        )
    else:
        sampler = None

    pad_opts = dict(
        text_pad_multiple=params.get("text_pad_multiple", 16),
        mel_pad_multiple=params.get("mel_pad_multiple", 32),
    )
    loader_train = DataLoader(
        dataset_train,
        batch_size=batch_size,
        sampler=sampler,
        shuffle=not use_binned,
        seed=params.get("dataset_random_seed", 0),
        reduction_factor=r,
        **pad_opts,
    )
    loader_test = DataLoader(
        dataset_test,
        batch_size=batch_size,
        shuffle=False,
        reduction_factor=r,
        **pad_opts,
    )
    return loader_train, loader_test, logs
