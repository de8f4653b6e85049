"""Episodic (meta-learning) dataloader: the unit of iteration is a
*speaker* (task), not an utterance.

Reference semantics (msa_tts/dataloaders/dataloader_meta.py:68-111,
254-318): per task draw up to ``batch_size`` random utterances from the
speaker's train pool (support) and test pool (query); a meta-batch is
``meta_batch_size`` speakers; nested-dict output
``{speaker: {"train": Batch, "test": Batch}}``.

TPU addition — :class:`TaskBatch`: the same episode stacked into fixed
``(n_tasks, shots, ...)`` arrays (one padded shape for the whole
dataset), which is what lets the meta-trainers ``vmap`` the inner loop
over tasks and shard the task axis across the device mesh instead of
looping speakers sequentially like the reference.
"""

from __future__ import annotations

import os
from typing import Iterator, NamedTuple

import numpy as np

from .collate import Batch, collate
from .dataset import TTSDataset
from .metafile import parse_metafile, split_speakers


class TaskBatch(NamedTuple):
    """A stacked episode: leading axis = task (speaker)."""

    inputs: np.ndarray          # (K, S, T_text) int32
    input_lengths: np.ndarray   # (K, S)
    mels: np.ndarray            # (K, S, n_mel, T_mel)
    mel_lengths: np.ndarray     # (K, S)
    speaker_ids: np.ndarray     # (K, S)
    spk_embs: np.ndarray        # (K, S, D)
    stop_labels: np.ndarray     # (K, S, T_mel)

    @property
    def n_tasks(self) -> int:
        return self.inputs.shape[0]

    def speaker_vecs(self, speaker_emb_type: str) -> np.ndarray:
        if speaker_emb_type == "learnable_lookup":
            return self.speaker_ids
        return self.spk_embs


def stack_batches(batches: list[Batch]) -> TaskBatch:
    """Stack equal-shape per-task batches along a new leading axis."""
    return TaskBatch(
        inputs=np.stack([b.inputs for b in batches]),
        input_lengths=np.stack([b.input_lengths for b in batches]),
        mels=np.stack([b.mels for b in batches]),
        mel_lengths=np.stack([b.mel_lengths for b in batches]),
        speaker_ids=np.stack([b.speaker_ids for b in batches]),
        spk_embs=np.stack([b.spk_embs for b in batches]),
        stop_labels=np.stack([b.stop_labels for b in batches]),
    )


class MetaDataLoader:
    """Yields meta-batches of per-speaker support/query episodes."""

    def __init__(
        self,
        dataset: TTSDataset,
        dataset_test: TTSDataset,
        *,
        shots: int,
        meta_batch_size: int,
        reduction_factor: int = 1,
        seed: int = 0,
        text_pad_to: int | None = None,
        mel_pad_to: int | None = None,
    ):
        self.ds_support = dataset
        self.ds_query = dataset_test
        self.shots = shots
        self.meta_batch_size = meta_batch_size
        self.reduction_factor = reduction_factor
        self.speakers = list(dataset.speaker_to_id.keys())
        self._rng = np.random.default_rng(seed)
        # Static shapes shared by every episode (needed for vmap).
        self.text_pad_to = text_pad_to or _round16(
            max(dataset.max_text_len(), dataset_test.max_text_len())
        )
        mel_max = max(dataset.max_mel_len(), dataset_test.max_mel_len())
        self.mel_pad_to = mel_pad_to or _round_mult(
            mel_max, max(16, reduction_factor)
        )

    def __len__(self) -> int:
        k = self.meta_batch_size
        return (len(self.speakers) + k - 1) // k

    def _episode(self, speaker: str) -> dict[str, Batch]:
        out = {}
        for mode, ds in (("train", self.ds_support), ("test", self.ds_query)):
            pool = ds.items_for_speaker(speaker)
            if not pool:
                # fail with the cause in hand — numpy's choice(0, ...)
                # error names neither the speaker nor the split
                raise ValueError(
                    f"speaker {speaker!r} has no items in its "
                    f"{mode!r} split: too few utterances survived the "
                    "duration budget / train-test split to build "
                    "episodes (each speaker needs at least one train "
                    "and one test item)"
                )
            n = min(len(pool), self.shots)
            sel = self._rng.choice(len(pool), size=n, replace=False)
            # repeat to keep the shot axis static when the pool is short
            if n < self.shots:
                extra = self._rng.choice(
                    len(pool), size=self.shots - n, replace=True
                )
                sel = np.concatenate([sel, extra])
            items = [pool[i] for i in sel]
            out[mode] = collate(
                items,
                reduction_factor=self.reduction_factor,
                text_pad_to=self.text_pad_to,
                mel_pad_to=self.mel_pad_to,
            )
        return out

    def skip_epoch(self) -> None:
        """Advance the sampling RNG by exactly one epoch's draws without
        building episodes — used by preemption resume to fast-forward a
        restored trainer to the interrupted epoch's data order."""
        order = self._rng.permutation(len(self.speakers))
        for i in order:
            spk = self.speakers[i]
            for ds in (self.ds_support, self.ds_query):
                pool_n = len(ds.items_for_speaker(spk))
                n = min(pool_n, self.shots)
                self._rng.choice(pool_n, size=n, replace=False)
                if n < self.shots:
                    self._rng.choice(
                        pool_n, size=self.shots - n, replace=True
                    )

    def __iter__(self) -> Iterator[dict[str, dict[str, Batch]]]:
        order = self._rng.permutation(len(self.speakers))
        for start in range(0, len(order), self.meta_batch_size):
            chunk = order[start : start + self.meta_batch_size]
            yield {
                self.speakers[i]: self._episode(self.speakers[i])
                for i in chunk
            }

    # ---------------------------------------------------------- stacked
    def iter_stacked(
        self,
    ) -> Iterator[tuple[list[str], TaskBatch, TaskBatch]]:
        """Yield ``(speakers, support, query)`` with fixed-shape stacked
        arrays — the vmap/pjit-ready episode format."""
        for meta_batch in self:
            speakers = list(meta_batch.keys())
            support = stack_batches(
                [meta_batch[s]["train"] for s in speakers]
            )
            query = stack_batches([meta_batch[s]["test"] for s in speakers])
            yield speakers, support, query


def _round16(n: int) -> int:
    return ((n + 15) // 16) * 16


def _round_mult(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def get_dataloader(phase_name: str, **params):
    """Build the episodic loader for ``dataset_<phase_name>``
    (reference: msa_tts/dataloaders/dataloader_meta.py:254)."""
    ds_data = params[f"dataset_{phase_name}"]
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
    ds_support = TTSDataset(splits, "train", **common)
    ds_query = TTSDataset(splits, "test", **common)
    loader = MetaDataLoader(
        ds_support,
        ds_query,
        shots=ds_data["batch_size"],
        meta_batch_size=params.get("meta_batch_size", 1),
        reduction_factor=params["model"]["n_frames_per_step"],
        seed=params.get("dataset_random_seed", 0),
    )
    return loader, logs
