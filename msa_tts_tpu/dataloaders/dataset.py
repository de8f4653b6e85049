"""In-memory TTS dataset with a precomputed feature cache.

TPU-first redesign of the reference's data path: the reference loads
audio and computes the STFT+mel *inside the collate function on every
epoch* (msa_tts/dataloaders/dataloader_default.py:137); here every
utterance's log-mel and phoneme-id sequence are computed once at
construction and cached as numpy arrays, so steady-state batching is
pure padding + stacking and the accelerator never waits on the host
doing DSP.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from ..ops import audio as A
from ..utils.g2p import Grapheme2Phoneme
from .metafile import (
    SpeakerSplit,
    Utterance,
    load_speaker_embeddings,
    resolve_audio_path,
)


@dataclass
class Item:
    item_id: str
    speaker: str
    speaker_id: int
    phonemes: np.ndarray      # (T_text,) int32
    mel: np.ndarray           # (n_mel, T_mel) float32 log-mel
    duration: float
    spk_emb: np.ndarray       # (D,) float32 d-vector
    # ER-KD replay slot: when set, this (soft) mel replaces the ground
    # truth during batching (reference dataloader_default_buffer.py:93-96).
    soft_mel: np.ndarray | None = None
    # source audio path (kept for consumers that need waveforms, e.g.
    # vocoder training; the acoustic model only uses the cached mel)
    audio_path: str | None = None
    # silence-trim slice (start, end) into the loaded waveform that
    # produced ``mel``; consumers pairing the mel with the waveform
    # (vocoder training) must apply it or frame 0 of the mel and sample
    # 0 of the audio are misaligned by the trim offset.  None = untrimmed.
    trim: tuple | None = None

    @property
    def mel_for_training(self) -> np.ndarray:
        return self.soft_mel if self.soft_mel is not None else self.mel


def compute_logmel(
    wav: np.ndarray, audio_processor: str, audio_params: dict
) -> np.ndarray:
    if audio_processor == "ap":
        _, _, log_mel = A.melspec_ap(wav, audio_params, xp=np)
    elif audio_processor == "ap2":
        _, _, log_mel = A.melspec_ap2(wav[None, :], audio_params, xp=np)
        log_mel = log_mel[0]
    else:
        raise ValueError(f"unknown audio_processor: {audio_processor}")
    return np.asarray(log_mel, dtype=np.float32)


class TTSDataset:
    """Loads one split ("train"/"test") of a speaker dict into RAM.

    Speaker-id assignment follows the reference (enumeration order of
    the speakers dict — dataloader_default.py:49-51).
    """

    def __init__(
        self,
        splits: dict[str, SpeakerSplit],
        mode: str,
        *,
        dataset_path: str,
        audio_folder: str = "wavs",
        trim_margin_silence: bool = False,
        ref_level_db: float = 26,
        audio_processor: str = "ap",
        audio_params: dict,
        g2p: Grapheme2Phoneme | None = None,
        spk_emb_dict: dict | None = None,
        use_native_feats: bool = True,
        feats_threads: int | None = None,
    ):
        self.mode = mode
        self.audio_processor = audio_processor
        self.audio_params = audio_params
        g2p = g2p or Grapheme2Phoneme()
        if spk_emb_dict is None:
            spk_emb_dict = load_speaker_embeddings(dataset_path)

        self.speaker_to_id = {s: i for i, s in enumerate(splits.keys())}
        self.id_to_speaker = {i: s for s, i in self.speaker_to_id.items()}

        sr = audio_params["sample_rate"]
        self.items: list[Item] = []
        wavs: list[np.ndarray] = []
        for speaker, split in splits.items():
            utts: list[Utterance] = getattr(split, mode)
            for itr, u in enumerate(utts):
                seq, _ = g2p.convert(u.phonemes, convert_mode="phone_to_idx")
                path = resolve_audio_path(
                    dataset_path, audio_folder, speaker, u.filename,
                    len(splits),
                )
                wavs.append(A.load_wav(path, target_sample_rate=sr))
                self.items.append(
                    Item(
                        item_id=f"{speaker}_{itr}",
                        speaker=speaker,
                        speaker_id=self.speaker_to_id[speaker],
                        phonemes=np.asarray(seq, dtype=np.int32),
                        mel=None,  # filled below
                        duration=u.duration,
                        spk_emb=spk_emb_dict[speaker],
                        audio_path=path,
                    )
                )

        # Feature extraction: the native C++ thread pool (trim + STFT +
        # mel + log in one batched call, see native/feats.cpp) when the
        # toolchain permits, else the identical numpy path per item.
        native_out = None
        if use_native_feats:
            from ..native import extract_logmels_batch

            native_out = extract_logmels_batch(
                wavs, audio_processor, audio_params,
                trim_margin_silence=trim_margin_silence,
                ref_level_db=ref_level_db, n_threads=feats_threads,
            )
        if native_out is not None:
            for item, mel, sl in zip(self.items, *native_out):
                item.mel = mel
                if trim_margin_silence:
                    item.trim = (int(sl[0]), int(sl[1]))
        else:
            for item, wav in zip(self.items, wavs):
                if trim_margin_silence:
                    s, e = A.trim_margin_silence_slice(
                        wav, ref_level_db=ref_level_db
                    )
                    item.trim = (s, e)
                    wav = wav[s:e]
                item.mel = compute_logmel(
                    wav, audio_processor, audio_params
                )

    def __len__(self) -> int:
        return len(self.items)

    def __getitem__(self, idx: int) -> Item:
        return self.items[idx]

    def get_audio_durations(self) -> list[float]:
        return [it.duration for it in self.items]

    def items_for_speaker(self, speaker: str) -> list[Item]:
        # indexed once: the meta loader queries this per speaker per
        # episode (and per fast-forwarded resume epoch) — a full corpus
        # scan each time is O(speakers × items) of host stall
        if not hasattr(self, "_by_speaker"):
            by: dict[str, list[Item]] = {}
            for it in self.items:
                by.setdefault(it.speaker, []).append(it)
            self._by_speaker = by
        return self._by_speaker.get(speaker, [])

    def max_text_len(self) -> int:
        return max(len(it.phonemes) for it in self.items)

    def max_mel_len(self) -> int:
        return max(it.mel.shape[1] for it in self.items)
