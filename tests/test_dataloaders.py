"""Data-layer tests on a synthetic corpus (no real dataset needed)."""

import numpy as np
import pytest

from msa_tts_tpu.dataloaders import (
    Batch,
    get_dataloader,
    get_dataloader_meta,
    parse_metafile,
    split_speakers,
)
from msa_tts_tpu.dataloaders.synthetic import (
    make_synthetic_corpus,
    synthetic_params,
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("corpus"))
    make_synthetic_corpus(
        root, n_speakers=3, utterances_per_speaker=6, seed=0
    )
    return root


@pytest.fixture(scope="module")
def params(corpus):
    return synthetic_params(corpus, n_speakers=3, batch_size=2)


def test_metafile_roundtrip(corpus):
    utts = parse_metafile(corpus + "/metadata.csv")
    assert len(utts) == 18
    assert {u.speaker for u in utts} == {"spk00", "spk01", "spk02"}
    assert all(u.duration > 0 for u in utts)


def test_split_semantics(corpus):
    utts = parse_metafile(corpus + "/metadata.csv")
    splits, logs = split_speakers(
        utts, ["spk00", "spk01"], perc_train=0.8, seed=0
    )
    assert set(splits.keys()) == {"spk00", "spk01"}
    for sp in splits.values():
        assert len(sp.test) >= 2
        assert len(sp.train) + len(sp.test) == 6
    # deterministic given the seed
    splits2, _ = split_speakers(
        utts, ["spk00", "spk01"], perc_train=0.8, seed=0
    )
    assert [u.filename for u in splits2["spk00"].train] == [
        u.filename for u in splits["spk00"].train
    ]
    # different seed → different order
    splits3, _ = split_speakers(
        utts, ["spk00", "spk01"], perc_train=0.8, seed=9
    )
    assert [u.filename for u in splits3["spk00"].train] != [
        u.filename for u in splits["spk00"].train
    ]


def test_duration_budget(corpus):
    utts = parse_metafile(corpus + "/metadata.csv")
    budget_min = 2.5 / 60.0  # 2.5 seconds
    splits, _ = split_speakers(
        utts, ["spk00"], total_duration_per_spk=budget_min, seed=0
    )
    n = len(splits["spk00"].train) + len(splits["spk00"].test)
    assert n < 6  # budget truncated the list


def test_default_loader_batches(params):
    train_loader, test_loader, logs = get_dataloader(**params)
    assert "Speaker spk00" in logs
    batches = list(train_loader)
    assert len(batches) == len(train_loader)
    b = batches[0]
    assert isinstance(b, Batch)
    B, T_text = b.inputs.shape
    assert b.mels.shape[0] == B and b.mels.shape[1] == 80
    # mel padded to multiple of 32 (mel_pad_multiple default)
    assert b.mels.shape[2] % 32 == 0
    assert b.stop_labels.shape == (B, b.mels.shape[2])
    # text sorted descending
    assert (np.diff(b.input_lengths) <= 0).all()
    # stop labels: 0 until mel_len-1, 1 from there on
    for i in range(B):
        L = b.mel_lengths[i]
        assert b.stop_labels[i, L - 1] == 1.0
        assert (b.stop_labels[i, : L - 1] == 0.0).all()
        assert (b.stop_labels[i, L:] == 1.0).all()
    # phoneme ids within vocab
    from msa_tts_tpu.utils.g2p import N_SYMBOLS

    assert b.inputs.max() < N_SYMBOLS


def test_loader_epoch_reshuffles(params):
    train_loader, _, _ = get_dataloader(**params)
    ids1 = [b.item_ids for b in train_loader]
    ids2 = [b.item_ids for b in train_loader]
    assert sorted(sum(ids1, ())) == sorted(sum(ids2, ()))  # same items
    assert ids1 != ids2  # different order


def test_meta_loader_episodes(params):
    loader, logs = get_dataloader_meta("metatrain", **params)
    meta_batches = list(loader)
    assert len(meta_batches) == len(loader)
    mb = meta_batches[0]
    assert len(mb) == params["meta_batch_size"]
    for spk, ep in mb.items():
        assert set(ep.keys()) == {"train", "test"}
        # all episodes share the static padded shapes
        assert ep["train"].inputs.shape == ep["test"].inputs.shape
        assert ep["train"].mels.shape == ep["test"].mels.shape
        # support items all belong to the task speaker
        assert all(i.startswith(spk) for i in ep["train"].item_ids)


def test_meta_loader_stacked(params):
    loader, _ = get_dataloader_meta("metatrain", **params)
    speakers, support, query = next(loader.iter_stacked())
    K = len(speakers)
    S = params["dataset_metatrain"]["batch_size"]
    assert support.inputs.shape[:2] == (K, S)
    assert query.mels.shape[:2] == (K, S)
    assert support.mels.shape == query.mels.shape
    # static shapes: every episode from every epoch has identical shape
    _, support2, _ = next(loader.iter_stacked())
    assert support2.inputs.shape == support.inputs.shape


def test_binned_sampler_locality():
    from msa_tts_tpu.dataloaders.sampler import BinnedLengthSampler

    lengths = np.arange(100)[::-1].copy()
    s = BinnedLengthSampler(lengths, batch_size=5, bin_size=10, seed=0)
    order = list(iter(s))
    assert sorted(order) == list(range(100))
    # items within a bin are length-neighbors
    for start in range(0, 100, 10):
        chunk = order[start : start + 10]
        chunk_lengths = lengths[chunk]
        assert chunk_lengths.max() - chunk_lengths.min() < 10


def test_prefetch_to_device_preserves_order():
    import jax
    from msa_tts_tpu.dataloaders.prefetch import prefetch_to_device

    items = [{"x": np.full((2,), i, np.float32)} for i in range(7)]
    out = list(prefetch_to_device(iter(items), size=3))
    assert len(out) == 7
    for i, o in enumerate(out):
        assert isinstance(o["x"], jax.Array)
        assert float(o["x"][0]) == i
    # size larger than the stream also works
    out2 = list(prefetch_to_device(iter(items[:2]), size=5))
    assert len(out2) == 2


def test_prefetch_threaded_abandonment_and_errors():
    """The threaded producer must stop when the consumer abandons the
    iterator early (preemption path — no hung thread, no further
    pulls), and must propagate producer exceptions."""
    import threading
    import time

    from msa_tts_tpu.dataloaders.prefetch import prefetch_to_device

    pulled = []

    def src():
        for i in range(100):
            pulled.append(i)
            yield {"x": np.full((2,), i)}

    it = prefetch_to_device(src(), size=2)
    got = [next(it) for _ in range(3)]
    assert [int(g["x"][0]) for g in got] == [0, 1, 2]
    it.close()          # consumer abandons (e.g. SIGTERM break)
    time.sleep(0.6)     # give the producer time to notice the stop
    n_after = len(pulled)
    time.sleep(0.4)
    assert len(pulled) == n_after          # producer stopped pulling
    assert len(pulled) <= 3 + 2 + 2        # bounded look-ahead
    assert not any(
        t.name == "prefetch_to_device" and t.is_alive()
        for t in threading.enumerate()
    )

    def bad():
        yield {"x": np.zeros(2)}
        raise RuntimeError("loader exploded")

    it2 = prefetch_to_device(bad(), size=2)
    next(it2)
    with pytest.raises(RuntimeError, match="loader exploded"):
        next(it2)


@pytest.mark.parametrize("use_native", [True, False])
def test_dataset_records_trim_slice(tmp_path, use_native):
    """With trim_margin_silence, every Item carries the (start, end)
    slice its mel was computed from, identically on the native and
    numpy paths — vocoder training needs it to re-align the waveform
    with the cached mel (wavernn_train._sample_batch)."""
    import glob
    import os

    from msa_tts_tpu.dataloaders.dataset import TTSDataset, compute_logmel
    from msa_tts_tpu.dataloaders.metafile import parse_metafile, split_speakers
    from msa_tts_tpu.ops.audio import load_wav, save_wav

    root = str(tmp_path / f"c{int(use_native)}")
    make_synthetic_corpus(
        root, n_speakers=1, utterances_per_speaker=3, seed=1,
        min_dur=0.3, max_dur=0.4,
    )
    # inject real silence margins so the trim is non-trivial
    for p in glob.glob(os.path.join(root, "**", "*.wav"), recursive=True):
        w = load_wav(p)
        save_wav(
            p,
            np.concatenate(
                [np.zeros(6000, np.float32), w, np.zeros(3000, np.float32)]
            ),
            22050,
        )
    prm = synthetic_params(root, n_speakers=1, batch_size=2)
    utts = parse_metafile(
        os.path.join(root, prm["dataset_train"]["meta_file"])
    )
    splits, _ = split_speakers(
        utts, prm["dataset_train"]["speakers_list"], perc_train=0.7
    )
    ds = TTSDataset(
        splits, "train",
        dataset_path=root,
        audio_folder=prm["dataset_train"].get("audio_folder", "wavs"),
        trim_margin_silence=True, ref_level_db=26,
        audio_processor="ap", audio_params=prm["audio_params"],
        use_native_feats=use_native,
    )
    for it in ds.items:
        assert it.trim is not None
        s, e = it.trim
        assert s > 0 and e > s  # the injected silence actually trimmed
        wav = load_wav(
            it.audio_path,
            target_sample_rate=prm["audio_params"]["sample_rate"],
        )
        mel_from_slice = compute_logmel(
            wav[s:e], "ap", prm["audio_params"]
        )
        assert mel_from_slice.shape == it.mel.shape
        np.testing.assert_allclose(mel_from_slice, it.mel, atol=2e-4)
