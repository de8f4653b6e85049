"""Parity tests: native C++ feature runtime vs the numpy DSP path.

The native engine (msa_tts_tpu/native/feats.cpp) must reproduce
ops/audio.py's trim/STFT/mel/log pipelines to float32 rounding, for both
audio frontends, threaded or not — it is an acceleration of the host
data pipeline, never a semantic fork."""

import numpy as np
import pytest

from msa_tts_tpu.native import (
    extract_logmels_batch,
    native_available,
    trim_slice,
)
from msa_tts_tpu.ops import audio as A

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain for the native lib"
)

AP = dict(
    sample_rate=22050, n_fft=1024, win_length=1024, hop_length=256,
    f_min=0.0, f_max=8000.0, n_mels=80,
)
AP2 = dict(
    sample_rate=22050, n_fft=1024, win_size=1024, hop_size=256,
    fmin=0.0, fmax=8000.0, n_mels=80, center=False,
)


def _wavs(seed=0, durs=(0.4, 1.0, 2.3)):
    rng = np.random.default_rng(seed)
    return [
        rng.standard_normal(int(22050 * d)).astype(np.float32) * 0.3
        for d in durs
    ]


def test_ap_parity():
    wavs = _wavs()
    mels, slices = extract_logmels_batch(wavs, "ap", AP)
    for w, m, s in zip(wavs, mels, slices):
        assert s == (0, len(w))  # no trim requested
        _, _, ref = A.melspec_ap(w, AP, xp=np)
        np.testing.assert_allclose(
            m, np.asarray(ref, np.float32), atol=1e-5
        )


def test_ap_parity_window_shorter_than_nfft():
    p = dict(AP, win_length=800)
    wavs = _wavs(seed=3, durs=(0.8,))
    mels, _ = extract_logmels_batch(wavs, "ap", p)
    _, _, ref = A.melspec_ap(wavs[0], p, xp=np)
    np.testing.assert_allclose(
        mels[0], np.asarray(ref, np.float32), atol=1e-5
    )


def test_ap2_parity():
    wavs = _wavs(seed=1)
    mels, _ = extract_logmels_batch(wavs, "ap2", AP2)
    for w, m in zip(wavs, mels):
        _, _, ref = A.melspec_ap2(w[None], AP2, xp=np)
        np.testing.assert_allclose(
            m, np.asarray(ref[0], np.float32), atol=1e-5
        )


def test_trim_parity():
    rng = np.random.default_rng(2)
    w = np.concatenate([
        np.zeros(5000, np.float32),
        rng.standard_normal(30000).astype(np.float32),
        np.zeros(9000, np.float32),
    ])
    start, end = trim_slice(w, ref_level_db=26)
    ref = A.trim_margin_silence(w, ref_level_db=26)
    assert end - start == len(ref)
    np.testing.assert_array_equal(w[start:end], ref)


def test_trim_all_silent_and_all_loud():
    silent = np.zeros(4000, np.float32)
    s, e = trim_slice(silent)
    assert (s, e) == (0, len(silent))  # zero signal kept (numpy semantics)
    loud = np.ones(4000, np.float32)
    s, e = trim_slice(loud)
    ref = A.trim_margin_silence(loud)
    assert e - s == len(ref)


def test_trimmed_extraction_matches_numpy_chain():
    rng = np.random.default_rng(4)
    w = np.concatenate([
        np.zeros(4000, np.float32),
        rng.standard_normal(25000).astype(np.float32) * 0.5,
        np.zeros(6000, np.float32),
    ])
    mels, slices = extract_logmels_batch(
        [w], "ap", AP, trim_margin_silence=True, ref_level_db=26
    )
    trimmed = A.trim_margin_silence(w, ref_level_db=26)
    assert slices[0][1] - slices[0][0] == len(trimmed)
    _, _, ref = A.melspec_ap(trimmed, AP, xp=np)
    np.testing.assert_allclose(
        mels[0], np.asarray(ref, np.float32), atol=1e-5
    )


def test_too_short_signal_raises_like_numpy():
    # ap2 frames with center=False: a signal shorter than n_fft yields
    # zero frames.  The native path must fail loudly (naming the item),
    # exactly like ops/audio.py's _frame guard — never return an empty
    # (n_mels, 0) mel that only explodes at collation.
    short = np.ones(200, np.float32) * 0.1
    ok = np.ones(22050, np.float32) * 0.1
    with pytest.raises(ValueError, match="too short to frame"):
        extract_logmels_batch([ok, short], "ap2", AP2)
    with pytest.raises(ValueError, match="too short to frame"):
        A.melspec_ap2(short, AP2, xp=np)
    # Boundary: 256 samples pads (via repeated reflection, pad > n-1)
    # to exactly one frame on BOTH paths — the native engine must not
    # refuse what numpy accepts.
    rng = np.random.default_rng(11)
    edge = rng.standard_normal(256).astype(np.float32) * 0.3
    mels, _ = extract_logmels_batch([edge], "ap2", AP2)
    _, _, ref = A.melspec_ap2(edge, AP2, xp=np)
    assert mels[0].shape == ref.shape == (80, 1)
    np.testing.assert_allclose(mels[0], np.asarray(ref, np.float32),
                               atol=1e-5)


def test_threaded_matches_single_thread():
    wavs = _wavs(seed=5, durs=(0.5, 0.9, 1.4, 2.0, 0.6, 1.1))
    m1, _ = extract_logmels_batch(wavs, "ap", AP, n_threads=1)
    m4, _ = extract_logmels_batch(wavs, "ap", AP, n_threads=4)
    for a, b in zip(m1, m4):
        np.testing.assert_array_equal(a, b)  # bit-identical


def test_dataset_native_equals_numpy(tmp_path):
    """TTSDataset built with the native engine must hold the same cached
    features as the numpy fallback."""
    from msa_tts_tpu.dataloaders import parse_metafile, split_speakers
    from msa_tts_tpu.dataloaders.dataset import TTSDataset
    from msa_tts_tpu.dataloaders.synthetic import make_synthetic_corpus

    root = str(tmp_path / "corpus")
    make_synthetic_corpus(root, n_speakers=2, utterances_per_speaker=3,
                          seed=0)
    utts = parse_metafile(root + "/metadata.csv")
    splits, _ = split_speakers(
        utts, ["spk00", "spk01"], perc_train=0.7, seed=0
    )

    def build(native: bool):
        return TTSDataset(
            splits, "train", dataset_path=root,
            trim_margin_silence=True, ref_level_db=26,
            audio_processor="ap", audio_params=dict(AP),
            use_native_feats=native,
        )

    ds_native = build(True)
    ds_numpy = build(False)
    assert len(ds_native) == len(ds_numpy) > 0
    for a, b in zip(ds_native.items, ds_numpy.items):
        assert a.item_id == b.item_id
        assert a.mel.shape == b.mel.shape
        # log10 of near-clamp mel energies amplifies float32 rounding;
        # 2e-4 absolute on a log-mel is far below any training effect.
        np.testing.assert_allclose(a.mel, b.mel, atol=2e-4)
        np.testing.assert_array_equal(a.phonemes, b.phonemes)


# ------------------------------------------------------------- resampler
def test_resample_parity_vs_scipy():
    """Native polyphase resampler vs scipy.signal.resample_poly default
    (kaiser 5.0, 10*max(up,down) half-length, matched alignment) across
    the rate pairs the prep scripts use, on awkward odd lengths."""
    from scipy.signal import resample_poly
    import math
    from msa_tts_tpu.native import resample_batch

    rng = np.random.default_rng(3)
    pairs = [(48000, 22050), (22050, 16000), (16000, 22050),
             (44100, 22050), (8000, 22050)]
    for orig, target in pairs:
        for n in (4801, 22050, 100001):
            x = rng.standard_normal(n).astype(np.float32)
            g = math.gcd(target, orig)
            up, down = target // g, orig // g
            ref = resample_poly(x, up, down).astype(np.float32)
            out = resample_batch([x], up, down)[0]
            assert out.shape == ref.shape, (orig, target, n)
            np.testing.assert_allclose(
                out, ref, atol=2e-6,
                err_msg=f"resample {orig}->{target}, n={n}",
            )


def test_resample_identity_and_batch_threading():
    from msa_tts_tpu.native import resample_batch

    rng = np.random.default_rng(5)
    wavs = [rng.standard_normal(n).astype(np.float32)
            for n in (1000, 4801, 50000, 123457)]
    # identity rate: exact copy
    same = resample_batch([wavs[0]], 22050, 22050)
    np.testing.assert_array_equal(same[0], wavs[0])
    # thread pool bit-identical to single thread
    a = resample_batch(wavs, 147, 320, n_threads=1)
    b = resample_batch(wavs, 147, 320, n_threads=4)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_load_wav_native_resample(tmp_path):
    """load_wav's native resample path matches the scipy fallback."""
    from scipy.io import wavfile
    from scipy.signal import resample_poly

    rng = np.random.default_rng(7)
    wav48 = (rng.standard_normal(48000) * 0.25).astype(np.float32)
    path = str(tmp_path / "x.wav")
    wavfile.write(path, 48000, (wav48 * 32767).astype(np.int16))

    out = A.load_wav(path, target_sample_rate=22050)
    raw = np.asarray(
        wavfile.read(path)[1], np.float32
    )
    raw /= np.max(np.abs(raw))
    ref = resample_poly(raw, 147, 320).astype(np.float32)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-6)
