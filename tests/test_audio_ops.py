"""Golden tests for audio DSP ops against torch/scipy oracles."""

import numpy as np
import pytest
import scipy.signal

import msa_tts_tpu.ops.audio as A

AP_PARAMS = {
    "n_fft": 1024,
    "win_length": 1024,
    "hop_length": 256,
    "n_mels": 80,
    "sample_rate": 22050,
    "f_min": 0.0,
    "f_max": 8000.0,
    "n_mfcc": 13,
    "griffinlim_iters": 8,
}

AP2_PARAMS = {
    "n_fft": 1024,
    "win_size": 1024,
    "hop_size": 256,
    "n_mels": 80,
    "sample_rate": 22050,
    "fmin": 0.0,
    "fmax": 8000.0,
    "center": False,
}


def _sine(sr=22050, dur=0.5, f=440.0):
    t = np.arange(int(sr * dur)) / sr
    x = 0.5 * np.sin(2 * np.pi * f * t) + 0.1 * np.sin(2 * np.pi * 3 * f * t)
    return x.astype(np.float32)


def test_hann_window_matches_torch():
    torch = pytest.importorskip("torch")
    ours = np.asarray(A.hann_window(512, xp=np))
    theirs = torch.hann_window(512).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_stft_matches_torch():
    torch = pytest.importorskip("torch")
    x = _sine()
    ours = A.stft(x, 1024, 1024, 256, center=True, power=2.0, xp=np)
    xt = torch.from_numpy(x)
    theirs = torch.stft(
        xt, 1024, hop_length=256, win_length=1024,
        window=torch.hann_window(1024), center=True, pad_mode="reflect",
        normalized=False, onesided=True, return_complex=True,
    )
    theirs = theirs.abs().pow(2).numpy()
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_stft_win_shorter_than_nfft():
    torch = pytest.importorskip("torch")
    x = _sine()
    ours = A.stft(x, 1024, 800, 200, center=True, power=1.0, xp=np)
    xt = torch.from_numpy(x)
    theirs = torch.stft(
        xt, 1024, hop_length=200, win_length=800,
        window=torch.hann_window(800), center=True, pad_mode="reflect",
        return_complex=True,
    ).abs().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_mel_fbank_htk_matches_torchaudio_formula():
    # Oracle: direct reimplementation of the published HTK mel formula via
    # scipy-free numpy (structural test: shape, nonnegativity, coverage).
    fb = A.mel_filterbank(513, 0.0, 8000.0, 80, 22050, "htk", None)
    assert fb.shape == (513, 80)
    assert (fb >= 0).all()
    # every mel filter has nonzero area
    assert (fb.sum(axis=0) > 0).all()
    # filters peak in increasing frequency order
    peaks = fb.argmax(axis=0)
    assert (np.diff(peaks) >= 0).all()


def test_mel_fbank_slaney_normalization():
    fb = A.mel_filterbank(513, 0.0, 8000.0, 80, 22050, "slaney", "slaney")
    assert fb.shape == (513, 80)
    # Slaney-normalized filters have approximately equal area in Hz.
    areas = fb.sum(axis=0)
    assert areas.max() / areas.min() < 3.0


def test_melspec_ap_shapes_and_consistency():
    x = _sine()
    (spec, log_spec), mel, log_mel = A.melspec_ap(x, AP_PARAMS, xp=np)
    n_frames = 1 + len(x) // 256
    assert spec.shape == (513, n_frames)
    assert mel.shape == (80, n_frames)
    np.testing.assert_allclose(
        log_mel, np.log10(np.maximum(mel, 1e-10)), atol=1e-6
    )
    # jnp path agrees with numpy path (compare in linear domain — the log
    # near the clamp floor amplifies fp32 rounding)
    import jax.numpy as jnp

    _, mel_j, _ = A.melspec_ap(jnp.asarray(x), AP_PARAMS, xp=jnp)
    np.testing.assert_allclose(
        np.asarray(mel_j), mel, rtol=2e-3, atol=1e-4
    )


def test_melspec_ap2_shapes():
    x = _sine()
    _, _, log_mel = A.melspec_ap2(x[None, :], AP2_PARAMS, xp=np)
    assert log_mel.shape[1] == 80
    # natural-log clamp floor
    assert log_mel.min() >= np.log(1e-5) - 1e-5


def test_trim_margin_silence():
    sr = 22050
    sig = _sine(sr=sr, dur=0.3)
    silence = np.zeros(sr // 4, dtype=np.float32)
    x = np.concatenate([silence, sig, silence])
    trimmed = A.trim_margin_silence(x, ref_level_db=26)
    assert len(trimmed) < len(x)
    assert len(trimmed) >= len(sig) - 2048
    # trimmed signal retains the loud part
    assert np.abs(trimmed).max() == np.abs(x).max()


def test_istft_reconstruction():
    x = _sine(dur=0.3)
    spec = A.stft(x, 1024, 1024, 256, center=True, power=None, xp=np)
    rec = A.istft(spec, 1024, 1024, 256, center=True, length=len(x), xp=np)
    assert rec.shape == x.shape
    # the last partial hop cannot be reconstructed; compare the covered part
    n_valid = 256 * (spec.shape[1] - 1) - 2 * (1024 // 2) + 1024
    n_valid = min(n_valid, len(x))
    np.testing.assert_allclose(rec[: n_valid], x[: n_valid], atol=1e-3)


def test_griffin_lim_reduces_error():
    x = _sine(dur=0.3)
    spec = A.stft(x, 1024, 1024, 256, center=True, power=2.0, xp=np)
    wav = np.asarray(
        A.griffin_lim(spec, 1024, 1024, 256, n_iter=16, power=2.0)
    )
    # Reconstruction magnitude spectrogram should be close to target.
    rec_spec = A.stft(wav, 1024, 1024, 256, center=True, power=2.0, xp=np)
    T = min(rec_spec.shape[1], spec.shape[1])
    err = np.linalg.norm(np.sqrt(rec_spec[:, :T]) - np.sqrt(spec[:, :T]))
    rel = err / np.linalg.norm(np.sqrt(spec[:, :T]))
    assert rel < 0.15


def test_load_save_wav_roundtrip(tmp_path):
    x = _sine(dur=0.2)
    path = str(tmp_path / "t.wav")
    A.save_wav(path, x, 22050)
    y = A.load_wav(path, target_sample_rate=22050)
    assert abs(len(y) - len(x)) <= 2
    # normalized to peak 1.0
    assert abs(np.abs(y).max() - 1.0) < 1e-3


def test_load_wav_resamples(tmp_path):
    x = _sine(sr=44100, dur=0.2)
    path = str(tmp_path / "t44.wav")
    A.save_wav(path, x, 44100)
    y = A.load_wav(path, target_sample_rate=22050)
    assert abs(len(y) - len(x) // 2) < 16


def test_mfcc_shape():
    x = _sine()
    m = A.mfcc(x, AP_PARAMS, xp=np)
    assert m.shape[0] == 13


def test_istft_non_hop_multiple_length_matches_torch():
    """With a length that is not a hop multiple, istft must reconstruct
    the tail from the pad region like torch.istft — not zero it (the
    round-2 review's confirmed bug)."""
    torch = pytest.importorskip("torch")

    rng = np.random.default_rng(0)
    n = 4096  # not a multiple of hop=200
    x = rng.standard_normal(n).astype(np.float32)
    n_fft, hop = 1024, 200
    spec = A.stft(x, n_fft, n_fft, hop, center=True, power=None, xp=np)
    rec = A.istft(spec, n_fft, n_fft, hop, center=True, length=n, xp=np)

    t = torch.istft(
        torch.stft(
            torch.from_numpy(x), n_fft, hop_length=hop,
            window=torch.hann_window(n_fft), center=True,
            return_complex=True,
        ),
        n_fft, hop_length=hop, window=torch.hann_window(n_fft),
        center=True, length=n,
    ).numpy()
    np.testing.assert_allclose(rec, t, atol=1e-4)
    # specifically: the tail is reconstructed, not zeroed
    assert np.abs(rec[-(n % hop):]).max() > 0.1


def test_frame_raises_on_too_short_signal():
    with pytest.raises(ValueError, match="too short"):
        A.stft(np.zeros(100, np.float32), 1024, 1024, 256,
               center=False, xp=np)


def test_grad_utils_mixing():
    """mix_grads / mix_grads_stacked (reference grad_utils.py parity
    API) agree with each other and with the hand-computed average."""
    import jax.numpy as jnp
    from msa_tts_tpu.meta.grad_utils import mix_grads, mix_grads_stacked

    g1 = {"w": jnp.asarray([1.0, 2.0]), "b": jnp.asarray(3.0)}
    g2 = {"w": jnp.asarray([3.0, 4.0]), "b": jnp.asarray(5.0)}
    uniform = mix_grads([g1, g2])
    np.testing.assert_allclose(np.asarray(uniform["w"]), [2.0, 3.0])
    np.testing.assert_allclose(np.asarray(uniform["b"]), 4.0)

    weighted = mix_grads([g1, g2], weights=[1.0, 3.0])
    np.testing.assert_allclose(np.asarray(weighted["w"]), [2.5, 3.5])

    stacked = {
        "w": jnp.stack([g1["w"], g2["w"]]),
        "b": jnp.stack([g1["b"], g2["b"]]),
    }
    s_uni = mix_grads_stacked(stacked)
    np.testing.assert_allclose(np.asarray(s_uni["w"]), [2.0, 3.0])
    s_w = mix_grads_stacked(stacked, weights=[1.0, 3.0])
    np.testing.assert_allclose(np.asarray(s_w["w"]), [2.5, 3.5])


@pytest.mark.slow
def test_griffinlim_mel_pinv_no_tracer_leak():
    """Regression: _mel_fbank_pinv is lru_cached.  If it cached a jnp
    array created inside a jit trace, the second *distinct* trace (new
    mel shape, or single-request jit then batch jit as in serving)
    would retrieve the leaked tracer and raise UnexpectedTracerError.
    The cache must hold host numpy only."""
    import jax
    import jax.numpy as jnp

    A._mel_fbank_pinv.cache_clear()
    ap = dict(
        sample_rate=22050, n_fft=512, win_length=512, hop_length=128,
        f_min=0.0, f_max=8000.0, n_mels=40, griffinlim_iters=2,
    )
    f1 = jax.jit(lambda m: A.griffinlim_logmelspec(m, ap))
    f2 = jax.jit(lambda m: A.griffinlim_logmelspec(m[None], ap))
    m = jnp.full((40, 12), -3.0)
    w1 = f1(m)          # first trace populates the cache
    w2 = f2(m)          # second distinct trace must not see a tracer
    assert np.isfinite(np.asarray(w1)).all()
    assert np.isfinite(np.asarray(w2)).all()
    cached = A._mel_fbank_pinv(257, 0.0, 8000.0, 40, 22050)
    assert isinstance(cached, np.ndarray)
