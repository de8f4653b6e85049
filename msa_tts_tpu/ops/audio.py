"""Audio DSP ops: STFT, mel filterbanks, log-mel pipelines, MFCC,
silence trimming, Griffin-Lim.

Two log-mel flavors are provided, matching the two audio frontends of the
reference framework:

  * ``melspec_ap``  — power STFT → HTK-scale mel filterbank (no norm) →
    ``log10(clamp(., 1e-10))``  (reference: msa_tts/utils/ap.py:63-80).
  * ``melspec_ap2`` — HiFi-GAN-style: reflect pad by ``(n_fft-hop)/2``,
    magnitude STFT with 1e-9 epsilon, Slaney-scale/Slaney-norm filterbank,
    natural-log compression clamped at 1e-5
    (reference: msa_tts/utils/ap2.py:32-59).

All spectral functions take an ``xp`` module argument (``numpy`` or
``jax.numpy``): the host data pipeline runs them vectorized in numpy when
precomputing the feature cache, while Griffin-Lim and on-device feature
extraction run the identical code under ``jit`` on TPU.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# Windows and framing
# --------------------------------------------------------------------------

def hann_window(win_length: int, xp=jnp, dtype=None):
    """Periodic Hann window (matches ``torch.hann_window``)."""
    dtype = dtype or (xp.float32 if xp is jnp else np.float32)
    n = xp.arange(win_length, dtype=dtype)
    return 0.5 * (1.0 - xp.cos(2.0 * math.pi * n / win_length))


def _frame(x, frame_length: int, hop_length: int, xp=jnp):
    """Frame the last axis of ``x`` into overlapping windows.

    Returns shape ``(..., n_frames, frame_length)`` where
    ``n_frames = 1 + (T - frame_length) // hop``.
    """
    n_frames = 1 + (x.shape[-1] - frame_length) // hop_length
    if n_frames <= 0:
        # fail loudly where the cause is (torch.stft raises here too);
        # an empty (n_mels, 0) feature would otherwise surface far away
        # in caching/collation
        raise ValueError(
            f"signal too short to frame: {x.shape[-1]} samples < "
            f"frame_length {frame_length} (after any padding)"
        )
    idx = (
        xp.arange(n_frames)[:, None] * hop_length
        + xp.arange(frame_length)[None, :]
    )
    return x[..., idx]


def stft(
    x,
    n_fft: int,
    win_length: int,
    hop_length: int,
    *,
    center: bool = True,
    power: float | None = 2.0,
    pad_mode: str = "reflect",
    xp=jnp,
):
    """Short-time Fourier transform over the last axis.

    Matches ``torch.stft``/``torchaudio.transforms.Spectrogram`` semantics:
    a ``win_length`` Hann window zero-padded (centered) to ``n_fft``, with
    optional reflect center-padding of ``n_fft // 2``.

    Returns complex STFT of shape ``(..., n_freqs, n_frames)`` when
    ``power is None``, else ``|STFT|**power``.
    """
    window = hann_window(win_length, xp=xp)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = xp.pad(window, (lpad, n_fft - win_length - lpad))
    if center:
        pad = n_fft // 2
        x = xp.pad(
            x,
            [(0, 0)] * (x.ndim - 1) + [(pad, pad)],
            mode=pad_mode,
        )
    frames = _frame(x, n_fft, hop_length, xp=xp) * window
    spec = xp.fft.rfft(frames, n=n_fft, axis=-1)
    spec = xp.swapaxes(spec, -1, -2)  # (..., n_freqs, n_frames)
    if power is None:
        return spec
    mag = xp.abs(spec)
    if power == 1.0:
        return mag
    return mag**power


def istft(
    spec,
    n_fft: int,
    win_length: int,
    hop_length: int,
    *,
    center: bool = True,
    length: int | None = None,
    xp=jnp,
):
    """Inverse STFT with overlap-add and squared-window normalization.

    ``spec``: complex, shape ``(..., n_freqs, n_frames)``.
    """
    window = hann_window(win_length, xp=xp)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = xp.pad(window, (lpad, n_fft - win_length - lpad))

    frames = xp.fft.irfft(xp.swapaxes(spec, -1, -2), n=n_fft, axis=-1)
    frames = frames * window  # synthesis window

    n_frames = frames.shape[-2]
    out_len = n_fft + hop_length * (n_frames - 1)
    batch_shape = frames.shape[:-2]

    # Overlap-add via scatter-add on the last axis.
    idx = (
        np.arange(n_frames)[:, None] * hop_length
        + np.arange(n_fft)[None, :]
    ).reshape(-1)
    flat = frames.reshape(batch_shape + (-1,))
    wsq = xp.tile(window**2, (n_frames,))
    if xp is np:
        out = np.zeros(batch_shape + (out_len,), dtype=frames.dtype)
        np.add.at(out, (..., idx), flat)
        norm = np.zeros(out_len, dtype=frames.dtype)
        np.add.at(norm, idx, wsq)
    else:
        out = jnp.zeros(batch_shape + (out_len,), dtype=frames.dtype)
        out = out.at[..., idx].add(flat)
        norm = jnp.zeros(out_len, dtype=frames.dtype).at[idx].add(wsq)
    out = out / xp.maximum(norm, 1e-11)
    if center:
        pad = n_fft // 2
        # With an explicit length, keep the tail-pad region: the last
        # frame's reconstruction extends into it, and torch.istft
        # returns out[pad : pad + length] — trimming both pads first
        # would zero up to n_fft//2 real samples whenever length is not
        # a hop multiple.
        stop = out_len - pad if length is None else min(
            pad + length, out_len
        )
        out = out[..., pad:stop]
    if length is not None:
        if out.shape[-1] < length:
            out = xp.pad(
                out, [(0, 0)] * (out.ndim - 1) + [(0, length - out.shape[-1])]
            )
        out = out[..., :length]
    return out


# --------------------------------------------------------------------------
# Mel filterbanks
# --------------------------------------------------------------------------

def _hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def _hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(
        f >= min_log_hz,
        min_log_mel + np.log(np.maximum(f, min_log_hz) / min_log_hz) / logstep,
        f / f_sp,
    )


def _mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(
        m >= min_log_mel,
        min_log_hz * np.exp(logstep * (m - min_log_mel)),
        f_sp * m,
    )


def _triangular_fbank(all_freqs, f_pts):
    """Triangular overlapping filters (freqs × mels)."""
    f_diff = f_pts[1:] - f_pts[:-1]  # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels + 2)
    down = -slopes[:, :-2] / f_diff[None, :-1]
    up = slopes[:, 2:] / f_diff[None, 1:]
    return np.maximum(0.0, np.minimum(down, up))


@lru_cache(maxsize=16)
def mel_filterbank(
    n_freqs: int,
    f_min: float,
    f_max: float,
    n_mels: int,
    sample_rate: int,
    mel_scale: str = "htk",
    norm: str | None = None,
):
    """Mel filterbank of shape ``(n_freqs, n_mels)``.

    ``mel_scale="htk", norm=None`` reproduces torchaudio's default
    (used by the "ap" frontend); ``mel_scale="slaney", norm="slaney"``
    reproduces librosa's default (used by the "ap2"/HiFi-GAN frontend).
    """
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    if mel_scale == "htk":
        m_min, m_max = _hz_to_mel_htk(f_min), _hz_to_mel_htk(f_max)
        m_pts = np.linspace(m_min, m_max, n_mels + 2)
        f_pts = _mel_to_hz_htk(m_pts)
    elif mel_scale == "slaney":
        m_min, m_max = _hz_to_mel_slaney(f_min), _hz_to_mel_slaney(f_max)
        m_pts = np.linspace(m_min, m_max, n_mels + 2)
        f_pts = _mel_to_hz_slaney(m_pts)
    else:
        raise ValueError(f"unknown mel_scale: {mel_scale}")

    fb = _triangular_fbank(all_freqs, f_pts)
    if norm == "slaney":
        enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
        fb = fb * enorm[None, :]
    elif norm is not None:
        raise ValueError(f"unknown norm: {norm}")
    return fb.astype(np.float32)


# --------------------------------------------------------------------------
# Log-mel pipelines
# --------------------------------------------------------------------------

def melspec_ap(wav, audio_params: dict, xp=jnp):
    """"ap" frontend: power STFT → HTK mel → log10 clamp 1e-10.

    Returns ``((stft_pow, log_stft), melspec, log_melspec)`` with
    spectrogram shapes ``(..., n_freqs|n_mels, n_frames)``.
    """
    p = audio_params
    spec = stft(
        wav, p["n_fft"], p["win_length"], p["hop_length"],
        center=True, power=2.0, xp=xp,
    )
    log_spec = xp.log10(xp.maximum(spec, 1e-10))
    fb = mel_filterbank(
        p["n_fft"] // 2 + 1, p["f_min"], p["f_max"], p["n_mels"],
        p["sample_rate"], mel_scale="htk", norm=None,
    )
    fb = xp.asarray(fb)
    mel = xp.swapaxes(
        xp.matmul(xp.swapaxes(spec, -1, -2), fb), -1, -2
    )
    log_mel = xp.log10(xp.maximum(mel, 1e-10))
    return (spec, log_spec), mel, log_mel


def dynamic_range_compression(x, C: float = 1.0, clip_val: float = 1e-5, xp=jnp):
    return xp.log(xp.maximum(x, clip_val) * C)


def dynamic_range_decompression(x, C: float = 1.0, xp=jnp):
    return xp.exp(x) / C


def melspec_ap2(wav, audio_params: dict, xp=jnp):
    """"ap2" frontend: HiFi-GAN-compatible natural-log mel.

    Returns ``(None, None, log_melspec)`` mirroring the reference API.
    """
    p = audio_params
    n_fft, hop, win = p["n_fft"], p["hop_size"], p["win_size"]
    pad = (n_fft - hop) // 2
    wav = xp.pad(
        wav, [(0, 0)] * (wav.ndim - 1) + [(pad, pad)], mode="reflect"
    )
    spec_c = stft(
        wav, n_fft, win, hop,
        center=bool(p.get("center", False)), power=None, xp=xp,
    )
    mag = xp.sqrt(spec_c.real**2 + spec_c.imag**2 + 1e-9)
    fb = mel_filterbank(
        n_fft // 2 + 1, p["fmin"], p["fmax"], p["n_mels"],
        p["sample_rate"], mel_scale="slaney", norm="slaney",
    )
    fb = xp.asarray(fb)
    mel = xp.swapaxes(xp.matmul(xp.swapaxes(mag, -1, -2), fb), -1, -2)
    log_mel = dynamic_range_compression(mel, xp=xp)
    return None, None, log_mel


def mfcc(wav, audio_params: dict, xp=jnp):
    """MFCC with log-mel input (``log(mel + 1e-6)``) and ortho DCT-II."""
    p = audio_params
    _, mel, _ = melspec_ap(wav, p, xp=xp)
    log_mel = xp.log(mel + 1e-6)
    n_mels, n_mfcc = p["n_mels"], p["n_mfcc"]
    # DCT-II, orthonormal.
    n = np.arange(n_mels)
    k = np.arange(n_mfcc)
    dct_m = np.cos(math.pi / n_mels * (n[None, :] + 0.5) * k[:, None])
    dct_m *= math.sqrt(2.0 / n_mels)
    dct_m[0] *= 1.0 / math.sqrt(2.0)
    dct_m = xp.asarray(dct_m.astype(np.float32))
    return xp.einsum("km,...mt->...kt", dct_m, log_mel)


# --------------------------------------------------------------------------
# Silence trimming (host-side, numpy)
# --------------------------------------------------------------------------

def trim_margin_silence_slice(
    wav: np.ndarray,
    ref_level_db: float = 26,
    frame_length: int = 1024,
    hop_length: int = 256,
) -> tuple[int, int]:
    """Bounds of :func:`trim_margin_silence`'s slice into ``wav``.

    Exposed separately so consumers that pair the trimmed-derived mel
    with the waveform (vocoder training) can reproduce the exact trim
    on a reloaded wav instead of re-running the frame analysis."""
    wav = np.asarray(wav)
    if wav.size == 0:
        return 0, 0
    pad = frame_length // 2
    padded = np.pad(wav, (pad, pad))
    n_frames = 1 + (padded.shape[-1] - frame_length) // hop_length
    idx = (
        np.arange(n_frames)[:, None] * hop_length
        + np.arange(frame_length)[None, :]
    )
    frames = padded[idx]
    power = np.mean(frames**2, axis=-1)
    ref = np.max(power)
    if ref <= 0:
        return 0, int(wav.shape[-1])
    db = 10.0 * np.log10(np.maximum(power, 1e-20) / ref)
    non_silent = db > -ref_level_db
    nz = np.flatnonzero(non_silent)
    if nz.size == 0:
        return 0, 0
    start = int(nz[0]) * hop_length
    end = min(int(wav.shape[-1]), int(nz[-1] + 1) * hop_length)
    return start, end


def trim_margin_silence(
    wav: np.ndarray,
    ref_level_db: float = 26,
    frame_length: int = 1024,
    hop_length: int = 256,
) -> np.ndarray:
    """Trim leading/trailing silence below ``ref_level_db`` relative to peak
    power (librosa.effects.trim semantics; reference: msa_tts/utils/ap.py:95-112).
    """
    wav = np.asarray(wav)
    start, end = trim_margin_silence_slice(
        wav, ref_level_db, frame_length, hop_length
    )
    return wav[start:end]


# --------------------------------------------------------------------------
# Griffin-Lim
# --------------------------------------------------------------------------

def griffin_lim(
    spec,
    n_fft: int,
    win_length: int,
    hop_length: int,
    n_iter: int = 60,
    power: float = 2.0,
    momentum: float = 0.99,
    rng: jax.Array | None = None,
    length: int | None = None,
):
    """Griffin-Lim phase reconstruction (momentum-accelerated), jit-friendly.

    ``spec``: non-negative spectrogram ``(n_freqs, n_frames)`` in the given
    ``power`` scale (2 = power spectrogram).

    All phase arithmetic is carried as explicit (real, imag) float pairs —
    the TPU backend implements FFTs but not complex multiply kernels, so
    complex values exist only at the rfft/irfft boundaries.
    """
    S = jnp.asarray(spec) ** (1.0 / power)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    init_phase = jax.random.uniform(
        rng, S.shape, minval=-math.pi, maxval=math.pi
    )
    ang_re, ang_im = jnp.cos(init_phase), jnp.sin(init_phase)

    mom = momentum / (1.0 + momentum)

    def _istft_ri(re, im):
        return istft(
            jax.lax.complex(re, im), n_fft, win_length, hop_length, xp=jnp
        )

    def _stft_ri(x):
        c = stft(x, n_fft, win_length, hop_length, power=None, xp=jnp)
        return c.real, c.imag

    def body(carry, _):
        ang_re, ang_im, tp_re, tp_im = carry
        inverse = _istft_ri(S * ang_re, S * ang_im)
        rb_re, rb_im = _stft_ri(inverse)
        na_re = rb_re - mom * tp_re
        na_im = rb_im - mom * tp_im
        mag = jnp.sqrt(na_re**2 + na_im**2)
        mag = jnp.maximum(mag, 1e-16)
        return (na_re / mag, na_im / mag, rb_re, rb_im), None

    (ang_re, ang_im, _, _), _ = jax.lax.scan(
        body,
        (ang_re, ang_im, jnp.zeros_like(ang_re), jnp.zeros_like(ang_im)),
        None,
        length=n_iter,
    )
    return istft(
        jax.lax.complex(S * ang_re, S * ang_im),
        n_fft, win_length, hop_length, length=length, xp=jnp,
    )


@lru_cache(maxsize=16)
def _mel_fbank_pinv(n_freqs, f_min, f_max, n_mels, sample_rate):
    """Cached pseudo-inverse of the HTK filterbank — the eager vocoding
    paths call griffinlim_logmelspec per utterance and must not pay a
    host-side pinv each time.

    Returns host numpy, NOT jnp: a cached jnp value created inside a jit
    trace would be a leaked tracer that poisons every later trace
    (UnexpectedTracerError on the second distinct jit of a serving
    path). Each caller lifts its own device constant via jnp.asarray.
    """
    fb = mel_filterbank(
        n_freqs, f_min, f_max, n_mels, sample_rate,
        mel_scale="htk", norm=None,
    )
    return np.linalg.pinv(np.asarray(fb).T)


def griffinlim_logmelspec(log_melspec, audio_params: dict,
                          rng: jax.Array | None = None):
    """Invert a log10-mel spectrogram ("ap" flavor) to a waveform:
    ``10**logmel`` → pseudo-inverse of the HTK filterbank → Griffin-Lim
    (reference: msa_tts/utils/ap.py:114-139).
    """
    p = audio_params
    mel = 10.0 ** jnp.asarray(log_melspec)
    if mel.ndim == 3:
        mel = mel[0]
    inv = jnp.asarray(_mel_fbank_pinv(
        p["n_fft"] // 2 + 1, p["f_min"], p["f_max"], p["n_mels"],
        p["sample_rate"],
    ))  # (n_freqs, n_mels)
    spec = inv @ mel
    spec = jnp.maximum(spec, 1e-10)
    # Guard against degenerate one/two-frame mels (e.g. an untrained
    # gate stopping immediately): Griffin-Lim's ISTFT needs at least
    # enough frames to survive the center trim.
    min_frames = p["n_fft"] // p["hop_length"] + 1
    if spec.shape[1] < min_frames:
        spec = jnp.pad(
            spec, ((0, 0), (0, min_frames - spec.shape[1])), mode="edge"
        )
    return griffin_lim(
        spec, p["n_fft"], p["win_length"], p["hop_length"],
        n_iter=p.get("griffinlim_iters", 60), power=2.0, rng=rng,
    )


# --------------------------------------------------------------------------
# Waveform I/O (host-side)
# --------------------------------------------------------------------------

def load_wav(path: str, target_sample_rate: int | None = None) -> np.ndarray:
    """Load a wav file, normalize to peak 1.0, resample if needed.

    Resampling runs in the native C++ polyphase engine when available
    (same filter design and alignment as ``scipy.signal.resample_poly``,
    parity-tested) and falls back to scipy otherwise."""
    from scipy.io import wavfile

    sr, data = wavfile.read(path)
    data = np.asarray(data, dtype=np.float32)
    if data.ndim == 2:  # channels last → take first channel
        data = data[:, 0]
    peak = np.max(np.abs(data))
    if peak > 0:
        data = data / peak
    if target_sample_rate is not None and sr != target_sample_rate:
        from ..native import resample as native_resample

        out = native_resample(data, int(sr), int(target_sample_rate))
        if out is not None:
            data = out
        else:
            from scipy.signal import resample_poly

            g = math.gcd(int(target_sample_rate), int(sr))
            data = resample_poly(
                data, target_sample_rate // g, sr // g
            ).astype(np.float32)
    return data


def save_wav(path: str, wav: np.ndarray, sample_rate: int) -> None:
    from scipy.io import wavfile

    wav = np.asarray(wav, dtype=np.float32)
    peak = np.max(np.abs(wav))
    if peak > 1.0:
        wav = wav / peak
    wavfile.write(path, sample_rate, (wav * 32767.0).astype(np.int16))
