"""Native (C++) host runtime for the data pipeline.

``extract_logmels_batch`` runs silence trimming + STFT + mel + log
compression for a batch of utterances in a C++ thread pool
(``feats.cpp``), producing bit-compatible output with the numpy path in
``ops/audio.py`` (parity asserted by tests/test_native_feats.py).  The
library is compiled on first use with the toolchain's g++ and cached in
``native/_build``; every entry point degrades gracefully to the numpy
implementation when no compiler is available, so the native path is a
pure acceleration, never a dependency.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "feats.cpp")
_BUILD_DIR = os.path.join(_HERE, "_build")

_lock = threading.Lock()
_lib = None
_lib_failed = False


def _source_tag() -> str:
    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()[:16]


def _compile() -> str | None:
    tag = _source_tag()
    so_path = os.path.join(_BUILD_DIR, f"libmsafeats_{tag}.so")
    if os.path.exists(so_path):
        return so_path
    os.makedirs(_BUILD_DIR, exist_ok=True)
    # per-process tmp name: concurrent first-use compiles (pytest-xdist
    # workers, two jobs sharing a checkout) must not write the same tmp
    # path, or one process's os.replace could publish a half-written .so
    tmp = f"{so_path}.tmp.{os.getpid()}"
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        "-o", tmp, _SRC,
    ]
    try:
        subprocess.run(
            cmd, check=True, capture_output=True, text=True, timeout=180,
        )
        os.replace(tmp, so_path)
    except (OSError, subprocess.SubprocessError):
        return so_path if os.path.exists(so_path) else None
    return so_path


def get_lib():
    """Load (compiling if needed) the native library; None on failure."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        so_path = _compile()
        if so_path is None:
            _lib_failed = True
            return None
        try:
            lib = ctypes.CDLL(so_path)
        except OSError:
            _lib_failed = True
            return None
        lib.msa_extract_batch.restype = ctypes.c_int
        lib.msa_extract_batch.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),   # wavs
            ctypes.POINTER(ctypes.c_int64),    # wav_lens
            ctypes.c_int,                      # n_utts
            ctypes.c_int,                      # trim_enable
            ctypes.c_float,                    # ref_level_db
            ctypes.c_int,                      # trim_frame
            ctypes.c_int,                      # trim_hop
            ctypes.c_int,                      # flavor
            ctypes.c_int,                      # n_fft
            ctypes.c_int,                      # win_length
            ctypes.c_int,                      # hop_length
            ctypes.c_int,                      # center
            ctypes.c_void_p,                   # fb
            ctypes.c_int,                      # n_mels
            ctypes.POINTER(ctypes.c_void_p),   # out_mels
            ctypes.POINTER(ctypes.c_int64),    # out_frames
            ctypes.POINTER(ctypes.c_int64),    # trim_start
            ctypes.POINTER(ctypes.c_int64),    # trim_end
            ctypes.c_int,                      # n_threads
        ]
        lib.msa_trim.restype = None
        lib.msa_trim.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_float,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.msa_resample_len.restype = ctypes.c_int64
        lib.msa_resample_len.argtypes = [
            ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        ]
        lib.msa_resample_batch.restype = ctypes.c_int
        lib.msa_resample_batch.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),   # wavs
            ctypes.POINTER(ctypes.c_int64),    # lens
            ctypes.c_int,                      # n
            ctypes.c_int,                      # up
            ctypes.c_int,                      # down
            ctypes.POINTER(ctypes.c_void_p),   # outs
            ctypes.c_int,                      # n_threads
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_lib() is not None


def _flavor_config(audio_processor: str, audio_params: dict):
    p = audio_params
    if audio_processor == "ap":
        return dict(
            flavor=0, n_fft=p["n_fft"], win_length=p["win_length"],
            hop_length=p["hop_length"], center=1,
            fb_kwargs=dict(mel_scale="htk", norm=None),
            f_min=p["f_min"], f_max=p["f_max"],
        )
    if audio_processor == "ap2":
        return dict(
            flavor=1, n_fft=p["n_fft"], win_length=p["win_size"],
            hop_length=p["hop_size"], center=int(p.get("center", False)),
            fb_kwargs=dict(mel_scale="slaney", norm="slaney"),
            f_min=p["fmin"], f_max=p["fmax"],
        )
    raise ValueError(f"unknown audio_processor: {audio_processor}")


def _max_frames(n: int, cfg: dict) -> int:
    """Upper-bound frame count for an UNTRIMMED signal of n samples."""
    n_fft, hop = cfg["n_fft"], cfg["hop_length"]
    pad = (n_fft - hop) // 2 * 2 if cfg["flavor"] == 1 else 0
    pad += n_fft if cfg["center"] else 0
    total = n + pad
    if total < n_fft:
        return 0
    return 1 + (total - n_fft) // hop


def extract_logmels_batch(
    wavs: list[np.ndarray],
    audio_processor: str,
    audio_params: dict,
    *,
    trim_margin_silence: bool = False,
    ref_level_db: float = 26,
    n_threads: int | None = None,
):
    """Threaded native trim + log-mel for a batch of waveforms.

    Returns ``(mels, slices)`` where ``mels[i]`` is the float32
    ``(n_mels, T_i)`` log-mel of (optionally trimmed) ``wavs[i]`` and
    ``slices[i] = (start, end)`` is the trim slice into the original
    waveform.  Returns ``None`` when the native library is unavailable —
    callers fall back to the numpy path.
    """
    lib = get_lib()
    if lib is None:
        return None
    from ..ops.audio import mel_filterbank

    cfg = _flavor_config(audio_processor, audio_params)
    p = audio_params
    n_mels = p["n_mels"]
    fb = mel_filterbank(
        cfg["n_fft"] // 2 + 1, cfg["f_min"], cfg["f_max"], n_mels,
        p["sample_rate"], **cfg["fb_kwargs"],
    )
    fb = np.ascontiguousarray(fb, dtype=np.float32)

    n = len(wavs)
    if n == 0:
        return [], []
    wavs32 = [np.ascontiguousarray(w, dtype=np.float32) for w in wavs]
    bufs = [
        np.empty(n_mels * max(_max_frames(len(w), cfg), 1), np.float32)
        for w in wavs32
    ]
    wav_ptrs = (ctypes.c_void_p * n)(
        *[w.ctypes.data_as(ctypes.c_void_p).value for w in wavs32]
    )
    out_ptrs = (ctypes.c_void_p * n)(
        *[b.ctypes.data_as(ctypes.c_void_p).value for b in bufs]
    )
    wav_lens = (ctypes.c_int64 * n)(*[len(w) for w in wavs32])
    out_frames = (ctypes.c_int64 * n)()
    t_start = (ctypes.c_int64 * n)()
    t_end = (ctypes.c_int64 * n)()

    if n_threads is None:
        n_threads = min(os.cpu_count() or 1, 16)

    rc = lib.msa_extract_batch(
        wav_ptrs, wav_lens, n,
        int(trim_margin_silence), float(ref_level_db), 1024, 256,
        cfg["flavor"], cfg["n_fft"], cfg["win_length"], cfg["hop_length"],
        cfg["center"], fb.ctypes.data_as(ctypes.c_void_p), n_mels,
        out_ptrs, out_frames, t_start, t_end, n_threads,
    )
    if rc != 0:
        return None

    mels = []
    slices = []
    for i in range(n):
        frames = int(out_frames[i])
        if frames == 0:
            # Mirror the numpy path's loud failure (ops/audio.py:52):
            # a (trimmed) signal too short to frame must not silently
            # become an empty mel that only blows up at collation.
            raise ValueError(
                f"signal too short to frame: item {i} has "
                f"{int(t_end[i]) - int(t_start[i])} samples after trim "
                f"(< {cfg['n_fft']} required with center="
                f"{bool(cfg['center'])})"
            )
        mels.append(bufs[i][: n_mels * frames].reshape(n_mels, frames))
        slices.append((int(t_start[i]), int(t_end[i])))
    return mels, slices


def resample_batch(
    wavs: list[np.ndarray], up: int, down: int,
    *, n_threads: int | None = None,
) -> list[np.ndarray] | None:
    """Threaded polyphase resampling by the reduced rational rate
    ``up/down`` (same filter design + alignment as
    ``scipy.signal.resample_poly``'s default; parity asserted in
    tests/test_native_feats.py).  Returns None when the native library
    is unavailable — callers fall back to scipy."""
    import math

    lib = get_lib()
    if lib is None:
        return None
    g = math.gcd(int(up), int(down))
    up, down = int(up) // g, int(down) // g
    n = len(wavs)
    if n == 0:
        return []
    wavs32 = [np.ascontiguousarray(w, dtype=np.float32) for w in wavs]
    outs = [
        np.empty(int(lib.msa_resample_len(len(w), up, down)), np.float32)
        for w in wavs32
    ]
    wav_ptrs = (ctypes.c_void_p * n)(
        *[w.ctypes.data_as(ctypes.c_void_p).value for w in wavs32]
    )
    out_ptrs = (ctypes.c_void_p * n)(
        *[o.ctypes.data_as(ctypes.c_void_p).value for o in outs]
    )
    lens = (ctypes.c_int64 * n)(*[len(w) for w in wavs32])
    if n_threads is None:
        n_threads = min(os.cpu_count() or 1, 16)
    rc = lib.msa_resample_batch(
        wav_ptrs, lens, n, up, down, out_ptrs, n_threads
    )
    if rc != 0:
        return None
    return outs


def resample(wav: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray | None:
    """Single-signal convenience over :func:`resample_batch`."""
    out = resample_batch([wav], target_sr, orig_sr, n_threads=1)
    return None if out is None else out[0]


def trim_slice(
    wav: np.ndarray, ref_level_db: float = 26,
    frame_length: int = 1024, hop_length: int = 256,
):
    """Native trim bounds (librosa.effects.trim semantics); None when the
    library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    w = np.ascontiguousarray(wav, dtype=np.float32)
    start = ctypes.c_int64()
    end = ctypes.c_int64()
    lib.msa_trim(
        w.ctypes.data_as(ctypes.c_void_p), len(w), float(ref_level_db),
        frame_length, hop_length, ctypes.byref(start), ctypes.byref(end),
    )
    return int(start.value), int(end.value)
