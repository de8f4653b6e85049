"""Host data-pipeline benchmark: native C++ feature runtime vs numpy.

Measures dataset-cache construction DSP (trim + STFT + mel + log) over a
batch of ~6 s utterances — the host-side cost every trainer pays once per
corpus (and the reference pays EVERY epoch, since it runs the STFT inside
its collate function, msa_tts/dataloaders/dataloader_default.py:137).

Rows: numpy (sequential, the fallback path), native 1 thread, native N
threads.  Audio I/O is excluded — both paths consume in-memory float32
waveforms, so this isolates the DSP.

Run: python benchmarks/feats_pipeline.py [--n 64] [--threads N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from msa_tts_tpu.native import extract_logmels_batch, native_available  # noqa: E402
from msa_tts_tpu.ops import audio as A  # noqa: E402

AP = dict(
    sample_rate=22050, n_fft=1024, win_length=1024, hop_length=256,
    f_min=0.0, f_max=8000.0, n_mels=80,
)


def make_wavs(n: int, dur_s: float = 6.0, seed: int = 0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        w = rng.standard_normal(int(22050 * dur_s)).astype(np.float32)
        w[: 22050 // 4] *= 1e-4   # leading quiet margin so trim works
        w[-22050 // 4:] *= 1e-4
        out.append(w * 0.5)
    return out


def time_numpy(wavs):
    t0 = time.time()
    for w in wavs:
        w = A.trim_margin_silence(w, ref_level_db=26)
        A.melspec_ap(w, AP, xp=np)
    return time.time() - t0


def time_native(wavs, threads):
    t0 = time.time()
    out = extract_logmels_batch(
        wavs, "ap", AP, trim_margin_silence=True, ref_level_db=26,
        n_threads=threads,
    )
    assert out is not None
    return time.time() - t0


def run_resample(n: int, threads: int):
    """Resample benchmark: scipy.resample_poly sequential vs the native
    threaded polyphase engine, 48 kHz → 22.05 kHz (the prepare_vctk
    rate; reference fans this out over a ProcessPool×20,
    msa_tts/data_processing/prepare_vctk.py:64)."""
    from scipy.signal import resample_poly

    from msa_tts_tpu.native import resample_batch

    rng = np.random.default_rng(1)
    wavs = [
        rng.standard_normal(48000 * 6).astype(np.float32)
        for _ in range(n)
    ]
    total_audio_s = n * 6.0
    resample_batch(wavs[:2], 147, 320)  # warmup/compile-cache
    rows = []
    for name, fn in [
        ("scipy_sequential",
         lambda: [resample_poly(w, 147, 320) for w in wavs]),
        ("native_1_thread",
         lambda: resample_batch(wavs, 147, 320, n_threads=1)),
        (f"native_{threads}_threads",
         lambda: resample_batch(wavs, 147, 320, n_threads=threads)),
    ]:
        t0 = time.time()
        fn()
        dt1 = time.time() - t0
        t0 = time.time()
        fn()
        dt = min(dt1, time.time() - t0)
        rows.append({
            "impl": "resample_" + name,
            "seconds": round(dt, 3),
            "audio_sec_per_sec": round(total_audio_s / dt, 1),
        })
        print(json.dumps(rows[-1]))
    print(json.dumps({
        "resample_speedup_vs_scipy": round(
            rows[0]["seconds"] / rows[-1]["seconds"], 2
        ),
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--threads", type=int,
                    default=min(os.cpu_count() or 1, 16))
    ap.add_argument("--resample", action="store_true",
                    help="benchmark the polyphase resampler instead")
    args = ap.parse_args()

    if not native_available():
        print(json.dumps({"error": "native lib unavailable"}))
        return

    if args.resample:
        run_resample(args.n, args.threads)
        return

    wavs = make_wavs(args.n)
    total_audio_s = sum(len(w) for w in wavs) / 22050.0

    # warmup (compile cache load, numpy fbank lru)
    time_native(wavs[:2], 1)
    time_numpy(wavs[:2])

    rows = []
    for name, fn in [
        ("numpy_sequential", lambda: time_numpy(wavs)),
        ("native_1_thread", lambda: time_native(wavs, 1)),
        (f"native_{args.threads}_threads",
         lambda: time_native(wavs, args.threads)),
    ]:
        dt = min(fn() for _ in range(2))
        rows.append({
            "impl": name,
            "seconds": round(dt, 3),
            "utterances_per_sec": round(args.n / dt, 1),
            "audio_sec_per_sec": round(total_audio_s / dt, 1),
        })
        print(json.dumps(rows[-1]))
    speedup = rows[0]["seconds"] / rows[-1]["seconds"]
    print(json.dumps({"speedup_vs_numpy": round(speedup, 1),
                      "n_utterances": args.n,
                      "threads": args.threads}))


if __name__ == "__main__":
    main()
