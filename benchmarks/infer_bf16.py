"""Serving inference precision benchmark: fp32 vs ``infer_dtype: bfloat16``.

    python benchmarks/infer_bf16.py [--steps 400] [--batch 16]

The autoregressive decode is HBM-bound streaming the decoder weights
every step (BENCHMARKS.md MFU analysis), so halving the weight width
should cut per-step time toward 2x.  Measures single-utterance and
batched ``synthesize`` wall-clock on the real chip at full NVIDIA dims,
plus the numeric drift (max |mel diff| and in-jit MCD) between the two
precisions on identical weights/text — the quality-risk number a
deployment needs before flipping the flag.

No reference counterpart (torch eager fp32-only inference,
msa_tts/infer.py).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from serving_http import SENTENCES, build_tts  # noqa: E402


def _time_synth(tts, texts, emb, n_rep=3):
    from msa_tts_tpu.serving import AdaptiveTTS  # noqa: F401

    # warm (compile)
    mels = tts.synthesize_batch(texts, vocoder="none", spk_emb=emb)
    t0 = time.monotonic()
    for _ in range(n_rep):
        mels = tts.synthesize_batch(texts, vocoder="none", spk_emb=emb)
        np.asarray(mels[0])  # force device->host (relay sync)
    dt = (time.monotonic() - t0) / n_rep
    frames = sum(m.shape[-1] for m in mels)
    return dt, frames, mels


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--r", type=int, default=2,
                    help="n_frames_per_step (shipped default 2); steps "
                         "are divided by r for constant audio length")
    args = ap.parse_args()

    from msa_tts_tpu.serving import AdaptiveTTS
    from msa_tts_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    tts32 = build_tts(args.steps, r=args.r)
    # build_tts's params carry no infer_dtype key → the shipped default
    # (auto, round 5); pin the static rows explicitly
    tts32.params = dict(tts32.params)
    tts32 = AdaptiveTTS(
        dict(tts32.params, infer_dtype="float32"),
        tts32.model_params, tts32.model_state,
    )
    tts16 = AdaptiveTTS(
        dict(tts32.params, infer_dtype="bfloat16"),
        tts32.model_params, tts32.model_state,
    )
    ttsauto = AdaptiveTTS(
        dict(tts32.params, infer_dtype="auto"),
        tts32.model_params, tts32.model_state,
    )
    emb = np.zeros((64,), np.float32)

    rows = []
    for label, tts in (("fp32", tts32), ("bf16", tts16),
                       ("auto", ttsauto)):
        dt1, fr1, m1 = _time_synth(tts, SENTENCES[:1], emb)
        dtb, frb, mb = _time_synth(
            tts, (SENTENCES * args.batch)[: args.batch], emb
        )
        rows.append((label, dt1, fr1, dtb, frb, m1[0]))
        print(f"{label}: single {dt1:.3f}s ({fr1 / dt1:,.0f} frames/s)  "
              f"batch={args.batch} {dtb:.3f}s ({frb / dtb:,.0f} frames/s)",
              flush=True)

    ((l32, s32, f32, b32, fb32, mel32),
     (l16, s16, f16, b16, fb16, mel16),
     (la, sa, fa, ba, fba, mela)) = rows
    n = min(mel32.shape[-1], mel16.shape[-1])
    drift = float(np.max(np.abs(mel32[:, :n] - mel16[:, :n])))
    from msa_tts_tpu.ops.metrics import mcd

    mcd_v = float(mcd(mel32[:, :n].T, mel16[:, :n].T, xp=np))
    print(f"\nspeedup: single {s32 / s16:.2f}x, batch {b32 / b16:.2f}x")
    print(f"auto (shipped default) vs best static: "
          f"single {min(s32, s16) / sa:.2f}x, "
          f"batch {min(b32, b16) / ba:.2f}x of best")
    print(f"drift vs fp32 (same weights/text): max|dmel|={drift:.4f}, "
          f"MCD={mcd_v:.4f}")


if __name__ == "__main__":
    main()
