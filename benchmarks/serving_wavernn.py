"""WaveRNN serving benchmark on the real TPU chip (axon platform).

Measures generation rate (kHz, ×realtime) for a ~6 s utterance at the
reference's full dims (rnn 512, 80 mels, hop 256, MOL, aux net) across
the two optimization axes:

  * weight dtype in the sample loop (fp32 vs bf16) — the loop re-reads
    ~15 MB of GRU/FC weights per timestep, so it is HBM-bandwidth bound;
  * fold target length — folding the utterance into MORE parallel
    segments means FEWER sequential scan steps at the same per-step cost
    (weights dominate the bytes, not activations), at the price of a
    larger crossfade-overlap fraction.

Timing note: on the axon relay jax.block_until_ready returns early, so
rates are computed after np.asarray (a real device→host transfer) —
generate() itself times it that way.

Run: python benchmarks/serving_wavernn.py [--quick]
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

import jax  # noqa: E402

from msa_tts_tpu.vocoders.wavernn import WaveRNN, WaveRNNConfig

CFG = WaveRNNConfig(
    mode="MOL", n_mels=80, rnn_dims=512, fc_dims=512, compute_dims=128,
    res_out_dims=128, res_blocks=10, hop_length=256, sample_rate=22050,
    pad=2, upsample_factors=(4, 8, 8),
)

T_MEL = 517  # (T_MEL-1)*256 = 132096 samples ≈ 5.99 s at 22.05 kHz


def run_variant(gen_dtype, target, overlap, n_timed=3):
    voc = WaveRNN(cfg=CFG, rng=jax.random.PRNGKey(0), gen_dtype=gen_dtype)
    mels = np.random.default_rng(0).standard_normal(
        (1, CFG.n_mels, T_MEL)
    ).astype(np.float32) * 0.1

    def once():
        t0 = time.time()
        wav = voc.generate(
            mels, batched=True, target=target, overlap=overlap,
            rng=jax.random.PRNGKey(1), verbose=False,
        )
        dt = time.time() - t0  # generate() materializes via np.asarray
        return wav, dt

    wav, _ = once()  # compile
    assert np.isfinite(wav).all()
    times = [once()[1] for _ in range(n_timed)]
    dt = min(times)
    n = wav.shape[0]
    rate_khz = n / dt / 1000.0
    x_rt = rate_khz * 1000.0 / CFG.sample_rate
    row = {
        "gen_dtype": gen_dtype or "float32",
        "target": target,
        "overlap": overlap,
        "samples": int(n),
        "seconds": round(dt, 3),
        "rate_khz": round(rate_khz, 1),
        "x_realtime": round(x_rt, 2),
    }
    print(json.dumps(row))
    return row


def run_batch_variant(gen_dtype, n_utts, target, overlap, n_timed=3):
    """Multi-utterance batched generation: all utterances' folds in one
    sample scan (WaveRNN.generate_batch)."""
    voc = WaveRNN(cfg=CFG, rng=jax.random.PRNGKey(0), gen_dtype=gen_dtype)
    rng = np.random.default_rng(0)
    mels = [
        rng.standard_normal((CFG.n_mels, T_MEL)).astype(np.float32) * 0.1
        for _ in range(n_utts)
    ]

    def once():
        t0 = time.time()
        outs = voc.generate_batch(
            mels, target=target, overlap=overlap,
            rng=jax.random.PRNGKey(1), verbose=False,
        )
        return outs, time.time() - t0

    outs, _ = once()  # compile
    assert all(np.isfinite(o).all() for o in outs)
    dt = min(once()[1] for _ in range(n_timed))
    n = sum(len(o) for o in outs)
    rate_khz = n / dt / 1000.0
    row = {
        "mode": f"batch_x{n_utts}",
        "gen_dtype": gen_dtype or "float32",
        "target": target,
        "overlap": overlap,
        "samples": int(n),
        "seconds": round(dt, 3),
        "rate_khz": round(rate_khz, 1),
        "x_realtime": round(rate_khz * 1000.0 / CFG.sample_rate, 2),
    }
    print(json.dumps(row))
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="only the round-1 config and the tuned config")
    ap.add_argument("--batch", action="store_true",
                    help="multi-utterance batched-generation variants")
    args = ap.parse_args()

    if args.batch:
        rows = [
            run_batch_variant("bfloat16", 4, 2_750, 550),
            run_batch_variant("bfloat16", 8, 2_750, 550),
            run_batch_variant("bfloat16", 8, 5_500, 550),
        ]
        best = max(rows, key=lambda r: r["x_realtime"])
        print(json.dumps({"best": best}))
        return

    variants = [
        (None, 11_000, 550),        # round-1 configuration (fp32)
        ("bfloat16", 11_000, 550),  # dtype axis alone
        ("bfloat16", 2_750, 550),   # + 4x more parallel folds
        ("bfloat16", 1_375, 275),   # + 8x folds, tighter overlap
    ]
    if args.quick:
        variants = [variants[0], variants[-1]]
    rows = [run_variant(*v) for v in variants]
    best = max(rows, key=lambda r: r["x_realtime"])
    print(json.dumps({"best": best}))


if __name__ == "__main__":
    main()
