"""HiFi-GAN serving benchmark on the real TPU chip (axon platform).

The reference serves HiFi-GAN as one of its three vocoders
(msa_tts/infer.py:311-328 via msa_tts/utils/hifigan/hifigan.py:20).
Unlike WaveRNN it is fully convolutional — one feed-forward pass per
utterance, no sample-level recurrence — so on TPU it should run multiple
orders of magnitude faster than realtime.  This benchmark records that
number next to the WaveRNN one so the serving story covers both.

Axes measured:

  * compute dtype (fp32 vs bf16 params+activations, fp32 final tanh);
  * batch size (single-stream latency vs batched throughput).

Config: standard HiFi-GAN v1 (universal) — upsample 8·8·2·2 = 256 = hop,
initial channel 512, ResBlock1 kernels (3, 7, 11).

Timing note: on the axon relay ``jax.block_until_ready`` returns early,
so every timed call ends in ``np.asarray`` (a real device→host
transfer).

Run: python benchmarks/serving_hifigan.py [--quick]
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
import jax.numpy as jnp  # noqa: E402

from msa_tts_tpu.vocoders.hifigan import (  # noqa: E402
    generator_apply,
    init_generator,
)

H_V1 = dict(
    resblock="1",
    upsample_rates=[8, 8, 2, 2],
    upsample_kernel_sizes=[16, 16, 4, 4],
    upsample_initial_channel=512,
    resblock_kernel_sizes=[3, 7, 11],
    resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5], [1, 3, 5]],
)

SAMPLE_RATE = 22050
HOP = 256
T_MEL = 517  # 517·256 = 132352 samples ≈ 6.0 s at 22.05 kHz


def run_variant(dtype: str, batch: int, n_timed: int = 5) -> dict:
    params = init_generator(jax.random.PRNGKey(0), H_V1, n_mels=80)
    mel = np.random.default_rng(0).standard_normal(
        (batch, 80, T_MEL)
    ).astype(np.float32) * 0.1

    if dtype == "bfloat16":
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16), params
        )
        mel = mel.astype(jnp.bfloat16)

    apply_jit = jax.jit(lambda p, m: generator_apply(p, H_V1, m))
    mel_dev = jax.device_put(mel)

    def once():
        t0 = time.time()
        wav = np.asarray(apply_jit(params, mel_dev), dtype=np.float32)
        return wav, time.time() - t0

    wav, _ = once()  # compile
    assert np.isfinite(wav).all()
    dt = min(once()[1] for _ in range(n_timed))
    n_samples = wav.shape[0] * wav.shape[1]
    rate_khz = n_samples / dt / 1000.0
    row = {
        "dtype": dtype,
        "batch": batch,
        "samples": int(n_samples),
        "seconds": round(dt, 4),
        "rate_khz": round(rate_khz, 1),
        "x_realtime": round(rate_khz * 1000.0 / SAMPLE_RATE, 1),
    }
    print(json.dumps(row))
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    variants = [
        ("float32", 1),
        ("bfloat16", 1),
        ("bfloat16", 8),
    ]
    if args.quick:
        variants = [variants[1]]
    rows = [run_variant(*v) for v in variants]
    best = max(rows, key=lambda r: r["x_realtime"])
    print(json.dumps({"best": best}))


if __name__ == "__main__":
    main()
