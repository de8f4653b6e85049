"""Serving with the real vocoders + streaming time-to-first-audio, on
the TPU chip.

Round-2 serving numbers covered only Griffin-Lim end to end
(BENCHMARKS.md); this benchmark closes the gap with two tables:

1. **Batched serving per vocoder** — POST /synthesize through the
   dynamic batcher for griffinlim / hifigan / wavernn (the reference's
   three vocoders, msa_tts/infer.py:311-328): req/s, p50, p95 at
   ``--conc`` concurrent clients.
2. **Streaming TTFA** — POST /synthesize_stream: time-to-first-audio
   chunk vs total latency per vocoder.  The point of the streaming path
   is TTFA ≪ total; this prints both and the ratio.

Vocoder weights are random (throughput/latency is weight-independent);
HiFi-GAN uses the universal v1 config whose upsample product matches
hop=256, WaveRNN the reference dims (msa_tts/utils/wavernn).

Run: python benchmarks/serving_stream.py [--n 24] [--conc 4] [--steps 400]
Timing: on the axon relay every timed region ends in a device→host
transfer (``r.read()`` of the HTTP body forces one).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax  # noqa: E402

from serving_http import SENTENCES, build_tts, run_load  # noqa: E402


H_V1 = dict(
    resblock="1",
    upsample_rates=[8, 8, 2, 2],
    upsample_kernel_sizes=[16, 16, 4, 4],
    upsample_initial_channel=512,
    resblock_kernel_sizes=[3, 7, 11],
    resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5], [1, 3, 5]],
)

WR_DIMS = dict(
    voc_mode="MOL", rnn_dims=512, fc_dims=512, compute_dims=128,
    res_out_dims=128, res_blocks=10, pad=2, upsample_factors=(4, 8, 8),
)


def attach_vocoders(tts):
    from msa_tts_tpu.vocoders.hifigan import HiFiGAN, init_generator
    from msa_tts_tpu.vocoders.wavernn import WaveRNN

    n_mels = tts.params["audio_params"]["n_mels"]
    hop = tts.params["audio_params"].get(
        "hop_length", tts.params["audio_params"].get("hop_size")
    )
    h = dict(H_V1)
    assert int(np.prod(h["upsample_rates"])) == hop, (
        h["upsample_rates"], hop
    )
    gen = init_generator(jax.random.PRNGKey(0), h, n_mels=n_mels)
    tts.attach_vocoder("hifigan", HiFiGAN.from_params(gen, h))

    wr = dict(WR_DIMS)
    assert int(np.prod(wr["upsample_factors"])) == hop
    tts.attach_vocoder(
        "wavernn",
        WaveRNN(
            rng=jax.random.PRNGKey(1),
            audio_params=dict(
                n_mels=n_mels, hop_length=hop,
                sample_rate=tts.params["audio_params"]["sample_rate"],
            ),
            **wr,
        ),
    )


def measure_stream(port: int, vocoder: str, text: str, n: int = 3):
    """(ttfa, total) medians over n streaming requests."""
    ttfas, totals = [], []
    for _ in range(n):
        body = json.dumps({"text": text, "vocoder": vocoder}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/synthesize_stream", data=body,
            headers={"Content-Type": "application/json"},
        )
        t0 = time.monotonic()
        with urllib.request.urlopen(req, timeout=900) as r:
            assert r.status == 200
            # read the 44-byte header, then the first audio chunk
            r.read(44)
            first = r.read(4096)
            ttfa = time.monotonic() - t0
            while r.read(65536):
                pass
            total = time.monotonic() - t0
        assert first, "no audio chunk"
        ttfas.append(ttfa)
        totals.append(total)
    return float(np.median(ttfas)), float(np.median(totals))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=24)
    ap.add_argument("--conc", type=int, default=4)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--r", type=int, default=2,
                    help="n_frames_per_step (2 = shipped default; "
                         "same audio length in half the AR steps)")
    ap.add_argument("--skip_wavernn_load", action="store_true",
                    help="skip the batched-load wavernn row (slowest)")
    args = ap.parse_args()

    from msa_tts_tpu.server import TTSServer
    from msa_tts_tpu.utils.compile_cache import enable_compilation_cache

    # serving compiles ~a dozen (batch bucket × text bucket × vocoder)
    # programs; persist them so reruns measure steady state, not compiles
    enable_compilation_cache()

    tts = build_tts(args.steps, r=args.r)
    attach_vocoders(tts)
    emb = np.zeros(
        tts.params["model"]["speaker_embedding_dim"], np.float32
    )
    server = TTSServer(
        tts, default_spk_emb=emb, window_ms=25.0, max_batch=args.conc,
    )
    port = server.start()
    server.warmup(SENTENCES)

    vocs = ["griffinlim", "hifigan"] + (
        [] if args.skip_wavernn_load else ["wavernn"]
    )
    rows = []
    for voc in vocs:
        # warm every program the measured load will hit: batch buckets
        # up to --conc for this vocoder (first hits compile)
        run_load(port, 2 * args.conc, args.conc, voc, timeout=900)
        lat, wall = run_load(port, args.n, args.conc, voc, timeout=900)
        lat.sort()
        rows.append((voc, args.n / wall, lat[len(lat) // 2],
                     lat[int(0.95 * len(lat))]))

    print(f"\nbatched serving — {args.n} requests, {args.conc} "
          f"concurrent, {args.steps} decoder steps:")
    print(f"{'vocoder':>12} {'req/s':>8} {'p50 s':>8} {'p95 s':>8}")
    for voc, rps, p50, p95 in rows:
        print(f"{voc:>12} {rps:8.2f} {p50:8.3f} {p95:8.3f}")

    text = SENTENCES[2]
    print(f"\nstreaming TTFA (single stream, {args.steps} steps):")
    print(f"{'vocoder':>12} {'TTFA s':>8} {'total s':>9} {'ratio':>7}")
    stream_rows = []
    for voc in ["griffinlim", "hifigan", "wavernn"]:
        measure_stream(port, voc, text, n=1)      # warm compile
        ttfa, total = measure_stream(port, voc, text)
        stream_rows.append((voc, ttfa, total))
        print(f"{voc:>12} {ttfa:8.3f} {total:9.3f} "
              f"{ttfa / total:7.2%}")

    server.stop()
    print(json.dumps({
        "batched": [
            {"vocoder": v, "req_per_s": round(r, 2),
             "p50_s": round(a, 3), "p95_s": round(b, 3)}
            for v, r, a, b in rows
        ],
        "streaming": [
            {"vocoder": v, "ttfa_s": round(t, 3),
             "total_s": round(tt, 3)}
            for v, t, tt in stream_rows
        ],
    }))


if __name__ == "__main__":
    main()
