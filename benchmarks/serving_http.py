"""HTTP serving load benchmark: throughput/latency with and without
dynamic batching, full-dim model on one chip.

    python benchmarks/serving_http.py [--n 64] [--conc 8]

Measures end-to-end POST /synthesize round trips (G2P + batched AR
decode + Griffin-Lim + wav encode) at ``--conc`` concurrent clients,
comparing ``window_ms=0`` (per-request execution) against dynamic
batching (``window_ms=25``), and prints a summary table plus the
server-side batching stats.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time
import urllib.request

import jax
import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


SENTENCES = [
    "The quick brown fox jumps over the lazy dog.",
    "She sells seashells by the seashore.",
    "A journey of a thousand miles begins with a single step.",
    "To be or not to be, that is the question.",
]


def build_tts(max_decoder_steps: int = 400, r: int = 1):
    """Full-dim serving model.  ``r`` (n_frames_per_step): the shipped
    example configs default to r=2 (BENCHMARKS.md "Shipped headline
    moves to r=2"); ``max_decoder_steps`` is divided by ``r`` so a
    given --steps produces the SAME audio length at any r (the honest
    comparison — r=2 reaches it in half the sequential steps)."""
    from msa_tts_tpu.dataloaders.synthetic import synthetic_params
    from msa_tts_tpu.models import config_from_params, init_tacotron2nv
    from msa_tts_tpu.serving import AdaptiveTTS
    from msa_tts_tpu.utils.g2p.char_list import N_SYMBOLS

    params = synthetic_params("/tmp/unused", n_speakers=1)
    mp = dict(params["model"])
    # full NVIDIA dims — the BENCHMARKS.md serving configuration
    mp.update(
        symbols_embedding_dim=512, encoder_embedding_dim=512,
        encoder_n_convolutions=3, attention_rnn_dim=1024,
        decoder_rnn_dim=1024, prenet_dim=256,
        postnet_embedding_dim=512, postnet_n_convolutions=5,
        max_decoder_steps=max_decoder_steps // r,
        n_frames_per_step=r,
        decoder_no_early_stopping=True,
        n_mel_channels=params["audio_params"]["n_mels"],
        n_symbols=N_SYMBOLS, num_speakers=1,
    )
    params["model"] = mp
    cfg = config_from_params(mp)
    p0, s0 = init_tacotron2nv(jax.random.PRNGKey(0), cfg)
    # Random-init gate logits sit near 0, so fp noise decides whether
    # the stop gate fires at step 0 — when it does, outputs trim to one
    # frame and every timing row measures vocoding ~nothing (a previous
    # run's numbers then aren't comparable).  Bias the gate hard
    # negative so the decode deterministically runs to the step cap.
    p0["decoder"]["gate_layer"]["bias"] = (
        p0["decoder"]["gate_layer"]["bias"] - 10.0
    )
    return AdaptiveTTS(params, p0, s0)


def run_load(port: int, n: int, conc: int, vocoder: str | None = None,
             timeout: float = 600) -> list[float]:
    lat: list[float] = []
    lock = threading.Lock()
    idx = iter(range(n))

    def worker():
        while True:
            with lock:
                try:
                    i = next(idx)
                except StopIteration:
                    return
            payload = {"text": SENTENCES[i % len(SENTENCES)]}
            if vocoder is not None:
                payload["vocoder"] = vocoder
            body = json.dumps(payload).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/synthesize", data=body,
                headers={"Content-Type": "application/json"},
            )
            t0 = time.monotonic()
            with urllib.request.urlopen(req, timeout=timeout) as r:
                assert r.status == 200
                r.read()
            with lock:
                lat.append(time.monotonic() - t0)

    threads = [threading.Thread(target=worker) for _ in range(conc)]
    t0 = time.monotonic()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.monotonic() - t0
    return lat, wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--conc", type=int, default=8)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--r", type=int, default=2,
                    help="n_frames_per_step (2 = shipped default; "
                         "same audio length in half the AR steps)")
    args = ap.parse_args()

    from msa_tts_tpu.server import TTSServer

    tts = build_tts(args.steps, r=args.r)
    emb = np.zeros(
        tts.params["model"]["speaker_embedding_dim"], np.float32
    )

    rows = []
    for label, window in (("no batching", 0.0), ("batching 25ms", 25.0)):
        server = TTSServer(
            tts, default_spk_emb=emb, window_ms=window,
            max_batch=args.conc,
        )
        port = server.start()
        # pre-compile every (batch bucket × text bucket) program
        server.warmup(SENTENCES)
        lat, wall = run_load(port, args.n, args.conc)
        snap = server.stats.snapshot()
        server.stop()
        lat.sort()
        rows.append(
            (label, args.n / wall, lat[len(lat) // 2],
             lat[int(0.95 * len(lat))], snap["mean_batch_size"])
        )

    print(f"\n{args.n} requests, {args.conc} concurrent clients, "
          f"{args.steps} decoder steps:")
    print(f"{'config':>15} {'req/s':>8} {'p50 s':>8} {'p95 s':>8} "
          f"{'mean batch':>11}")
    for label, rps, p50, p95, mb in rows:
        print(f"{label:>15} {rps:8.2f} {p50:8.3f} {p95:8.3f} "
              f"{mb if mb else 0:11.2f}")
    speedup = rows[1][1] / rows[0][1]
    print(f"\nbatched/unbatched throughput: {speedup:.2f}x")


if __name__ == "__main__":
    main()
