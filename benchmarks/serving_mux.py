"""Continuous-batching stream multiplexer: aggregate streaming capacity.

BENCHMARKS.md's streaming table is single-stream; with K concurrent
/synthesize_stream clients the per-stream server time-slices the device
(each chunk's ``next()`` takes the device lock), so aggregate capacity
equals single-stream capacity.  ``stream_mux.py`` instead decodes up to
``--slots`` live streams in ONE Pallas segment-kernel call per tick —
the autoregressive-TTS analogue of LLM continuous batching.

This measures K concurrent streaming clients against the same server
with the mux off (time-sliced) and on, per vocoder:

- per-stream TTFA and total latency (median over clients),
- aggregate wall time for all K streams,
- aggregate realtime factor (sum of audio seconds / wall).

Run: python benchmarks/serving_mux.py [--slots 4] [--steps 400]
Timing: every timed region ends in an HTTP body read, which forces the
device→host transfer chain (axon relay sync caveat, SKILL.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from serving_http import SENTENCES, build_tts  # noqa: E402
from serving_stream import attach_vocoders  # noqa: E402


def stream_once(port: int, vocoder: str, text: str):
    """(ttfa_s, total_s, audio_s) for one streaming request."""
    body = json.dumps({"text": text, "vocoder": vocoder}).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/synthesize_stream", data=body,
        headers={"Content-Type": "application/json"},
    )
    nbytes = 0
    t0 = time.monotonic()
    with urllib.request.urlopen(req, timeout=900) as r:
        assert r.status == 200
        r.read(44)
        first = r.read(4096)
        ttfa = time.monotonic() - t0
        nbytes = len(first)
        while True:
            b = r.read(65536)
            if not b:
                break
            nbytes += len(b)
        total = time.monotonic() - t0
    assert first, "no audio chunk"
    return ttfa, total, nbytes / 2 / 22050.0


def concurrent_streams(port: int, vocoder: str, k: int):
    res = [None] * k
    barrier = threading.Barrier(k + 1)

    def worker(i):
        barrier.wait()
        res[i] = stream_once(port, vocoder, SENTENCES[i % len(SENTENCES)])

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(k)]
    for t in threads:
        t.start()
    barrier.wait()
    t0 = time.monotonic()
    for t in threads:
        t.join()
    wall = time.monotonic() - t0
    ttfas = [r[0] for r in res]
    totals = [r[1] for r in res]
    audio = sum(r[2] for r in res)
    return (float(np.median(ttfas)), float(np.median(totals)),
            wall, audio)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=4)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--vocoders", default="griffinlim,hifigan")
    ap.add_argument("--backend", default="auto",
                    choices=["auto", "pallas", "xla"])
    ap.add_argument("--skip_sliced", action="store_true",
                    help="measure only the muxed mode")
    args = ap.parse_args()

    from msa_tts_tpu.server import TTSServer
    from msa_tts_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    tts = build_tts(args.steps)
    attach_vocoders(tts)
    emb = np.zeros(
        tts.params["model"]["speaker_embedding_dim"], np.float32
    )
    vocs = args.vocoders.split(",")
    out = {"slots": args.slots, "steps": args.steps, "rows": []}
    modes = (args.slots,) if args.skip_sliced else (0, args.slots)
    for mux_n in modes:
        server = TTSServer(
            tts, default_spk_emb=emb, stream_multiplex=mux_n,
            stream_mux_t_cap=128, stream_mux_backend=args.backend,
        )
        port = server.start()
        if mux_n:
            if server.stream_mux is None:
                raise RuntimeError(
                    "mux did not come up — config unsupported"
                )
            mode = f"mux={mux_n}/{server.stream_mux.backend}"
        else:
            mode = "time-sliced"
        for voc in vocs:
            stream_once(port, voc, SENTENCES[0])       # warm compiles
            concurrent_streams(port, voc, args.slots)  # warm all slots
            ttfa, total, wall, audio = concurrent_streams(
                port, voc, args.slots
            )
            row = dict(mode=mode, vocoder=voc, k=args.slots,
                       ttfa_p50_s=round(ttfa, 3),
                       total_p50_s=round(total, 3),
                       wall_s=round(wall, 3),
                       aggregate_rt=round(audio / wall, 1))
            out["rows"].append(row)
            print(f"{mode:>12} {voc:>11} k={args.slots} "
                  f"ttfa={ttfa:6.3f}s total={total:6.3f}s "
                  f"wall={wall:6.3f}s agg={audio / wall:6.1f}x rt")
        server.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
