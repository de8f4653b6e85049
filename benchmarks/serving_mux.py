"""Continuous-batching stream multiplexer: aggregate streaming capacity.

BENCHMARKS.md's streaming table is single-stream; with K concurrent
/synthesize_stream clients the per-stream server time-slices the device
(each chunk's ``next()`` takes the device lock), so aggregate capacity
equals single-stream capacity.  ``stream_mux.py`` instead decodes up to
``--slots`` live streams in ONE batched segment call per tick — the
autoregressive-TTS analogue of LLM continuous batching.

Measures, per (slot count × engine × vocoder):

- per-stream TTFA and total latency (median over clients),
- aggregate wall time for all K streams,
- aggregate realtime factor (sum of audio seconds / wall),
- with ``--oversubscribe F``: K = F·slots clients (queueing behavior —
  TTFA then includes queue wait; /stats queue metrics recorded).

``--adapted`` runs the same protocol with K DISTINCT adapted voices
(serving.Voice, per-slot decoder weights on the XLA engine) — the
few-shot-product capacity row: without the adapted mux these streams
time-slice the device.

Run: python benchmarks/serving_mux.py [--slots 2,4,6,8] [--steps 400]
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


def stream_once(port: int, vocoder: str, text: str,
                voice: str | None = None):
    """(ttfa_s, total_s, audio_s) for one streaming request."""
    payload = {"text": text, "vocoder": vocoder}
    if voice is not None:
        payload["voice"] = voice
    body = json.dumps(payload).encode()
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


def concurrent_streams(port: int, vocoder: str, k: int,
                       voices=None):
    res = [None] * k
    barrier = threading.Barrier(k + 1)

    def worker(i):
        barrier.wait()
        res[i] = stream_once(
            port, vocoder, SENTENCES[i % len(SENTENCES)],
            voice=voices[i % len(voices)] if voices else None,
        )

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


def make_fake_voices(tts, n: int):
    """N distinct 'adapted' voices: base params perturbed at inner-loop
    scale (what k-shot adaptation produces), each with its own
    d-vector.  The perturbation magnitude doesn't affect throughput;
    distinctness is what forces per-slot weights."""
    from msa_tts_tpu.serving import Voice

    import jax

    voices = {}
    for i in range(n):
        rs = np.random.RandomState(100 + i)
        leaves, treedef = jax.tree.flatten(tts.model_params)
        perturbed = [
            np.asarray(x) + rs.normal(0, 1e-3, np.shape(x)).astype(
                np.asarray(x).dtype)
            for x in leaves
        ]
        emb_dim = tts.params["model"]["speaker_embedding_dim"]
        voices[f"v{i}"] = Voice(
            params=jax.tree.unflatten(treedef, perturbed),
            model_state=tts.model_state,
            spk_emb=rs.randn(emb_dim).astype(np.float32),
            support_loss=0.0,
        )
    return voices


def bench_mode(tts, emb, *, mux_n, backend, adapted, vocs, k,
               out_rows):
    from msa_tts_tpu.server import TTSServer

    server = TTSServer(
        tts, default_spk_emb=emb,
        stream_multiplex=mux_n,
        stream_mux_t_cap=128, stream_mux_backend=backend,
        stream_mux_adapted=(mux_n if adapted else 0),
    )
    voices = None
    if adapted:
        vmap_ = make_fake_voices(tts, max(mux_n, 1) if mux_n else k)
        for name, v in vmap_.items():
            server.register_voice(name, v)
        voices = sorted(vmap_.keys())
    port = server.start()
    try:
        if mux_n:
            mux = server.adapted_mux if adapted else server.stream_mux
            if mux is None:
                raise RuntimeError("mux did not come up")
            mode = f"mux={mux_n}/{mux.backend}"
            if adapted:
                mode += "/adapted"
        else:
            mode = "time-sliced" + ("/adapted" if adapted else "")
        for voc in vocs:
            # warm compiles then warm all slots
            stream_once(port, voc, SENTENCES[0],
                        voice=voices[0] if voices else None)
            concurrent_streams(port, voc, k, voices)
            ttfa, total, wall, audio = concurrent_streams(
                port, voc, k, voices
            )
            row = dict(mode=mode, vocoder=voc, k=k,
                       ttfa_p50_s=round(ttfa, 3),
                       total_p50_s=round(total, 3),
                       wall_s=round(wall, 3),
                       aggregate_rt=round(audio / wall, 1))
            if mux_n:
                row["mux_metrics"] = (
                    server.adapted_mux if adapted else server.stream_mux
                ).metrics()
            out_rows.append(row)
            print(f"{mode:>22} {voc:>11} k={k} "
                  f"ttfa={ttfa:6.3f}s total={total:6.3f}s "
                  f"wall={wall:6.3f}s agg={audio / wall:6.1f}x rt",
                  flush=True)
    finally:
        server.stop()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", default="4",
                    help="comma list of slot counts to sweep")
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--r", type=int, default=2,
                    help="n_frames_per_step (2 = shipped default; "
                         "same audio length in half the AR steps)")
    ap.add_argument("--vocoders", default="griffinlim,hifigan")
    ap.add_argument("--backends", default="auto",
                    help="comma list: auto,pallas,xla")
    ap.add_argument("--oversubscribe", type=float, default=1.0,
                    help="K = F*slots clients (queue-wait measurement)")
    ap.add_argument("--adapted", action="store_true",
                    help="K distinct adapted voices through the "
                         "per-slot-weights mux")
    ap.add_argument("--skip_sliced", action="store_true",
                    help="measure only the muxed mode")
    args = ap.parse_args()

    from msa_tts_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    tts = build_tts(args.steps, r=args.r)
    attach_vocoders(tts)
    emb = np.zeros(
        tts.params["model"]["speaker_embedding_dim"], np.float32
    )
    vocs = args.vocoders.split(",")
    slot_list = [int(s) for s in args.slots.split(",")]
    backends = args.backends.split(",")
    out = {"steps": args.steps, "adapted": args.adapted,
           "oversubscribe": args.oversubscribe, "rows": []}

    if not args.skip_sliced:
        k0 = max(int(round(slot_list[0] * args.oversubscribe)), 1)
        bench_mode(tts, emb, mux_n=0, backend="auto",
                   adapted=args.adapted, vocs=vocs, k=k0,
                   out_rows=out["rows"])
    for n in slot_list:
        k = max(int(round(n * args.oversubscribe)), 1)
        for be in backends:
            try:
                bench_mode(tts, emb, mux_n=n, backend=be,
                           adapted=args.adapted, vocs=vocs, k=k,
                           out_rows=out["rows"])
            except (ValueError, RuntimeError) as e:
                print(f"[skip] slots={n} backend={be}: {e}",
                      flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
