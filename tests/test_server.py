"""Serving layer: dynamic batcher semantics, shape-bucketed batched
synthesis, and the HTTP front end (all beyond the reference, which has
no serving at all)."""

import json
import threading
import urllib.request

import jax
import numpy as np
import pytest

from msa_tts_tpu.dataloaders.synthetic import synthetic_params
from msa_tts_tpu.models import config_from_params, init_tacotron2nv
from msa_tts_tpu.server import DynamicBatcher, ServerStats, TTSServer
from msa_tts_tpu.serving import AdaptiveTTS
from msa_tts_tpu.utils.g2p.char_list import N_SYMBOLS

SPK_DIM = 64


@pytest.fixture(scope="module")
def tts(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("srv"))
    params = synthetic_params(root, n_speakers=1)
    mp = dict(params["model"])
    mp["n_mel_channels"] = params["audio_params"]["n_mels"]
    mp["n_symbols"] = N_SYMBOLS
    mp["num_speakers"] = 1
    mp["max_decoder_steps"] = 20
    # random weights: the gate would fire at step 1 otherwise
    mp["decoder_no_early_stopping"] = True
    params["model"] = mp
    cfg = config_from_params(mp)
    p0, s0 = init_tacotron2nv(jax.random.PRNGKey(0), cfg)
    return AdaptiveTTS(params, p0, s0)


# ----------------------------------------------------------- batcher unit
def test_batcher_coalesces_queued_requests():
    calls = []

    def synth(texts, voice, vocoder, pad_batch_to):
        calls.append((tuple(texts), voice, vocoder, pad_batch_to))
        return [t.upper() for t in texts]

    b = DynamicBatcher(synth, max_batch=8, window_ms=50)
    futs = [b.submit(f"t{i}") for i in range(4)]  # queued before start
    b.start()
    results = [f.result(timeout=10) for f in futs]
    b.stop()

    assert results == ["T0", "T1", "T2", "T3"]
    assert len(calls) == 1  # one device call for all four
    assert calls[0][3] == 4  # snapped to the 4-bucket
    snap = b.stats.snapshot()
    assert snap["requests_total"] == 4
    assert snap["batches_total"] == 1
    assert snap["mean_batch_size"] == 4.0


def test_batcher_groups_by_voice_and_vocoder():
    calls = []

    def synth(texts, voice, vocoder, pad_batch_to):
        calls.append((tuple(texts), voice, vocoder))
        return list(texts)

    b = DynamicBatcher(synth, max_batch=8, window_ms=50)
    f1 = b.submit("a", voice="v1")
    f2 = b.submit("b", voice="v2")
    f3 = b.submit("c", voice="v1")
    b.start()
    for f in (f1, f2, f3):
        f.result(timeout=10)
    b.stop()

    keys = {(c[1], c[2]): c[0] for c in calls}
    assert keys[("v1", "griffinlim")] == ("a", "c")
    assert keys[("v2", "griffinlim")] == ("b",)
    assert len(calls) == 2


def test_batcher_error_propagates_per_request():
    def synth(texts, voice, vocoder, pad_batch_to):
        raise RuntimeError("device on fire")

    b = DynamicBatcher(synth, max_batch=4, window_ms=10)
    f = b.submit("x")
    b.start()
    with pytest.raises(RuntimeError, match="device on fire"):
        f.result(timeout=10)
    b.stop()
    assert b.stats.snapshot()["errors_total"] == 1


def test_bucket_snapping():
    b = DynamicBatcher(lambda *a: [], batch_buckets=(1, 2, 4, 8))
    assert [b.bucket(n) for n in (1, 2, 3, 5, 8, 9)] == [1, 2, 4, 8, 8, 8]


def test_stats_percentiles():
    s = ServerStats()
    for ms in (1, 2, 3, 4, 100):
        s.record_request(ms / 1e3, error=False)
    snap = s.snapshot()
    assert snap["latency_p50_s"] == pytest.approx(0.003)
    assert snap["latency_p95_s"] == pytest.approx(0.1)


# --------------------------------------------- batched synthesis padding
def test_synthesize_batch_shape_bucketing(tts):
    """Padded (B, T) synthesis returns exactly len(texts) results and is
    deterministic for a fixed rng."""
    texts = ["hello world", "hi"]
    kw = dict(
        spk_emb=np.zeros(SPK_DIM, np.float32), vocoder="none",
        text_pad_multiple=16, pad_batch_to=4,
        rng=jax.random.PRNGKey(7),
    )
    out1 = tts.synthesize_batch(texts, **kw)
    out2 = tts.synthesize_batch(texts, **kw)
    assert len(out1) == 2
    for a, b in zip(out1, out2):
        assert np.isfinite(a).all()
        np.testing.assert_array_equal(a, b)


# --------------------------------------------------------- http end-to-end
def test_http_server_end_to_end(tts):
    server = TTSServer(
        tts, default_spk_emb=np.zeros(SPK_DIM, np.float32),
        window_ms=10.0,
    )
    port = server.start()
    base = f"http://127.0.0.1:{port}"
    try:
        with urllib.request.urlopen(base + "/health", timeout=30) as r:
            health = json.loads(r.read())
            assert health["status"] == "ok"
            # the active phonemizer (and whether it's the degraded
            # rule-based fallback) is part of the health surface
            assert health["g2p_backend"] in (
                "espeak", "festival", "fallback", "segments"
            )
            assert health["g2p_degraded"] == (
                health["g2p_backend"] == "fallback"
            )
            # active compute paths are part of the health surface
            assert health["decode_backend"] in ("xla", "pallas")
            assert health["dp"] >= 1
            assert isinstance(health["vocoder_backends"], dict)

        req = urllib.request.Request(
            base + "/synthesize",
            data=json.dumps({"text": "hello world"}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            assert r.status == 200
            assert r.headers["Content-Type"] == "audio/wav"
            body = r.read()
        assert body[:4] == b"RIFF" and len(body) > 1000

        # concurrent requests coalesce while the worker is busy
        results = []

        def fire(i):
            rq = urllib.request.Request(
                base + "/synthesize",
                data=json.dumps({"text": f"hello number {i}"}).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(rq, timeout=600) as rr:
                results.append((rr.status, rr.read()[:4]))

        threads = [
            threading.Thread(target=fire, args=(i,)) for i in range(4)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert len(results) == 4
        assert all(s == 200 and h == b"RIFF" for s, h in results)

        snap = json.loads(
            urllib.request.urlopen(base + "/stats", timeout=30).read()
        )
        assert snap["requests_total"] == 5
        assert snap["errors_total"] == 0
        assert snap["batches_total"] <= snap["requests_total"]

        # malformed request → 400; unknown voice → 500
        bad = urllib.request.Request(
            base + "/synthesize", data=b'{"nope": 1}',
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=30)
        assert ei.value.code == 400

        unk = urllib.request.Request(
            base + "/synthesize",
            data=json.dumps({"text": "hi", "voice": "ghost"}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(unk, timeout=60)
        # unknown voice is a client error, validated at parse time
        assert ei.value.code == 400

        with urllib.request.urlopen(base + "/voices", timeout=30) as r:
            assert json.loads(r.read())["voices"] == []
    finally:
        server.stop()


# ------------------------------------------------------- voice storage
def test_voice_save_load_roundtrip(tts, tmp_path):
    import jax as _jax
    from msa_tts_tpu.serving import Voice

    v = Voice(
        params=tts.model_params, model_state=tts.model_state,
        spk_emb=np.arange(SPK_DIM, dtype=np.float32),
        support_loss=1.25,
    )
    path = str(tmp_path / "alice.voice")
    tts.save_voice(v, path)
    v2 = tts.load_voice(path)
    for a, b in zip(
        _jax.tree_util.tree_leaves(v.params),
        _jax.tree_util.tree_leaves(v2.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(v2.spk_emb, v.spk_emb)
    assert v2.support_loss == 1.25
    # a loaded voice synthesizes identically to the original
    kw = dict(vocoder="none", rng=jax.random.PRNGKey(3))
    m1 = tts.synthesize_batch(["hello"], v, **kw)[0]
    m2 = tts.synthesize_batch(["hello"], v2, **kw)[0]
    np.testing.assert_array_equal(m1, m2)


def test_server_cli_builds_and_serves(tts, tmp_path, monkeypatch):
    """The CLI main() wires experiment → server: exercise its voice-dir
    registration and default-speaker pickle paths via the same helpers
    (constructing main()'s server directly; the blocking serve loop is
    not entered)."""
    import pickle
    from msa_tts_tpu.serving import Voice

    # spk_emb.pkl in the reference's format
    emb_path = str(tmp_path / "spk_emb.pkl")
    with open(emb_path, "wb") as f:
        pickle.dump(
            {"spkA": {"mean": np.zeros(SPK_DIM, np.float32)}}, f
        )
    vdir = tmp_path / "voices"
    vdir.mkdir()
    tts.save_voice(
        Voice(tts.model_params, tts.model_state,
              np.zeros(SPK_DIM, np.float32), 0.0),
        str(vdir / "alice.voice"),
    )

    server = TTSServer(
        tts, default_spk_emb=np.zeros(SPK_DIM, np.float32),
        window_ms=5.0,
    )
    server.register_voice("alice", tts.load_voice(str(vdir / "alice.voice")))
    port = server.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/voices", timeout=30
        ) as r:
            assert json.loads(r.read())["voices"] == ["alice"]
        rq = urllib.request.Request(
            f"http://127.0.0.1:{port}/synthesize",
            data=json.dumps({"text": "hi", "voice": "alice"}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(rq, timeout=600) as r:
            assert r.status == 200 and r.read()[:4] == b"RIFF"
    finally:
        server.stop()


# ------------------------------------------------- review regressions
def test_batched_gl_length_matches_single(tts):
    """A request's wav length must not depend on whether it was batched:
    the batched Griffin-Lim path cuts to hop·(T−1), exactly the single-
    mel (centered istft) output length."""
    kw = dict(spk_emb=np.zeros(SPK_DIM, np.float32),
              rng=jax.random.PRNGKey(11))
    one = tts.synthesize_batch(["hello world"], **kw)[0]
    batch = tts.synthesize_batch(["hello world", "hi there"], **kw)
    assert batch[0].shape == one.shape


def test_batcher_stop_fails_queued_requests():
    """Requests still queued at shutdown get an immediate error, not a
    client-side timeout."""
    import time as _time

    def synth(texts, voice, vocoder, pad_batch_to):
        _time.sleep(0.3)
        return list(texts)

    b = DynamicBatcher(synth, max_batch=1, window_ms=0)
    b.start()
    f1 = b.submit("a")           # picked up, slow
    _time.sleep(0.05)
    f2 = b.submit("b")
    f3 = b.submit("c")
    b.stop()                      # sentinel lands between b/c processing
    # everything resolves promptly: either a result or a shutdown error
    done = 0
    for f in (f1, f2, f3):
        try:
            f.result(timeout=10)
            done += 1
        except RuntimeError as e:
            assert "shutting down" in str(e)
    assert done >= 1  # at least the in-flight one completed


def test_post_rejects_non_object_json(tts):
    server = TTSServer(
        tts, default_spk_emb=np.zeros(SPK_DIM, np.float32),
        window_ms=1.0,
    )
    port = server.start()
    try:
        for body in (b'"hello"', b"[1, 2]", b"42"):
            rq = urllib.request.Request(
                f"http://127.0.0.1:{port}/synthesize", data=body,
                headers={"Content-Type": "application/json"},
            )
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(rq, timeout=30)
            assert ei.value.code == 400, body
    finally:
        server.stop()


def test_warmup_without_default_voice(tts):
    """warmup falls back to a registered voice and no-ops (without
    crashing) when the server has no voice at all."""
    from msa_tts_tpu.serving import Voice

    bare = TTSServer(tts, window_ms=1.0)
    bare.warmup(["hi"])  # no default, no voices: notice, no crash

    srv = TTSServer(tts, window_ms=1.0)
    srv.register_voice(
        "only", Voice(tts.model_params, tts.model_state,
                      np.zeros(SPK_DIM, np.float32), 0.0)
    )
    srv.warmup(["hi"])  # uses the registered voice; must not raise


def test_http_streaming_endpoint(tts):
    """POST /synthesize_stream: chunked WAV response whose PCM payload
    decodes to the full utterance; the first chunk arrives before the
    stream completes (TTFA < total)."""
    import http.client
    import struct
    import time

    server = TTSServer(
        tts, default_spk_emb=np.zeros(SPK_DIM, np.float32),
        window_ms=5.0,
    )
    port = server.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
        body = json.dumps({"text": "hello world"})
        t0 = time.monotonic()
        conn.request(
            "POST", "/synthesize_stream", body,
            {"Content-Type": "application/json"},
        )
        resp = conn.getresponse()
        assert resp.status == 200
        assert resp.headers["Content-Type"] == "audio/wav"
        first = resp.read(44)            # WAV header
        t_first = time.monotonic() - t0
        assert first[:4] == b"RIFF" and first[8:12] == b"WAVE"
        rest = resp.read()
        t_total = time.monotonic() - t0
        assert len(rest) > 1000          # PCM16 audio followed
        pcm = np.frombuffer(rest, "<i2")
        assert np.isfinite(pcm.astype(np.float32)).all()
        sr = struct.unpack("<I", first[24:28])[0]
        assert sr == tts.params["audio_params"]["sample_rate"]
        assert t_first <= t_total
    finally:
        server.stop()


def test_unservable_vocoder_rejected_with_400(tts):
    """'none' (raw mel) and unattached neural vocoders must 400 on both
    endpoints — flattened mel bytes under audio/wav would be well-formed
    garbage; before this check they streamed with a 200."""
    server = TTSServer(
        tts, default_spk_emb=np.zeros(SPK_DIM, np.float32),
        window_ms=1.0,
    )
    port = server.start()
    try:
        for path in ("/synthesize", "/synthesize_stream"):
            for voc in ("none", "wavernn", "nonsense"):
                rq = urllib.request.Request(
                    f"http://127.0.0.1:{port}{path}",
                    data=json.dumps(
                        {"text": "hi", "vocoder": voc}
                    ).encode(),
                    headers={"Content-Type": "application/json"},
                )
                with pytest.raises(urllib.error.HTTPError) as ei:
                    urllib.request.urlopen(rq, timeout=30)
                assert ei.value.code == 400, (path, voc)
        assert server.servable_vocoders() == {"griffinlim"}
    finally:
        server.stop()


def test_streaming_requests_counted_in_stats(tts):
    """/synthesize_stream traffic must show up on /stats — a
    streaming-heavy deployment previously read as requests_total=0."""
    import http.client

    server = TTSServer(
        tts, default_spk_emb=np.zeros(SPK_DIM, np.float32),
        window_ms=1.0,
    )
    port = server.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
        conn.request(
            "POST", "/synthesize_stream", json.dumps({"text": "hi"}),
            {"Content-Type": "application/json"},
        )
        resp = conn.getresponse()
        assert resp.status == 200
        resp.read()
        snap = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/stats", timeout=30).read())
        assert snap["requests_total"] == 1
        assert snap["errors_total"] == 0

        # unknown voice → 400 at parse time (not a 500 from the
        # pipeline); parse-time rejections don't hit the synth stats
        conn2 = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn2.request(
            "POST", "/synthesize_stream",
            json.dumps({"text": "hi", "voice": "ghost"}),
            {"Content-Type": "application/json"},
        )
        assert conn2.getresponse().status == 400
        snap = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/stats", timeout=30).read())
        assert snap["requests_total"] == 1
        assert snap["errors_total"] == 0
    finally:
        server.stop()


def test_encode_wav_clips_like_streaming(tts):
    """Both endpoints apply the same limiter to out-of-range audio:
    hard clip (streaming cannot peak-normalize — the peak isn't known
    until the last chunk), so one utterance sounds identical from
    either endpoint."""
    server = TTSServer(tts, default_spk_emb=np.zeros(SPK_DIM, np.float32))
    loud = np.array([0.5, 1.5, -2.0, 0.0], np.float32)
    body = server.encode_wav(loud)
    pcm = np.frombuffer(body[-8:], "<i2").astype(np.float32) / 32767.0
    np.testing.assert_allclose(
        pcm, np.clip(loud, -1.0, 1.0), atol=1e-4
    )


@pytest.mark.slow
def test_http_with_wavernn_vocoder(tts):
    """POST /synthesize with an attached WaveRNN routes through the
    batcher's (voice, vocoder) grouping and returns real audio; the
    vocoder also joins servable_vocoders (so it passes validation)."""
    from msa_tts_tpu.vocoders.wavernn import WaveRNN, WaveRNNConfig

    ap = tts.params["audio_params"]
    voc = WaveRNN(
        cfg=WaveRNNConfig(
            n_mels=ap["n_mels"], rnn_dims=32, fc_dims=32,
            compute_dims=16, res_out_dims=16, res_blocks=1,
            hop_length=ap["hop_length"], sample_rate=ap["sample_rate"],
            pad=2, upsample_factors=(2, 2, ap["hop_length"] // 4),
        ),
        rng=jax.random.PRNGKey(0), gen_backend="xla",
    )
    server = TTSServer(
        tts, default_spk_emb=np.zeros(SPK_DIM, np.float32),
        window_ms=5.0,
    )
    tts.attach_vocoder("wavernn", voc)
    assert "wavernn" in server.servable_vocoders()
    port = server.start()
    try:
        rq = urllib.request.Request(
            f"http://127.0.0.1:{port}/synthesize",
            data=json.dumps({"text": "hi", "vocoder": "wavernn"}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(rq, timeout=600) as r:
            assert r.status == 200
            body = r.read()
        # random-init gate fires at step 1 → short-but-real audio
        assert body[:4] == b"RIFF" and len(body) > 100
    finally:
        server.stop()


def test_max_batch_extends_bucket_ladder():
    """--max_batch above the largest default bucket must extend the
    ladder: otherwise a 9..16-request group snaps DOWN to bucket 8 and
    synthesize_batch compiles one fresh XLA program per distinct raw
    group size that warmup never pre-built."""
    from msa_tts_tpu.server import DynamicBatcher

    b = DynamicBatcher(lambda *a: [], max_batch=16)
    assert max(b.batch_buckets) == 16
    assert b.bucket(9) == 16
    # default shape untouched when max_batch fits the ladder
    b8 = DynamicBatcher(lambda *a: [], max_batch=8)
    assert b8.batch_buckets == (1, 2, 4, 8)
