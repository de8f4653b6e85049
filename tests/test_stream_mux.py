"""Continuous-batching stream multiplexer (stream_mux.py).

The contract under test: a stream through the multiplexer produces the
SAME audio as the same request through ``AdaptiveTTS.synthesize_stream``
at the same padded text length — regardless of which slot it lands in,
who its neighbours are, or when it joins.  Everything runs the Pallas
segment kernel in interpret mode (row math is bit-exact there), solo
comparisons via ``force_tpu_interpret_mode``.
"""

import threading
import time

import jax
import numpy as np
import pytest

from msa_tts_tpu.models import config_from_params, init_tacotron2nv
from msa_tts_tpu.serving import AdaptiveTTS
from msa_tts_tpu.stream_mux import StreamMultiplexer

AP = dict(sample_rate=22050, n_fft=512, win_length=512,
          hop_length=128, f_min=0.0, f_max=8000.0, n_mels=20,
          griffinlim_iters=4)
MODEL = {
    "mask_padding": False, "n_mel_channels": 20,
    "n_frames_per_step": 2, "n_symbols": 200,
    "symbols_embedding_dim": 16, "encoder_n_convolutions": 2,
    "encoder_embedding_dim": 16, "encoder_kernel_size": 5,
    "speaker_emb_type": "static", "num_speakers": 1,
    "speaker_embedding_dim": 6, "attention_rnn_dim": 20,
    "decoder_rnn_dim": 20, "prenet_dim": 12,
    "max_decoder_steps": 24, "gate_threshold": 0.5,
    "p_attention_dropout": 0.1, "p_decoder_dropout": 0.1,
    "decoder_no_early_stopping": True,
    "postnet_embedding_dim": 16, "postnet_kernel_size": 5,
    "postnet_n_convolutions": 2,
    "attention_params": {
        "attention_type": "ForwardAttention", "attention_dim": 16,
        "attention_location_n_filters": 8,
        "attention_location_kernel_size": 15, "windowing": False,
        "norm": "softmax", "forward_attn": True,
        "trans_agent": True, "forward_attn_mask": False,
    },
}
T_CAP = 16
SEG = 4


def _tts(**model_over):
    m = dict(MODEL, **model_over)
    cfg = config_from_params(dict(m))
    p0, s0 = init_tacotron2nv(jax.random.PRNGKey(3), cfg)
    return AdaptiveTTS(
        {"model": m, "audio_params": dict(AP),
         "decode_backend": "pallas"},
        p0, s0,
    )


def _solo(tts, text, emb, vocoder="griffinlim", voice=None):
    """Reference stream through synthesize_stream's pallas path at the
    mux's exact padded text length and segment size."""
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        return np.concatenate([
            np.asarray(c) for c in tts.synthesize_stream(
                text, voice, spk_emb=emb, vocoder=vocoder,
                segment_steps=SEG, text_pad_multiple=T_CAP,
            )
        ])


def _mux_wav(mux, text, emb, vocoder="griffinlim"):
    return np.concatenate([
        np.asarray(c)
        for c in mux.stream(text, spk_emb=emb, vocoder=vocoder)
    ])


@pytest.fixture(scope="module", params=["pallas", "xla"])
def backend(request):
    return request.param


@pytest.fixture(scope="module")
def tts(backend):
    t = _tts()
    # the solo comparison path must run the SAME decode engine the mux
    # engine under test uses
    t.decode_backend = backend
    return t


@pytest.fixture(scope="module")
def mux(tts, backend):
    m = StreamMultiplexer(
        tts, n_slots=3, t_cap=T_CAP, segment_steps=SEG,
        backend=backend,
    )
    yield m
    m.close()


def test_single_stream_matches_solo(tts, mux):
    emb = np.random.RandomState(0).randn(6).astype(np.float32)
    want = _solo(tts, "hello world", emb)
    got = _mux_wav(mux, "hello world", emb)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_concurrent_streams_each_match_solo(tts, mux):
    """Three different texts/speakers live at once — each multiplexed
    stream must equal its own solo run (slot independence + per-slot
    dropout-mask schedule)."""
    rs = np.random.RandomState(1)
    reqs = [("hi there", rs.randn(6).astype(np.float32)),
            ("longer one", rs.randn(6).astype(np.float32)),
            ("ok", rs.randn(6).astype(np.float32))]
    results = {}

    def worker(i, text, emb):
        results[i] = _mux_wav(mux, text, emb)

    threads = [
        threading.Thread(target=worker, args=(i, t, e))
        for i, (t, e) in enumerate(reqs)
    ]
    for t in threads:
        t.start()
        time.sleep(0.05)      # staggered joins → different step phases
    for t in threads:
        t.join(timeout=300)
    for i, (text, emb) in enumerate(reqs):
        want = _solo(tts, text, emb)
        np.testing.assert_allclose(
            results[i], want, atol=1e-6,
            err_msg=f"stream {i} ({text!r}) diverged from solo",
        )


def test_more_streams_than_slots_queue_up(tts, mux):
    """A 4th stream on a 3-slot mux waits for a slot and still matches."""
    rs = np.random.RandomState(2)
    reqs = [(f"text {i}", rs.randn(6).astype(np.float32))
            for i in range(4)]
    results = {}

    def worker(i, text, emb):
        results[i] = _mux_wav(mux, text, emb)

    threads = [
        threading.Thread(target=worker, args=(i, t, e))
        for i, (t, e) in enumerate(reqs)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    for i, (text, emb) in enumerate(reqs):
        want = _solo(tts, text, emb)
        np.testing.assert_allclose(results[i], want, atol=1e-6)


def test_early_stopping_stream_matches_solo():
    """With the gate live, a stream that stops early retires its slot
    and still matches solo (offline-trim bookkeeping via the shared
    _StreamCursor)."""
    tts = _tts(decoder_no_early_stopping=False)
    mux = StreamMultiplexer(tts, n_slots=2, t_cap=T_CAP,
                            segment_steps=SEG)
    try:
        emb = np.random.RandomState(3).randn(6).astype(np.float32)
        want = _solo(tts, "stop early", emb)
        got = _mux_wav(mux, "stop early", emb)
        np.testing.assert_allclose(got, want, atol=1e-6)
    finally:
        mux.close()


def test_http_server_multiplexed_streaming(tts):
    """TTSServer(stream_multiplex=2): concurrent /synthesize_stream
    requests decode through the mux; each response's PCM matches the
    per-stream (XLA solo) server's within 1 int16 LSB (kernel interpret
    vs XLA scan fp noise only), and /health reports the mux."""
    import http.client
    import json
    import urllib.request

    from msa_tts_tpu.server import TTSServer

    def fetch(port, text):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
        conn.request(
            "POST", "/synthesize_stream", json.dumps({"text": text}),
            {"Content-Type": "application/json"},
        )
        resp = conn.getresponse()
        assert resp.status == 200
        resp.read(44)
        return np.frombuffer(resp.read(), "<i2")

    xtts = _tts()
    xtts.decode_backend = "xla"     # solo reference path on CPU
    ref_srv = TTSServer(xtts, default_spk_emb=np.zeros(6, np.float32),
                        text_pad_multiple=T_CAP)
    ref_port = ref_srv.start()
    srv = TTSServer(tts, default_spk_emb=np.zeros(6, np.float32),
                    text_pad_multiple=T_CAP,
                    stream_multiplex=2, stream_mux_t_cap=T_CAP)
    port = srv.start()
    try:
        health = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/health", timeout=60
        ).read())
        assert health["stream_multiplex"] == 2
        assert health["stream_mux_backend"] in ("pallas", "xla")

        texts = ["hi there", "ok then"]
        refs = [fetch(ref_port, t) for t in texts]
        results = {}
        threads = [
            threading.Thread(
                target=lambda i=i, t=t: results.__setitem__(
                    i, fetch(port, t))
            )
            for i, t in enumerate(texts)
        ]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=600)
        for i in range(len(texts)):
            assert results[i].shape == refs[i].shape
            assert np.abs(
                results[i].astype(np.int32)
                - refs[i].astype(np.int32)
            ).max() <= 1
    finally:
        srv.stop()
        ref_srv.stop()


def test_http_server_adapted_voice_streaming():
    """TTSServer(stream_multiplex=2) + a registered adapted voice:
    concurrent /synthesize_stream requests for that voice decode
    through the per-slot-weights mux (adapted_mux) and each response
    matches a no-mux server's solo response for the same voice."""
    import http.client
    import json
    import urllib.request

    from msa_tts_tpu.server import TTSServer

    def fetch(port, text, voice):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
        conn.request(
            "POST", "/synthesize_stream",
            json.dumps({"text": text, "voice": voice}),
            {"Content-Type": "application/json"},
        )
        resp = conn.getresponse()
        assert resp.status == 200
        resp.read(44)
        return np.frombuffer(resp.read(), "<i2")

    tts = _tts()
    tts.decode_backend = "xla"
    voice = _fake_voice(tts, 41)
    ref_srv = TTSServer(tts, text_pad_multiple=T_CAP,
                        default_spk_emb=np.zeros(6, np.float32))
    ref_srv.register_voice("v1", voice)
    ref_port = ref_srv.start()
    srv = TTSServer(tts, text_pad_multiple=T_CAP,
                    default_spk_emb=np.zeros(6, np.float32),
                    stream_multiplex=2, stream_mux_t_cap=T_CAP)
    srv.register_voice("v1", voice)
    port = srv.start()
    try:
        health = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/health", timeout=60
        ).read())
        assert health["stream_mux_adapted"] == 2
        assert srv.adapted_mux is not None
        texts = ["hi there", "ok then"]
        refs = [fetch(ref_port, t, "v1") for t in texts]
        results = {}
        threads = [
            threading.Thread(
                target=lambda i=i, t=t: results.__setitem__(
                    i, fetch(port, t, "v1"))
            )
            for i, t in enumerate(texts)
        ]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=600)
        for i in range(len(texts)):
            assert results[i].shape == refs[i].shape
            assert np.abs(
                results[i].astype(np.int32)
                - refs[i].astype(np.int32)
            ).max() <= 1
        # the adapted mux actually carried the streams
        stats = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/stats", timeout=60
        ).read())
        assert stats["adapted_mux"]["admitted_total"] == len(texts)
        assert stats["adapted_mux"]["completed_total"] == len(texts)
    finally:
        srv.stop()
        ref_srv.stop()


def test_text_longer_than_cap_rejected(tts, mux):
    with pytest.raises(ValueError, match="t_cap"):
        next(iter(mux.stream(
            "this text is going to be far too long for the tiny cap " * 3,
            spk_emb=np.zeros(6, np.float32),
        )))


def test_auto_backend_routing():
    """auto = kernel inside its measured win region (B≤8 at every
    measured r — BENCHMARKS.md round-5 crossover sweep), XLA past it
    or for kernel-unsupported attention configs."""
    tts = _tts()
    m = StreamMultiplexer(tts, n_slots=3, t_cap=T_CAP, segment_steps=SEG)
    assert m.backend == "pallas"
    m.close()
    m = StreamMultiplexer(tts, n_slots=6, t_cap=T_CAP, segment_steps=SEG)
    assert m.backend == "pallas"
    m.close()
    m = StreamMultiplexer(tts, n_slots=12, t_cap=T_CAP, segment_steps=SEG)
    assert m.backend == "xla"
    m.close()
    ap = dict(MODEL["attention_params"], windowing=True)
    m = StreamMultiplexer(
        _tts(attention_params=ap), n_slots=2, t_cap=T_CAP,
        segment_steps=SEG,
    )
    assert m.backend == "xla"
    m.close()


def _fake_voice(tts, seed: int):
    """An 'adapted' voice: base params perturbed like an inner-loop
    step would perturb them, plus its own d-vector."""
    from msa_tts_tpu.serving import Voice

    rs = np.random.RandomState(seed)
    leaves, treedef = jax.tree.flatten(tts.model_params)
    perturbed = [
        np.asarray(leaf) + rs.normal(0, 0.05, np.shape(leaf)).astype(
            np.asarray(leaf).dtype
        )
        for leaf in leaves
    ]
    return Voice(
        params=jax.tree.unflatten(treedef, perturbed),
        model_state=tts.model_state,
        spk_emb=rs.randn(6).astype(np.float32),
        support_loss=0.0,
    )


def test_adapted_voice_mux_matches_solo():
    """per_slot_params=True: a stream under an ADAPTED voice through
    the mux equals its solo run under the same voice — the flagship
    few-shot product keeps continuous batching."""
    tts = _tts()
    tts.decode_backend = "xla"
    mux = StreamMultiplexer(
        tts, n_slots=3, t_cap=T_CAP, segment_steps=SEG,
        per_slot_params=True,
    )
    assert mux.backend == "xla"
    try:
        voice = _fake_voice(tts, 11)
        want = _solo(tts, "adapted hello", None, voice=voice)
        base = _solo(tts, "adapted hello", voice.spk_emb)
        # sanity: the adapted voice actually sounds different
        assert want.shape != base.shape or not np.allclose(want, base)
        got = np.concatenate([
            np.asarray(c)
            for c in mux.stream("adapted hello", voice=voice)
        ])
        np.testing.assert_allclose(got, want, atol=1e-6)
    finally:
        mux.close()


def test_mixed_adapted_and_base_streams_concurrent():
    """Two different adapted voices + one base-voice stream live at
    once on the per-slot-weights engine — each matches its own solo."""
    tts = _tts()
    tts.decode_backend = "xla"
    mux = StreamMultiplexer(
        tts, n_slots=3, t_cap=T_CAP, segment_steps=SEG,
        per_slot_params=True,
    )
    try:
        v1, v2 = _fake_voice(tts, 21), _fake_voice(tts, 22)
        base_emb = np.random.RandomState(23).randn(6).astype(np.float32)
        reqs = [("first voice", v1, None), ("second one", v2, None),
                ("plain base", None, base_emb)]
        results = {}

        def worker(i, text, voice, emb):
            results[i] = np.concatenate([
                np.asarray(c)
                for c in mux.stream(text, voice=voice, spk_emb=emb)
            ])

        threads = [
            threading.Thread(target=worker, args=(i, t, v, e))
            for i, (t, v, e) in enumerate(reqs)
        ]
        for t in threads:
            t.start()
            time.sleep(0.05)
        for t in threads:
            t.join(timeout=600)
        for i, (text, voice, emb) in enumerate(reqs):
            want = _solo(tts, text, emb, voice=voice)
            # atol 1e-5 (not the suite's usual 1e-6): per-slot WEIGHTS
            # make the engine a batched-weights dot_general, whose
            # XLA:CPU accumulation order differs from the solo B=1 dot
            # at the smoke tier's lowered LLVM codegen level
            # (conftest.py) — measured drift ~2e-6 through the AR
            # feedback.  At default codegen (and on TPU, where the
            # flags don't apply) the match is exact.
            np.testing.assert_allclose(
                results[i], want, atol=1e-5,
                err_msg=f"stream {i} ({text!r}) diverged from solo",
            )
    finally:
        mux.close()


def test_adapted_voice_rejected_without_per_slot_params(tts, mux):
    voice = _fake_voice(tts, 31)
    with pytest.raises(ValueError, match="per_slot_params"):
        mux.stream("hello", voice=voice)


def test_per_slot_params_rejects_pallas_backend():
    with pytest.raises(ValueError, match="XLA engine"):
        StreamMultiplexer(
            _tts(), n_slots=2, t_cap=T_CAP, segment_steps=SEG,
            backend="pallas", per_slot_params=True,
        )


def test_mux_backpressure_and_metrics():
    """max_pending bounds the queue: once every slot is busy and the
    queue is full, stream() raises MuxSaturated (the server sheds to
    the solo path) and metrics() reports the rejection."""
    from msa_tts_tpu.stream_mux import MuxSaturated

    # a long-running stream (high step cap, no early stopping) holds
    # the only slot while we probe admission
    tts = _tts(max_decoder_steps=2000)
    tts.decode_backend = "xla"
    mux = StreamMultiplexer(
        tts, n_slots=1, t_cap=T_CAP, segment_steps=SEG,
        backend="xla", max_pending=0,
    )
    try:
        emb = np.zeros(6, np.float32)
        mux.stream("hold it", spk_emb=emb)
        deadline = time.time() + 120
        while time.time() < deadline:
            m = mux.metrics()
            if m["active_slots"] == 1 and m["queue_depth"] == 0:
                break
            time.sleep(0.01)
        else:
            pytest.fail("first stream was never admitted")
        with pytest.raises(MuxSaturated):
            mux.stream("too many", spk_emb=emb)
        m = mux.metrics()
        assert m["rejected_total"] == 1
        assert m["admitted_total"] == 1
        assert m["max_pending"] == 0
    finally:
        # close() terminates the worker promptly even with the slot
        # still decoding (its client gets a terminal None)
        mux.close()


def test_six_slot_xla_mux_matches_solo():
    """Six concurrent streams through the XLA engine each match their
    solo run — the per-slot absolute-step key schedule survives
    vmapping.  (Forced xla: at the shipped r=2 the auto route now picks
    the kernel engine at 6 slots — the r=2 crossover sweep moved the
    gate to B≤8; the vmapped engine still must stay solo-exact since it
    serves >8-slot and adapted muxes.)"""
    tts = _tts()
    tts.decode_backend = "xla"
    mux = StreamMultiplexer(
        tts, n_slots=6, t_cap=T_CAP, segment_steps=SEG, backend="xla",
    )
    assert mux.backend == "xla"
    try:
        rs = np.random.RandomState(7)
        reqs = [(f"words number {i}", rs.randn(6).astype(np.float32))
                for i in range(6)]
        results = {}

        def worker(i, text, emb):
            results[i] = _mux_wav(mux, text, emb)

        threads = [
            threading.Thread(target=worker, args=(i, t, e))
            for i, (t, e) in enumerate(reqs)
        ]
        for t in threads:
            t.start()
            time.sleep(0.02)
        for t in threads:
            t.join(timeout=600)
        for i, (text, emb) in enumerate(reqs):
            want = _solo(tts, text, emb)
            np.testing.assert_allclose(
                results[i], want, atol=1e-6,
                err_msg=f"stream {i} ({text!r}) diverged from solo",
            )
    finally:
        mux.close()


def test_mux_backpressure_bounds_queue_with_free_slots():
    """A burst arriving between worker ticks must not queue past
    max_pending + free slots: with one slot and max_pending=0, the
    second of two back-to-back stream() calls is shed whether or not
    the worker has moved the first into its slot yet (pre-fix, any
    free slot disabled the bound entirely and the queue grew without
    limit)."""
    from msa_tts_tpu.stream_mux import MuxSaturated

    tts = _tts(max_decoder_steps=2000)
    tts.decode_backend = "xla"
    mux = StreamMultiplexer(
        tts, n_slots=1, t_cap=T_CAP, segment_steps=SEG,
        backend="xla", max_pending=0,
    )
    try:
        emb = np.zeros(6, np.float32)
        mux.stream("hold it", spk_emb=emb)
        # no wait: the first stream may still be pending (free=1,
        # pending=1 -> reject) or already admitted (free=0,
        # pending=0 -> reject) — bounded either way
        with pytest.raises(MuxSaturated):
            mux.stream("burst", spk_emb=emb)
        assert mux.metrics()["rejected_total"] == 1
    finally:
        mux.close()


def test_adapted_mux_without_base_multiplex_and_lazy_build():
    """stream_mux_adapted works standalone (no --stream_multiplex), and
    the per-slot weights table is only allocated once a voice is
    registered — a base-voice-only deployment pays nothing for the
    default-mirrored adapted mux."""
    from msa_tts_tpu.server import TTSServer

    tts = _tts()
    tts.decode_backend = "xla"

    # voices-only deployment: no base mux, adapted mux configured
    srv = TTSServer(tts, text_pad_multiple=T_CAP,
                    stream_mux_adapted=2, stream_mux_t_cap=T_CAP)
    assert srv.stream_mux is None
    assert srv.adapted_mux is None          # lazy: nothing registered yet
    srv.register_voice("v1", _fake_voice(tts, 7))
    assert srv.adapted_mux is not None
    assert srv.adapted_mux.B == 2
    srv.stop()

    # base-only deployment: mirrored adapted mux never materializes
    srv2 = TTSServer(tts, text_pad_multiple=T_CAP,
                     default_spk_emb=np.zeros(6, np.float32),
                     stream_multiplex=2, stream_mux_t_cap=T_CAP)
    assert srv2.stream_mux is not None
    assert srv2.adapted_mux is None
    srv2.stop()


def test_close_with_pending_stream_terminates_client():
    """Round-5 review: close() must also terminate PENDING (queued,
    never-admitted) streams — previously only active slots got the
    terminal None and a pending client blocked in drain() forever."""
    emb = np.zeros(6, np.float32)
    tts = _tts()
    mux = StreamMultiplexer(
        tts, n_slots=1, t_cap=T_CAP, segment_steps=SEG, backend="xla",
    )
    done = {}

    def consume(name, gen):
        done[name] = [np.asarray(c) for c in gen]

    # stream A occupies the single slot; B queues behind it
    ga = mux.stream("hold", spk_emb=emb)
    ta = threading.Thread(target=consume, args=("a", ga))
    ta.start()
    time.sleep(0.3)           # let A admit
    gb = mux.stream("wait", spk_emb=emb)
    tb = threading.Thread(target=consume, args=("b", gb))
    tb.start()
    time.sleep(0.1)
    mux.close()
    ta.join(timeout=30)
    tb.join(timeout=30)
    assert not ta.is_alive() and not tb.is_alive(), (
        "a client hung after close()"
    )
    assert "b" in done        # terminated (possibly zero chunks)


def test_batcher_submit_after_stop_fails_fast():
    """Round-5 review: submit() on a stopped DynamicBatcher must fail
    the future immediately instead of queueing it for a dead worker
    (the client would otherwise wait out its full timeout)."""
    from msa_tts_tpu.server import DynamicBatcher

    def synth_fn(texts, voice_name, vocoder, pad_batch_to):
        raise AssertionError("worker must not run in this test")

    b = DynamicBatcher(synth_fn).start()
    b.stop()
    fut = b.submit("too late")
    with pytest.raises(RuntimeError, match="shutting down"):
        fut.result(timeout=5)
