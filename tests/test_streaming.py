"""Streaming synthesis: segmented decode + delayed-exact postnet must
reproduce the offline mel path exactly; chunked vocoding yields
incremental audio (the TTFA capability — serving.py:synthesize_stream)."""

import numpy as np
import pytest

import jax

from msa_tts_tpu.models import init_tacotron2nv
from msa_tts_tpu.serving import AdaptiveTTS


AP = dict(
    sample_rate=22050, n_fft=512, win_length=512, hop_length=128,
    f_min=0.0, f_max=8000.0, n_mels=20, griffinlim_iters=4,
)

MODEL = {
    "mask_padding": False,
    "n_mel_channels": 20,
    "n_frames_per_step": 2,
    "n_symbols": 200,
    "symbols_embedding_dim": 16,
    "encoder_n_convolutions": 2,
    "encoder_embedding_dim": 16,
    "encoder_kernel_size": 5,
    "speaker_emb_type": "static",
    "num_speakers": 1,
    "speaker_embedding_dim": 6,
    "speaker_embedding_dim_lin": 4,
    "attention_rnn_dim": 20,
    "decoder_rnn_dim": 20,
    "prenet_dim": 12,
    "max_decoder_steps": 40,
    "gate_threshold": 0.5,
    "p_attention_dropout": 0.1,
    "p_decoder_dropout": 0.1,
    "decoder_no_early_stopping": True,
    "postnet_embedding_dim": 16,
    "postnet_kernel_size": 5,
    "postnet_n_convolutions": 3,
    "attention_params": {
        "attention_type": "ForwardAttention",
        "attention_dim": 16,
        "attention_location_n_filters": 8,
        "attention_location_kernel_size": 15,
        "windowing": False,
        "norm": "softmax",
        "forward_attn": True,
        "trans_agent": True,
        "forward_attn_mask": False,
    },
}


def _make_tts(**model_over):
    from msa_tts_tpu.models import config_from_params

    mp = dict(MODEL, **model_over)
    params = {"model": mp, "audio_params": dict(AP)}
    cfg = config_from_params(mp)
    model_params, model_state = init_tacotron2nv(
        jax.random.PRNGKey(3), cfg
    )
    return AdaptiveTTS(params, model_params, model_state)


EMB = np.linspace(-1, 1, 6).astype(np.float32)


def test_streamed_mel_matches_offline():
    """vocoder='none': the concatenated streamed postnet mel matches the
    offline synthesize() mel (same math/rng schedule; the segmented
    decode and offline while-loop are separately-compiled XLA programs,
    so fp reassociation noise amplified through the autoregressive
    feedback bounds equality at ~1e-2, not bitwise)."""
    tts = _make_tts()
    offline = np.asarray(
        tts.synthesize("hello world", vocoder="none", spk_emb=EMB)
    )
    chunks = list(tts.synthesize_stream(
        "hello world", vocoder="none", spk_emb=EMB,
        segment_steps=7, chunk_frames=10,
    ))
    assert len(chunks) > 1  # actually incremental
    streamed = np.concatenate(chunks, axis=-1)
    assert streamed.shape == offline.shape
    np.testing.assert_allclose(streamed, offline, atol=2e-2)
    # the overwhelming majority of entries agree to float precision
    close = np.abs(streamed - offline) < 1e-5
    assert close.mean() > 0.5


def test_streamed_mel_matches_offline_with_early_stop():
    """Gate-threshold early stop: lengths and mel content still match
    offline (threshold far below the ~0.5 sigmoid of an untrained gate,
    so the stop decision is deterministic on both paths)."""
    tts = _make_tts(decoder_no_early_stopping=False, gate_threshold=0.45)
    offline = np.asarray(
        tts.synthesize("hello world", vocoder="none", spk_emb=EMB)
    )
    chunks = list(tts.synthesize_stream(
        "hello world", vocoder="none", spk_emb=EMB,
        segment_steps=5, chunk_frames=8,
    ))
    streamed = np.concatenate(chunks, axis=-1)
    assert streamed.shape == offline.shape
    np.testing.assert_allclose(streamed, offline, atol=2e-2)


@pytest.mark.slow
def test_streamed_stops_at_gate_without_early_stopping():
    """decoder_no_early_stopping=True with a firing gate: offline trims
    its output to mel_lengths·r even though the decoder runs to the step
    cap — the stream must deliver exactly those frames, not the
    post-gate tail (regression: the stream used to yield every decoded
    frame, far more audio than synthesize())."""
    # this untrained gate's sigmoid ≈ 0.43 > 0.35 threshold → fires
    # immediately (mel_lengths freezes at 1 step while the decoder
    # keeps running to the cap)
    tts = _make_tts(gate_threshold=0.35)  # no_early_stopping stays True
    offline = np.asarray(
        tts.synthesize("hello world", vocoder="none", spk_emb=EMB)
    )
    assert offline.shape[-1] < MODEL["max_decoder_steps"] * 2  # gate fired
    chunks = list(tts.synthesize_stream(
        "hello world", vocoder="none", spk_emb=EMB,
        segment_steps=3, chunk_frames=4,
    ))
    streamed = np.concatenate(chunks, axis=-1)
    assert streamed.shape == offline.shape
    np.testing.assert_allclose(streamed, offline, atol=2e-2)


def test_encode_mask_pad_invariance():
    """_encode(mask_pad=True): the encoder output at valid positions
    must not depend on how far the text was padded (the serving shape-
    bucketing contract).  Without masking, pad-token embeddings leak
    into the last kernel//2·n_convs valid positions through the conv
    stack (reference semantics, kept for the parity path)."""
    import jax.numpy as jnp

    from msa_tts_tpu.models import config_from_params
    from msa_tts_tpu.models.tacotron2nv import _encode

    cfg = config_from_params(dict(MODEL))
    params, state = init_tacotron2nv(jax.random.PRNGKey(3), cfg)
    seq = np.arange(1, 12, dtype=np.int32)  # 11 tokens
    lens = jnp.asarray([len(seq)], jnp.int32)
    emb = jnp.asarray(EMB[None])

    def enc(padded_to):
        x = np.zeros((1, padded_to), np.int32)
        x[0, : len(seq)] = seq
        out, _ = _encode(
            params, state, cfg, jnp.asarray(x), lens, emb, None,
            False, mask_pad=True,
        )
        return np.asarray(out)[0, : len(seq)]

    np.testing.assert_allclose(enc(11), enc(16), atol=1e-5)
    np.testing.assert_allclose(enc(11), enc(32), atol=1e-5)


@pytest.mark.slow
def test_stream_text_pad_bucketing_keeps_length():
    """text_pad_multiple>1 (server shape bucketing) must not change how
    much audio the client receives.  gate_threshold=0.9 keeps the
    untrained ~0.5 gate sigmoid robustly below threshold so the length
    is deterministically the step cap on both paths (content across
    differently-shaped XLA programs diverges only by amplified fp
    noise — the first frames still agree)."""
    tts = _make_tts(gate_threshold=0.9)
    kw = dict(vocoder="none", spk_emb=EMB, segment_steps=7,
              chunk_frames=10)
    base = np.concatenate(
        list(tts.synthesize_stream("hello world", **kw)), axis=-1
    )
    padded = np.concatenate(
        list(tts.synthesize_stream(
            "hello world", text_pad_multiple=16, **kw
        )),
        axis=-1,
    )
    assert padded.shape == base.shape
    np.testing.assert_allclose(padded[:, :8], base[:, :8], atol=2e-2)


def test_streamed_audio_griffinlim_chunks():
    """GL streaming: multiple finite wav chunks; total samples track the
    mel length (per-chunk phase is the documented approximation, so no
    bit-parity claim — just structural integrity)."""
    tts = _make_tts()
    mel = np.asarray(
        tts.synthesize("hello world", vocoder="none", spk_emb=EMB)
    )
    chunks = list(tts.synthesize_stream(
        "hello world", vocoder="griffinlim", spk_emb=EMB,
        segment_steps=8, chunk_frames=12, vocode_ctx_frames=4,
    ))
    assert len(chunks) > 1
    wav = np.concatenate(chunks)
    assert np.isfinite(wav).all()
    hop = AP["hop_length"]
    T = mel.shape[-1]
    # every full chunk contributes chunk_frames·hop samples; edges may
    # lose up to (ctx+1)·hop to the centered-istft trim
    assert abs(len(wav) - T * hop) <= 6 * hop


@pytest.mark.slow
def test_streamed_audio_hifigan_matches_offline_core():
    """HiFi-GAN streaming with generous context: interior samples match
    the offline (whole-mel) vocoding — the conv receptive field sits
    inside the context so trimmed chunks are exact."""
    from msa_tts_tpu.vocoders.hifigan import HiFiGAN, init_generator

    h = {
        "resblock": "2",
        "upsample_rates": [8, 4, 4],
        "upsample_kernel_sizes": [16, 8, 8],
        "upsample_initial_channel": 16,
        "resblock_kernel_sizes": [3],
        "resblock_dilation_sizes": [[1, 3]],
    }
    gen = init_generator(jax.random.PRNGKey(0), h, n_mels=20)
    voc = HiFiGAN.from_params(gen, h)

    tts = _make_tts()
    tts.attach_vocoder("hifigan", voc)
    mel = np.asarray(
        tts.synthesize("hello world", vocoder="none", spk_emb=EMB)
    )
    offline = np.asarray(voc.inference(mel))
    chunks = list(tts.synthesize_stream(
        "hello world", vocoder="hifigan", spk_emb=EMB,
        segment_steps=8, chunk_frames=12, vocode_ctx_frames=12,
    ))
    wav = np.concatenate(chunks)
    hop = 128
    n = min(len(wav), len(offline))
    # compare the interior (skip one chunk at each end)
    lo, hi = 12 * hop, n - 12 * hop
    if hi > lo:
        np.testing.assert_allclose(
            wav[lo:hi], offline[lo:hi], atol=1e-4
        )


@pytest.mark.slow
def test_streamed_mel_exact_when_gate_fires_at_step0():
    """Gate fires at the very first decoder step (mel_lengths == 0,
    early_stopping): offline's buffer holds ONE real step then zeros,
    and trims to r frames.  The stream must feed the postnet exactly
    that — one real step plus explicit zeros — not the decoder's real
    step-1 continuation (regression: `need` was derived from the
    1-clamped length, leaking a post-gate step into the postnet's right
    context)."""
    # untrained gate sigmoid ≈ 0.4-0.5 ≫ 0.1 → fires at step 0
    tts = _make_tts(decoder_no_early_stopping=False, gate_threshold=0.1)
    offline = np.asarray(
        tts.synthesize("hello world", vocoder="none", spk_emb=EMB)
    )
    r = MODEL["n_frames_per_step"]
    assert offline.shape[-1] == r  # gate really fired at step 0
    chunks = list(tts.synthesize_stream(
        "hello world", vocoder="none", spk_emb=EMB,
        segment_steps=5, chunk_frames=4,
    ))
    streamed = np.concatenate(chunks, axis=-1)
    assert streamed.shape == offline.shape
    # one decoder step, no autoregressive noise amplification → the only
    # fp slack is the postnet window shape
    np.testing.assert_allclose(streamed, offline, atol=1e-5)


@pytest.mark.slow
def test_streamed_mel_zero_context_beyond_gate():
    """early_stopping with ctx > r: emitted frames near L need literal
    zero input frames beyond the (mel_lengths+1)·r real ones to match
    offline (conv zero-padding differs from zero input frames past the
    first postnet layer).  postnet ctx = 3·(5//2) = 6 > r = 2 here, so
    the explicit-zero tail path is exercised whenever the gate fires
    mid-stream."""
    tts = _make_tts(decoder_no_early_stopping=False, gate_threshold=0.45)
    offline = np.asarray(
        tts.synthesize("hello world", vocoder="none", spk_emb=EMB)
    )
    chunks = list(tts.synthesize_stream(
        "hello world", vocoder="none", spk_emb=EMB,
        segment_steps=3, chunk_frames=4,
    ))
    streamed = np.concatenate(chunks, axis=-1)
    assert streamed.shape == offline.shape
    np.testing.assert_allclose(streamed, offline, atol=2e-2)
    # the last ctx frames are where the zero-tail fix bites — they must
    # agree to fp precision, not just loosely
    np.testing.assert_allclose(
        streamed[:, -6:], offline[:, -6:], atol=1e-4
    )


def test_stream_griffinlim_rejects_zero_context():
    """vocode_ctx_frames=0 with Griffin-Lim would silently drop one hop
    of audio per chunk (the jitted GL trims (W-1)·hop); it must be
    rejected up front."""
    tts = _make_tts()
    with pytest.raises(ValueError, match="vocode_ctx_frames"):
        list(tts.synthesize_stream(
            "hello", vocoder="griffinlim", spk_emb=EMB,
            vocode_ctx_frames=0,
        ))


def test_bf16_infer_dtype_close_to_fp32():
    """infer_dtype: bfloat16 (serving opt-in — halves the HBM traffic of
    the weight-streaming AR decode) must produce fp32 outputs close to
    the fp32 path on the same weights."""
    from msa_tts_tpu.models import config_from_params, init_tacotron2nv

    mp = dict(MODEL)
    cfg = config_from_params(mp)
    p0, s0 = init_tacotron2nv(jax.random.PRNGKey(3), cfg)
    base = {"model": mp, "audio_params": dict(AP)}
    tts32 = AdaptiveTTS(dict(base), p0, s0)
    tts16 = AdaptiveTTS(dict(base, infer_dtype="bfloat16"), p0, s0)
    m32 = np.asarray(tts32.synthesize("hello", vocoder="none", spk_emb=EMB))
    m16 = np.asarray(tts16.synthesize("hello", vocoder="none", spk_emb=EMB))
    assert m16.dtype == np.float32
    assert m16.shape == m32.shape  # same gate decisions at this config
    # bf16 has ~3 significant decimal digits; drift compounds through the
    # autoregressive feedback but must stay small at these magnitudes
    np.testing.assert_allclose(m16, m32, atol=0.15)
    assert not np.allclose(m16, m32)  # actually computed in bf16


def test_infer_dtype_auto_routes_by_batch(monkeypatch):
    """infer_dtype: auto (the round-5 DEFAULT) — bf16 exactly where the
    decode is weight-streaming-bound: the XLA while-loop backend at
    ≤ crossover batch.  Under the Pallas kernel (weights VMEM-resident)
    and for large batched groups bf16 measured a LOSS, so auto resolves
    fp32 there (BENCHMARKS.md round-5 re-bench).  Auto routes only on
    TPU hardware (the decode_backend precedent) — simulated here — and
    the route must reproduce the respective static setting exactly."""
    import msa_tts_tpu.utils.backend as backend_mod
    from msa_tts_tpu.models import config_from_params, init_tacotron2nv

    monkeypatch.setattr(backend_mod, "on_tpu", lambda: True)
    mp = dict(MODEL)
    cfg = config_from_params(mp)
    p0, s0 = init_tacotron2nv(jax.random.PRNGKey(3), cfg)
    base = {"model": mp, "audio_params": dict(AP)}
    # decode_backend pinned to xla: the on_tpu patch must not make the
    # CPU test try to Mosaic-compile the kernel
    tts32 = AdaptiveTTS(
        dict(base, infer_dtype="float32", decode_backend="xla"), p0, s0
    )
    tts16 = AdaptiveTTS(
        dict(base, infer_dtype="bfloat16", decode_backend="xla"), p0, s0
    )
    # no infer_dtype key: the DEFAULT is auto
    ttsa = AdaptiveTTS(dict(base, decode_backend="xla"), p0, s0)
    assert ttsa._infer_auto

    import jax.numpy as jnp

    assert ttsa._resolve_infer_dtype(1) == jnp.bfloat16
    assert ttsa._resolve_infer_dtype(2) is None   # r=2 crossover: B=1
    assert ttsa._resolve_infer_dtype(4) is None
    assert ttsa._resolve_infer_dtype(None) == jnp.bfloat16  # streaming

    # under the kernel backend the weights are VMEM-resident — auto
    # resolves fp32 at every batch (bf16 buys nothing and measured
    # slower end-to-end)
    ttsp = AdaptiveTTS(dict(base, decode_backend="pallas"), p0, s0)
    assert ttsp._infer_auto
    assert ttsp._resolve_infer_dtype(1) is None
    assert ttsp._resolve_infer_dtype(None) is None

    # B=1: auto == the static bf16 path, bit for bit
    m_a = np.asarray(ttsa.synthesize("hello", vocoder="none", spk_emb=EMB))
    m_16 = np.asarray(tts16.synthesize("hello", vocoder="none", spk_emb=EMB))
    np.testing.assert_array_equal(m_a, m_16)

    # B=4 (> crossover): auto == the static fp32 path, bit for bit
    texts = ["hello", "there", "more", "text"]
    got = ttsa.synthesize_batch(texts, vocoder="none", spk_emb=EMB)
    want = tts32.synthesize_batch(texts, vocoder="none", spk_emb=EMB)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))

    # the crossover bucket is a measured config knob
    tts_k = AdaptiveTTS(
        dict(base, infer_dtype="auto", infer_bf16_max_batch=8,
             decode_backend="xla"), p0, s0
    )
    assert tts_k._resolve_infer_dtype(8) == jnp.bfloat16


def test_infer_dtype_auto_is_noop_off_tpu():
    """Off TPU hardware, the auto default resolves to fp32-everywhere —
    CPU hosts get neither emulated bf16 nor cross-batch dtype drift."""
    from msa_tts_tpu.models import config_from_params, init_tacotron2nv

    mp = dict(MODEL)
    cfg = config_from_params(mp)
    p0, s0 = init_tacotron2nv(jax.random.PRNGKey(3), cfg)
    tts = AdaptiveTTS({"model": mp, "audio_params": dict(AP)}, p0, s0)
    assert not tts._infer_auto
    assert tts._resolve_infer_dtype(1) is None
    with pytest.raises(ValueError, match="infer_dtype"):
        AdaptiveTTS(
            {"model": mp, "audio_params": dict(AP),
             "infer_dtype": "bf32"}, p0, s0,
        )


@pytest.mark.slow
def test_bf16_streamed_matches_bf16_offline():
    """The streamed mel must remain (near-)exact vs offline under
    infer_dtype=bfloat16 — both paths cast identically, and the
    host fp32 round-trip of bf16 mels is lossless."""
    from msa_tts_tpu.models import config_from_params, init_tacotron2nv

    mp = dict(MODEL)
    cfg = config_from_params(mp)
    p0, s0 = init_tacotron2nv(jax.random.PRNGKey(3), cfg)
    tts = AdaptiveTTS(
        {"model": mp, "audio_params": dict(AP),
         "infer_dtype": "bfloat16"}, p0, s0,
    )
    offline = np.asarray(
        tts.synthesize("hello world", vocoder="none", spk_emb=EMB)
    )
    chunks = list(tts.synthesize_stream(
        "hello world", vocoder="none", spk_emb=EMB,
        segment_steps=7, chunk_frames=10,
    ))
    streamed = np.concatenate(chunks, axis=-1)
    assert streamed.shape == offline.shape
    # separately-compiled programs + bf16 → slightly looser than fp32
    np.testing.assert_allclose(streamed, offline, atol=6e-2)


# ----------------------------------------------- bounded stream programs
def test_postnet_width_mask_exact():
    """postnet_apply(width=w) on a zero-padded fixed-width buffer must
    reproduce postnet_apply on the true w-frame input bit-for-bit in
    columns < w — the property that lets streaming run every window
    (data-dependent final residue included) through ONE compiled shape."""
    from msa_tts_tpu.models.decoder import init_postnet, postnet_apply

    jnp = jax.numpy
    p, s = init_postnet(jax.random.PRNGKey(0), 20, 16, 5, 3)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 20, 48))
    for w in (48, 37, 12, 5):
        ref, _ = postnet_apply(
            p, s, x[..., :w], rng=None, train=False, kernel_size=5
        )
        buf = jnp.pad(x[..., :w], ((0, 0), (0, 0), (0, 48 - w)))
        out, _ = postnet_apply(
            p, s, buf, rng=None, train=False, kernel_size=5,
            width=jnp.asarray(w),
        )
        np.testing.assert_array_equal(
            np.asarray(out[..., :w]), np.asarray(ref)
        )


def test_stream_window_shapes_are_fixed():
    """Every postnet window and every vocode window across utterances of
    different lengths must arrive at ONE shape each: a production stream
    must never hit a request-time XLA compile for a fresh final-residue
    width (those take seconds on TPU while holding the server's device
    lock)."""
    from msa_tts_tpu.serving import _StreamingPostnet, _StreamingVocoder

    post_shapes, voc_shapes = set(), set()

    def post_apply(w, n):
        post_shapes.add(w.shape)
        return np.asarray(w)

    def vocode(m):
        voc_shapes.add(m.shape)
        return np.zeros(m.shape[-1] * 4, np.float32)

    rng = np.random.RandomState(0)
    for total in (64, 41, 97, 128, 33):   # ≥ chunk+2ctx = 20
        post = _StreamingPostnet(post_apply, ctx=6, pad_to=16 + 3 * 6)
        voc = _StreamingVocoder(vocode, hop=4, chunk=12, ctx=4)
        fed = 0
        while fed < total:
            n = min(16, total - fed)
            fed += n
            raw = rng.randn(20, n).astype(np.float32)
            exact = post.push(raw, final=(fed == total))
            list(voc.push(exact, final=(fed == total)))
    assert len(post_shapes) == 1, post_shapes
    assert len(voc_shapes) == 1, voc_shapes


def test_streamed_gl_length_parity_short_utterance():
    """A whole utterance shorter than one vocode window exercises the
    quantization-padded final window: the streamed Griffin-Lim wav must
    still total exactly the offline wav's length (hop·(T−1))."""
    tts = _make_tts()
    wav_off = np.asarray(
        tts.synthesize("hi", vocoder="griffinlim", spk_emb=EMB)
    )
    chunks = list(tts.synthesize_stream(
        "hi", vocoder="griffinlim", spk_emb=EMB,
        segment_steps=8, chunk_frames=64, vocode_ctx_frames=8,
    ))
    wav = np.concatenate(chunks)
    assert wav.shape == wav_off.shape
    assert np.isfinite(wav).all()


def test_stream_wavernn_rejects_zero_context():
    """WaveRNN's generate_batch returns (W-1)·hop samples per W-frame
    window — the same one-hop-short-per-chunk hazard as Griffin-Lim, so
    vocode_ctx_frames=0 must be rejected for it too."""
    tts = _make_tts()
    with pytest.raises(ValueError, match="vocode_ctx_frames"):
        list(tts.synthesize_stream(
            "hello", vocoder="wavernn", spk_emb=EMB,
            vocode_ctx_frames=0,
        ))


def _tiny_wavernn():
    from msa_tts_tpu.vocoders.wavernn import WaveRNN, WaveRNNConfig

    hop = AP["hop_length"]
    return WaveRNN(
        cfg=WaveRNNConfig(
            mode="MOL", n_mels=AP["n_mels"], rnn_dims=16, fc_dims=16,
            compute_dims=8, res_out_dims=8, res_blocks=1,
            hop_length=hop, sample_rate=AP["sample_rate"], pad=2,
            upsample_factors=(2, 2, hop // 4),
        ),
        rng=jax.random.PRNGKey(0), gen_dtype=None, gen_backend="xla",
    )


@pytest.mark.slow
def test_streamed_wavernn_length_parity_short_utterance():
    """A whole utterance shorter than one vocode window exercises the
    quantization-padded final window: without the wavernn tail trim the
    stream would emit one extra hop synthesized from the silence-floor
    padding frames.  Streamed total must equal offline (hop·(T−1))."""
    tts = _make_tts(max_decoder_steps=16)
    tts.attach_vocoder("wavernn", _tiny_wavernn())
    mel = np.asarray(tts.synthesize("hi", vocoder="none", spk_emb=EMB))
    chunks = list(tts.synthesize_stream(
        "hi", vocoder="wavernn", spk_emb=EMB,
        segment_steps=8, chunk_frames=64, vocode_ctx_frames=4,
    ))
    wav = np.concatenate(chunks)
    hop = AP["hop_length"]
    assert wav.shape == ((mel.shape[-1] - 1) * hop,)
    assert np.isfinite(wav).all()


def test_serving_defaults_attention_energy_masking():
    """Serving pads/co-batches requests, so AdaptiveTTS must default
    attention_params.mask_energies=True (a no-op on unpadded rows =
    the reference's single-utterance semantic); an explicit False from
    the experiment params still wins (training-side parity default)."""
    assert _make_tts().cfg.attention_params["mask_energies"] is True
    ap_off = dict(MODEL["attention_params"], mask_energies=False)
    tts_off = _make_tts(attention_params=ap_off)
    assert tts_off.cfg.attention_params["mask_energies"] is False


def test_cobatched_mel_independent_of_batchmates():
    """The serving exactness contract: a request's mel must not change
    with the other requests in its batch (whose max length sets the
    text padding).  Needs mask_pad AND the mask_energies default —
    encoder-conv masking alone leaves pad columns with softmax mass."""
    tts = _make_tts()
    solo = tts.synthesize_batch(["hi"], vocoder="none", spk_emb=EMB)[0]
    pair = tts.synthesize_batch(
        ["hi", "a considerably longer sentence to stretch the pad"],
        vocoder="none", spk_emb=EMB,
    )[0]
    assert solo.shape == pair.shape
    np.testing.assert_allclose(solo, pair, atol=1e-4)
