"""Whole-loop Pallas Tacotron2 decoder kernel
(models/pallas_decoder.py): parity against decoder_infer — the XLA
while-loop it replaces on TPU — in Pallas interpret mode on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msa_tts_tpu.models.decoder import (
    DecoderConfig,
    decoder_infer,
    init_decoder,
)
from msa_tts_tpu.models.pallas_decoder import (
    pallas_decoder_infer,
    supports_config,
)

BASE_AP = {
    "attention_type": "ForwardAttention",
    "attention_dim": 16,
    "attention_location_n_filters": 8,
    "attention_location_kernel_size": 15,
    "windowing": False,
    "norm": "softmax",
    "forward_attn": True,
    "trans_agent": True,
    "forward_attn_mask": False,
}


def _cfg(**over):
    ap = dict(BASE_AP, **over.pop("ap", {}))
    kw = dict(
        n_mel_channels=10, n_frames_per_step=2, encoder_embedding_dim=24,
        attention_rnn_dim=20, decoder_rnn_dim=28, prenet_dim=12,
        max_decoder_steps=17, gate_threshold=0.5,
        p_attention_dropout=0.1, p_decoder_dropout=0.1,
        early_stopping=True, attention_params=ap,
    )
    kw.update(over)
    return DecoderConfig(**kw)


def _parity(cfg, seed=0, atol=2e-6):
    params = init_decoder(jax.random.PRNGKey(seed), cfg)
    B, T_in = 3, 11
    enc = jax.random.normal(jax.random.PRNGKey(1), (B, T_in, 24))
    lens = jnp.asarray([11, 7, 9], jnp.int32)
    rng = jax.random.PRNGKey(2)
    ref = decoder_infer(params, cfg, enc, lens, rng, training=False)
    out = pallas_decoder_infer(
        params, cfg, enc, lens, rng, interpret=True
    )
    for name, a, b in zip(
        ("mels", "gates", "aligns", "mel_lengths", "n_steps"), out, ref
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=atol, err_msg=name
        )


def test_parity_default_forward_attention():
    _parity(_cfg())


@pytest.mark.parametrize("ap", [
    {"norm": "sigmoid"},
    {"trans_agent": False},
    {"forward_attn": False},
    {"location_attention": False},
    {"mask_energies": True},
])
def test_parity_attention_variants(ap):
    _parity(_cfg(ap=ap))


@pytest.mark.slow
def test_parity_no_early_stopping_runs_to_cap():
    cfg = _cfg(early_stopping=False, max_decoder_steps=9)
    _parity(cfg)


def test_unsupported_config_detected():
    assert not supports_config(_cfg(ap={"windowing": True}))
    assert not supports_config(_cfg(ap={"forward_attn_mask": True}))
    assert supports_config(_cfg())


@pytest.mark.slow
def test_serving_decode_backend_parity():
    """AdaptiveTTS with decode_backend='pallas' (interpret mode here)
    must synthesize the same mel as the XLA decoder path."""
    from jax.experimental.pallas import tpu as pltpu

    from msa_tts_tpu.models import config_from_params, init_tacotron2nv
    from msa_tts_tpu.serving import AdaptiveTTS

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
        "attention_params": dict(BASE_AP),
    }
    cfg = config_from_params(dict(MODEL))
    p0, s0 = init_tacotron2nv(jax.random.PRNGKey(3), cfg)
    emb = np.random.RandomState(0).randn(6).astype(np.float32)
    base = {"model": dict(MODEL), "audio_params": dict(AP)}
    tts_x = AdaptiveTTS(dict(base, decode_backend="xla"), p0, s0)
    tts_p = AdaptiveTTS(dict(base, decode_backend="pallas"), p0, s0)
    assert tts_p.decode_backend == "pallas"
    ref = np.asarray(tts_x.synthesize("hello", vocoder="none", spk_emb=emb))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(
            tts_p.synthesize("hello", vocoder="none", spk_emb=emb)
        )
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_vmem_gate_routes_large_configs_to_xla():
    """A config/batch whose VMEM footprint exceeds the kernel budget
    must route back to the XLA while-loop (not fail Mosaic's VMEM check
    at compile time): production full dims fit at small B in bf16 but
    not at fp32 with a 1000-step cap and a wide batch."""
    from msa_tts_tpu.models.pallas_decoder import fits_vmem

    big = DecoderConfig(
        n_mel_channels=80, n_frames_per_step=2,
        encoder_embedding_dim=576, attention_rnn_dim=1024,
        decoder_rnn_dim=1024, prenet_dim=256, max_decoder_steps=1000,
        gate_threshold=0.5, p_attention_dropout=0.1,
        p_decoder_dropout=0.1, early_stopping=True,
        attention_params=dict(BASE_AP, attention_dim=128,
                              attention_location_n_filters=32,
                              attention_location_kernel_size=31),
    )
    assert fits_vmem(big, 1, 192, jnp.bfloat16)
    assert not fits_vmem(big, 16, 192, jnp.float32)
    # the tiny test config always fits
    assert fits_vmem(_cfg(), 3, 11, jnp.float32)


def test_profitability_gate_routes_large_batches_to_xla():
    """`decode_backend: auto` uses the kernel only where the v5e
    measurements show it wins (B≤8 at every measured r — BENCHMARKS.md
    round-5 crossover sweep; B=16 loses at the shipped r=2); larger
    batches go back to the XLA while-loop even when they'd fit VMEM."""
    from msa_tts_tpu.models.pallas_decoder import profitable

    assert profitable(1) and profitable(2) and profitable(4)
    assert profitable(8) and not profitable(16)
    assert profitable(8, r=2) and not profitable(16, r=2)
    assert profitable(8, r=4) and not profitable(16, r=4)


@pytest.mark.slow
def test_vmem_gate_falls_back_inside_infer():
    """tacotron2nv_infer with decoder_backend='pallas' but an
    over-budget footprint must silently produce the XLA result."""
    from msa_tts_tpu.models.pallas_decoder import _VMEM_BUDGET
    import msa_tts_tpu.models.pallas_decoder as pd
    from msa_tts_tpu.models import (
        config_from_params, init_tacotron2nv, tacotron2nv_infer,
    )

    MODEL = {
        "mask_padding": False, "n_mel_channels": 10,
        "n_frames_per_step": 2, "n_symbols": 40,
        "symbols_embedding_dim": 16, "encoder_n_convolutions": 1,
        "encoder_embedding_dim": 16, "encoder_kernel_size": 5,
        "speaker_emb_type": "static", "num_speakers": 1,
        "speaker_embedding_dim": 8, "attention_rnn_dim": 20,
        "decoder_rnn_dim": 20, "prenet_dim": 12,
        "max_decoder_steps": 9, "gate_threshold": 0.5,
        "p_attention_dropout": 0.1, "p_decoder_dropout": 0.1,
        "decoder_no_early_stopping": True,
        "postnet_embedding_dim": 16, "postnet_kernel_size": 5,
        "postnet_n_convolutions": 2,
        "attention_params": dict(BASE_AP),
    }
    cfg = config_from_params(dict(MODEL))
    p0, s0 = init_tacotron2nv(jax.random.PRNGKey(0), cfg)
    inputs = jnp.ones((2, 7), jnp.int32)
    lens = jnp.asarray([7, 5], jnp.int32)
    sv = jnp.zeros((2, 8))
    rng = jax.random.PRNGKey(1)
    ref = tacotron2nv_infer(p0, s0, cfg, inputs, lens, sv, rng,
                            decoder_backend="xla")
    old = pd._VMEM_BUDGET
    try:
        pd._VMEM_BUDGET = 0   # force the gate shut
        out = tacotron2nv_infer(p0, s0, cfg, inputs, lens, sv, rng,
                                decoder_backend="pallas")
    finally:
        pd._VMEM_BUDGET = old
    for a, b in zip(out, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_segment_kernel_chains_like_xla_segments():
    """Chained pallas segments must reproduce the XLA segment chain
    (and therefore the offline decode) bit-closely, state included."""
    from msa_tts_tpu.models.decoder import (
        decoder_infer_segment, decoder_stream_init,
    )
    from msa_tts_tpu.models.pallas_decoder import pallas_decoder_segment

    cfg = _cfg(early_stopping=False, max_decoder_steps=20)
    params = init_decoder(jax.random.PRNGKey(0), cfg)
    B, T_in = 2, 9
    enc = jax.random.normal(jax.random.PRNGKey(1), (B, T_in, 24))
    lens = jnp.asarray([9, 6], jnp.int32)
    rng = jax.random.PRNGKey(2)
    st_r = decoder_stream_init(cfg, B, T_in, enc.dtype)
    st_p = decoder_stream_init(cfg, B, T_in, enc.dtype)
    for _ in range(3):
        st_r, m_r, g_r, a_r = decoder_infer_segment(
            params, cfg, enc, lens, rng, st_r, 5
        )
        st_p, m_p, g_p, a_p = pallas_decoder_segment(
            params, cfg, enc, lens, rng, st_p, 5, interpret=True
        )
        np.testing.assert_allclose(np.asarray(m_p), np.asarray(m_r),
                                   atol=3e-6)
        np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_r),
                                   atol=3e-6)
        np.testing.assert_array_equal(
            np.asarray(st_p["mel_lengths"]), np.asarray(st_r["mel_lengths"])
        )
    assert int(st_p["step"]) == int(st_r["step"]) == 15


@pytest.mark.slow
def test_streamed_matches_offline_under_pallas_backend():
    """With decode_backend='pallas' BOTH endpoints run kernel decodes
    (offline whole-loop, stream segments sharing its step body) — the
    streamed mel must match the offline mel."""
    from jax.experimental.pallas import tpu as pltpu

    from msa_tts_tpu.models import config_from_params, init_tacotron2nv
    from msa_tts_tpu.serving import AdaptiveTTS

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
        "attention_params": dict(BASE_AP),
    }
    cfg = config_from_params(dict(MODEL))
    p0, s0 = init_tacotron2nv(jax.random.PRNGKey(3), cfg)
    emb = np.random.RandomState(0).randn(6).astype(np.float32)
    tts = AdaptiveTTS(
        {"model": dict(MODEL), "audio_params": dict(AP),
         "decode_backend": "pallas"}, p0, s0,
    )
    with pltpu.force_tpu_interpret_mode():
        offline = np.asarray(
            tts.synthesize("hello world", vocoder="none", spk_emb=emb)
        )
        chunks = list(tts.synthesize_stream(
            "hello world", vocoder="none", spk_emb=emb,
            segment_steps=7, chunk_frames=10,
        ))
    streamed = np.concatenate(chunks, axis=-1)
    assert streamed.shape == offline.shape
    np.testing.assert_allclose(streamed, offline, atol=2e-2)
    close = np.abs(streamed - offline) < 1e-5
    assert close.mean() > 0.98


@pytest.mark.slow
def test_pallas_decode_pad_invariance():
    """Serving buckets text lengths, so the kernel must produce the
    same mel for the same text at different padded T_in (mask_pad
    zeroes the encoder conv outputs past the true length; attention
    then sees identical inputs up to padding columns)."""
    from jax.experimental.pallas import tpu as pltpu

    from msa_tts_tpu.models import (
        config_from_params, init_tacotron2nv, tacotron2nv_infer,
    )

    MODEL = {
        "mask_padding": False, "n_mel_channels": 10,
        "n_frames_per_step": 2, "n_symbols": 40,
        "symbols_embedding_dim": 16, "encoder_n_convolutions": 1,
        "encoder_embedding_dim": 16, "encoder_kernel_size": 5,
        "speaker_emb_type": "static", "num_speakers": 1,
        "speaker_embedding_dim": 8, "attention_rnn_dim": 20,
        "decoder_rnn_dim": 20, "prenet_dim": 12,
        "max_decoder_steps": 12, "gate_threshold": 0.5,
        "p_attention_dropout": 0.1, "p_decoder_dropout": 0.1,
        "decoder_no_early_stopping": True,
        "postnet_embedding_dim": 16, "postnet_kernel_size": 5,
        "postnet_n_convolutions": 2,
        "attention_params": dict(BASE_AP, mask_energies=True),
    }
    cfg = config_from_params(dict(MODEL))
    p0, s0 = init_tacotron2nv(jax.random.PRNGKey(0), cfg)
    seq = np.arange(1, 8, dtype=np.int32)
    sv = jnp.zeros((1, 8))
    rng = jax.random.PRNGKey(1)
    outs = []
    with pltpu.force_tpu_interpret_mode():
        for T_pad in (8, 16):
            inputs = np.zeros((1, T_pad), np.int32)
            inputs[0, : len(seq)] = seq
            mel, ml, _ = tacotron2nv_infer(
                p0, s0, cfg, jnp.asarray(inputs),
                jnp.asarray([len(seq)], jnp.int32), sv, rng,
                mask_pad=True, decoder_backend="pallas",
            )
            outs.append((np.asarray(mel), int(np.asarray(ml)[0])))
    (m8, l8), (m16, l16) = outs
    assert l8 == l16
    np.testing.assert_allclose(m8, m16, atol=5e-5)


def test_parity_lsa_attention():
    """LSA decodes through the same kernel body (recursion/agent off,
    masked energies) — parity vs the XLA lsa_attention path."""
    _parity(_cfg(ap={"attention_type": "LSA"}))


def test_parity_non_dyadic_prenet_dropout():
    """keep=0.7 is not exactly representable: the kernel must store RAW
    0/1 masks and compute (x/keep)·mask — a premultiplied 1/keep mask
    is 1 ulp off per prenet output and compounds through the AR
    feedback.  Masks are checked to be 0/1 and the full decode stays in
    parity at a non-dyadic dropout rate."""
    from msa_tts_tpu.models.pallas_decoder import _prenet_masks

    cfg = _cfg(p_prenet_dropout=0.3)
    masks = np.asarray(
        _prenet_masks(cfg, jax.random.PRNGKey(5), 4, 3)
    )
    assert set(np.unique(masks)) <= {0.0, 1.0}
    _parity(cfg)


def test_parity_lsa_ignores_location_attention_flag():
    """An LSA config carrying location_attention=False (e.g. copied
    from a ForwardAttention section) must still decode with the REAL
    trained location weights: the weight repack has to follow the same
    flag resolution as the kernel body (which forces loc_att=True for
    LSA), not the raw config key — disagreement meant all-zero location
    weights and silently different alignments."""
    _parity(_cfg(ap={
        "attention_type": "LSA", "location_attention": False,
    }))


def test_bf16_params_pallas_backend_full_infer(monkeypatch):
    """Regression (round 5): under infer_dtype bf16 serving casts ALL
    params (postnet included) to bf16, while the kernel emits f32 mels
    (in-kernel f32 accumulation) — tacotron2nv_infer must re-cast the
    kernel output to the compute dtype before the postnet or the
    postnet conv crashes on mixed dtypes.  Found by
    benchmarks/infer_bf16.py --r 2 on hardware; interpret-mode here."""
    import functools

    import msa_tts_tpu.models.pallas_decoder as pd
    from msa_tts_tpu.models import (
        config_from_params,
        init_tacotron2nv,
        tacotron2nv_infer,
    )
    from msa_tts_tpu.utils.g2p.char_list import N_SYMBOLS

    monkeypatch.setattr(
        pd, "pallas_decoder_infer",
        functools.partial(pd.pallas_decoder_infer, interpret=True),
    )
    mp = dict(
        n_symbols=N_SYMBOLS, n_mel_channels=10, num_speakers=1,
        symbols_embedding_dim=16, encoder_embedding_dim=16,
        encoder_n_convolutions=1, encoder_kernel_size=5,
        attention_rnn_dim=20, decoder_rnn_dim=28, prenet_dim=12,
        postnet_embedding_dim=16, postnet_n_convolutions=2,
        postnet_kernel_size=5, max_decoder_steps=9,
        n_frames_per_step=2, decoder_no_early_stopping=True,
        speaker_emb_type="static", speaker_embedding_dim=8,
        mask_padding=False, gate_threshold=0.5,
        p_attention_dropout=0.1, p_decoder_dropout=0.1,
        attention_params={
            "attention_type": "ForwardAttention", "attention_dim": 16,
            "attention_location_n_filters": 8,
            "attention_location_kernel_size": 15, "windowing": False,
            "norm": "softmax", "forward_attn": True, "trans_agent": True,
            "forward_attn_mask": False,
        },
    )
    cfg = config_from_params(mp)
    p0, s0 = init_tacotron2nv(jax.random.PRNGKey(0), cfg)
    cast = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, t
    )
    p16, s16 = cast(p0), cast(s0)
    inputs = jnp.asarray([[5, 6, 7, 8]], jnp.int32)
    il = jnp.asarray([4], jnp.int32)
    sv = jnp.zeros((1, 8), jnp.bfloat16)
    mel, mel_len, align = tacotron2nv_infer(
        p16, s16, cfg, inputs, il, sv, jax.random.PRNGKey(1),
        decoder_backend="pallas",
    )
    assert mel.dtype == jnp.bfloat16
    assert mel.shape[0] == 1 and np.isfinite(
        np.asarray(mel, np.float32)
    ).all()
