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


def test_parity_no_early_stopping_runs_to_cap():
    cfg = _cfg(early_stopping=False, max_decoder_steps=9)
    _parity(cfg)


def test_unsupported_config_detected():
    assert not supports_config(_cfg(ap={"windowing": True}))
    assert not supports_config(_cfg(ap={"forward_attn_mask": True}))
    assert supports_config(_cfg())


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
