"""Coverage for attention/inference variants: windowing, monotonic
forward-attention masking, sigmoid normalization, LSA, r=2 inference,
ap2 data pipeline."""

import jax
import numpy as np
import pytest

from msa_tts_tpu.models import (
    init_tacotron2nv,
    tacotron2nv_forward,
    tacotron2nv_infer,
)
from tests.test_model import make_batch, tiny_config


def _infer_with_attn(**attn_over):
    cfg = tiny_config()
    ap = dict(cfg.attention_params)
    ap.update(attn_over)
    cfg = cfg._replace(attention_params=ap)
    params, state = init_tacotron2nv(jax.random.PRNGKey(0), cfg)
    inputs, in_len, _, _, spk = make_batch(cfg)
    mel, mel_len, align = tacotron2nv_infer(
        params, state, cfg, inputs, in_len, spk, jax.random.PRNGKey(1)
    )
    return cfg, mel, mel_len, align


@pytest.mark.slow
def test_windowing_inference_runs():
    cfg, mel, mel_len, align = _infer_with_attn(windowing=True)
    assert np.isfinite(np.asarray(mel)).all()
    a = np.asarray(align)
    # executed steps have normalized alignments
    n = int(np.asarray(mel_len)[0]) or 1
    np.testing.assert_allclose(a[0, :n].sum(-1), 1.0, atol=1e-4)


@pytest.mark.slow
def test_forward_attn_mask_inference_runs():
    cfg, mel, mel_len, align = _infer_with_attn(forward_attn_mask=True)
    assert np.isfinite(np.asarray(mel)).all()


@pytest.mark.slow
def test_sigmoid_norm_attention():
    cfg, mel, mel_len, align = _infer_with_attn(
        norm="sigmoid", forward_attn=False, trans_agent=False
    )
    a = np.asarray(align)
    n = int(np.asarray(mel_len)[0]) or 1
    np.testing.assert_allclose(a[0, :n].sum(-1), 1.0, atol=1e-4)


def test_no_location_attention():
    cfg, mel, mel_len, align = _infer_with_attn(location_attention=False)
    assert np.isfinite(np.asarray(mel)).all()


@pytest.mark.slow
def test_lsa_model_forward_and_infer():
    cfg = tiny_config()
    ap = {
        "attention_type": "LSA",
        "attention_dim": 16,
        "attention_location_n_filters": 4,
        "attention_location_kernel_size": 7,
    }
    cfg = cfg._replace(attention_params=ap)
    params, state = init_tacotron2nv(jax.random.PRNGKey(0), cfg)
    inputs, in_len, mels, mel_len, spk = make_batch(cfg)
    outs, _ = tacotron2nv_forward(
        params, state, cfg, inputs, in_len, mels, mel_len, spk,
        jax.random.PRNGKey(1),
    )
    assert outs[0].shape == mels.shape
    align = np.asarray(outs[3])
    np.testing.assert_allclose(align.sum(-1), 1.0, atol=1e-4)
    # LSA masks energies → padded encoder positions get ~no mass
    L1 = int(in_len[1])
    assert align[1, :, L1:].max() < 1e-4

    mel, lengths, _ = tacotron2nv_infer(
        params, state, cfg, inputs, in_len, spk, jax.random.PRNGKey(2)
    )
    assert np.isfinite(np.asarray(mel)).all()


@pytest.mark.slow
def test_infer_r2():
    cfg = tiny_config(n_frames_per_step=2)
    params, state = init_tacotron2nv(jax.random.PRNGKey(0), cfg)
    inputs, in_len, _, _, spk = make_batch(cfg)
    mel, mel_len, align = tacotron2nv_infer(
        params, state, cfg, inputs, in_len, spk, jax.random.PRNGKey(1)
    )
    assert mel.shape[2] == cfg.max_decoder_steps * 2


def test_ap2_dataset_pipeline(tmp_path):
    from msa_tts_tpu.dataloaders import get_dataloader
    from msa_tts_tpu.dataloaders.synthetic import (
        make_synthetic_corpus,
        synthetic_params,
    )

    root = str(tmp_path / "c")
    make_synthetic_corpus(
        root, n_speakers=2, utterances_per_speaker=4, seed=0,
        min_dur=0.25, max_dur=0.35,
    )
    params = synthetic_params(root, n_speakers=2, batch_size=2)
    params["audio_processor"] = "ap2"
    params["audio_params"] = {
        "n_fft": 1024, "hop_size": 256, "win_size": 1024, "n_mels": 80,
        "sample_rate": 22050, "fmin": 0.0, "fmax": 8000.0,
        "center": False,
    }
    train_loader, _, _ = get_dataloader(**params)
    b = next(iter(train_loader))
    assert b.mels.shape[1] == 80
    # natural-log compression floor
    assert b.mels.min() >= np.log(1e-5) - 1e-4
