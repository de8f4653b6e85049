"""High-level AdaptiveTTS serving API test."""

import glob
import os

import jax
import numpy as np
import pytest

from msa_tts_tpu.dataloaders.synthetic import (
    make_synthetic_corpus,
    synthetic_params,
)


@pytest.mark.slow
def test_adaptive_tts_end_to_end(tmp_path):
    from msa_tts_tpu.trainers.baseline import JointTrainer
    from msa_tts_tpu.serving import AdaptiveTTS

    root = str(tmp_path / "corpus")
    make_synthetic_corpus(
        root, n_speakers=2, utterances_per_speaker=4, seed=0,
        min_dur=0.25, max_dur=0.35,
    )
    params = synthetic_params(
        root, n_speakers=2, batch_size=3, n_epochs=1,
        model_overrides={"max_decoder_steps": 15},
    )
    params.update(use_tensorboard=False, plot_examples=False)
    trainer = JointTrainer(**params)
    trainer.run()
    trainer._save_checkpoint("checkpoint_0.ckpt")
    exp_path = trainer.path_manager.output_path

    tts = AdaptiveTTS.from_experiment(
        exp_path, checkpoint_id="0", n_inner_test=1
    )

    # adapt from two reference clips of spk01
    clips = sorted(glob.glob(os.path.join(root, "wavs", "spk01", "*.wav")))[:2]
    from msa_tts_tpu.dataloaders.metafile import (
        load_speaker_embeddings,
        parse_metafile,
    )

    utts = {
        (u.speaker, u.filename): u.phonemes
        for u in parse_metafile(os.path.join(root, "metadata.csv"))
    }
    phonemes = [
        utts[("spk01", os.path.basename(c))] for c in clips
    ]
    emb = load_speaker_embeddings(root)["spk01"]

    voice = tts.adapt(clips, phonemes, emb)
    assert np.isfinite(voice.support_loss)

    wav = tts.synthesize("hello world", voice)
    assert wav.ndim == 1 and len(wav) > 100
    assert np.isfinite(wav).all()

    # base-model synthesis with an explicit d-vector also works
    mel = tts.synthesize("hi", spk_emb=emb, vocoder="none")
    assert mel.shape[0] == params["audio_params"]["n_mels"]

    # batched synthesis: one compiled decode over all texts
    mels = tts.synthesize_batch(
        ["hello world", "a longer second sentence"], voice,
        vocoder="none",
    )
    assert len(mels) == 2
    assert all(
        m.shape[0] == params["audio_params"]["n_mels"] for m in mels
    )

    # neural vocoders: attach + batch-vocode (tiny random-weight WaveRNN
    # and HiFi-GAN — exercises the plumbing, not audio quality)
    import jax
    from msa_tts_tpu.vocoders.wavernn import WaveRNN, WaveRNNConfig

    hop = params["audio_params"]["hop_length"]
    wcfg = WaveRNNConfig(
        mode="MOL", n_mels=params["audio_params"]["n_mels"], rnn_dims=16,
        fc_dims=16, compute_dims=8, res_out_dims=8, res_blocks=1,
        hop_length=hop, sample_rate=22050, pad=2,
        upsample_factors=(4, 8, hop // 32),
    )
    tts.attach_vocoder(
        "wavernn", WaveRNN(cfg=wcfg, rng=jax.random.PRNGKey(0),
                           gen_dtype=None)
    )
    wavs = tts.synthesize_batch(
        ["hello world", "bye"], voice, vocoder="wavernn",
    )
    for m, w in zip(mels := tts.synthesize_batch(
        ["hello world", "bye"], voice, vocoder="none"
    ), wavs):
        assert w.shape == ((m.shape[1] - 1) * hop,)
        assert np.isfinite(w).all()

    with pytest.raises(ValueError):
        tts.synthesize("x", voice, vocoder="hifigan")  # not attached


def test_dp_sharded_batched_synthesis_matches_single_device():
    """parallel: {dp: N} shards the batched decode over the mesh; with
    the prenet's stochastic dropout disabled the sharded decode must
    equal the single-device decode exactly (rows are independent; the
    weights are replicated)."""
    from msa_tts_tpu.models import config_from_params, init_tacotron2nv
    from msa_tts_tpu.serving import AdaptiveTTS

    AP2 = dict(sample_rate=22050, n_fft=512, win_length=512,
               hop_length=128, f_min=0.0, f_max=8000.0, n_mels=20,
               griffinlim_iters=4)
    MODEL2 = {
        "mask_padding": False, "n_mel_channels": 20,
        "n_frames_per_step": 2, "n_symbols": 200,
        "symbols_embedding_dim": 16, "encoder_n_convolutions": 2,
        "encoder_embedding_dim": 16, "encoder_kernel_size": 5,
        "speaker_emb_type": "static", "num_speakers": 1,
        "speaker_embedding_dim": 6, "attention_rnn_dim": 20,
        "decoder_rnn_dim": 20, "prenet_dim": 12,
        "p_prenet_dropout": 0.0,          # deterministic for equality
        "max_decoder_steps": 16, "gate_threshold": 0.5,
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
    cfg = config_from_params(dict(MODEL2))
    p0, s0 = init_tacotron2nv(jax.random.PRNGKey(0), cfg)
    emb = np.random.RandomState(0).randn(6).astype(np.float32)
    base = {"model": dict(MODEL2), "audio_params": dict(AP2)}
    texts = ["hello there", "hi", "one more line", "short", "and a fifth"]
    kw = dict(spk_emb=emb, vocoder="none", rng=jax.random.PRNGKey(7),
              text_pad_multiple=8)

    tts1 = AdaptiveTTS(dict(base), p0, s0)
    ref = tts1.synthesize_batch(list(texts), **kw)

    tts4 = AdaptiveTTS(dict(base, parallel={"dp": 4}), p0, s0)
    assert tts4._infer_sharded is not None
    out = tts4.synthesize_batch(list(texts), **kw)   # B=5 → padded to 8
    assert len(out) == len(ref) == 5
    for a, b in zip(out, ref):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=1e-5)
    # the single-utterance path stays on the unsharded jit
    one = np.asarray(tts4.synthesize("hello there", vocoder="none",
                                     spk_emb=emb))
    assert np.isfinite(one).all()


def test_tp_sharded_synthesis_matches_single_device():
    """parallel: {tp: M} shards the decoder WEIGHTS over the tp mesh
    axis (parallel/tp.py) and GSPMD partitions the AR decode; with
    prenet dropout disabled the output must match the single-device
    decode up to matmul reduction order, with identical lengths."""
    from msa_tts_tpu.models import config_from_params, init_tacotron2nv
    from msa_tts_tpu.serving import AdaptiveTTS

    AP2 = dict(sample_rate=22050, n_fft=512, win_length=512,
               hop_length=128, f_min=0.0, f_max=8000.0, n_mels=20,
               griffinlim_iters=4)
    MODEL2 = {
        "mask_padding": False, "n_mel_channels": 20,
        "n_frames_per_step": 2, "n_symbols": 200,
        "symbols_embedding_dim": 16, "encoder_n_convolutions": 2,
        "encoder_embedding_dim": 16, "encoder_kernel_size": 5,
        "speaker_emb_type": "static", "num_speakers": 1,
        "speaker_embedding_dim": 6, "attention_rnn_dim": 20,
        "decoder_rnn_dim": 20, "prenet_dim": 12,
        "p_prenet_dropout": 0.0,          # deterministic for equality
        "max_decoder_steps": 16, "gate_threshold": 0.5,
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
    cfg = config_from_params(dict(MODEL2))
    p0, s0 = init_tacotron2nv(jax.random.PRNGKey(0), cfg)
    emb = np.random.RandomState(0).randn(6).astype(np.float32)
    base = {"model": dict(MODEL2), "audio_params": dict(AP2)}
    texts = ["hello there", "hi", "one more line"]
    kw = dict(spk_emb=emb, vocoder="none", rng=jax.random.PRNGKey(7),
              text_pad_multiple=8)

    tts1 = AdaptiveTTS(dict(base), p0, s0)
    ref = tts1.synthesize_batch(list(texts), **kw)

    # tp_min_dim=4 so the 16/20-dim toy leaves actually shard
    tts_tp = AdaptiveTTS(
        dict(base, parallel={"tp": 4, "tp_min_dim": 4}), p0, s0
    )
    assert tts_tp._tp_mesh is not None
    assert tts_tp.decode_backend == "xla"
    # at least one param leaf must really be tp-sharded (non-vacuous)
    shardings = [
        x.sharding for x in jax.tree_util.tree_leaves(tts_tp.model_params)
    ]
    assert any(
        "tp" in (getattr(sh, "spec", ()) or ()) for sh in shardings
    ), shardings
    out = tts_tp.synthesize_batch(list(texts), **kw)
    assert len(out) == len(ref) == 3
    for a, b in zip(out, ref):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=1e-4)
    one = np.asarray(
        tts_tp.synthesize("hello there", vocoder="none", spk_emb=emb)
    )
    assert np.isfinite(one).all()
