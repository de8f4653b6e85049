"""High-level AdaptiveTTS serving API test."""

import glob
import os

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
