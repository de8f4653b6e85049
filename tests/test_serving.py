"""High-level AdaptiveTTS serving API test."""

import glob
import os

import numpy as np
import pytest

from msa_tts_tpu.dataloaders.synthetic import (
    make_synthetic_corpus,
    synthetic_params,
)


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
