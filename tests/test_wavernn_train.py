"""WaveRNN vocoder trainer smoke test."""

import numpy as np

from msa_tts_tpu.dataloaders.synthetic import (
    make_synthetic_corpus,
    synthetic_params,
)


def test_wavernn_trainer_loss_decreases(tmp_path):
    from msa_tts_tpu.trainers.wavernn_train import WaveRNNTrainer

    root = str(tmp_path / "c")
    make_synthetic_corpus(
        root, n_speakers=2, utterances_per_speaker=4, seed=0,
        min_dur=0.4, max_dur=0.6,
    )
    params = synthetic_params(root, n_speakers=2, batch_size=2)
    params.update(
        method="wavernn",
        experiment_name="voc",
        use_tensorboard=False,
        # tiny vocoder
        voc_mode="MOL",
        rnn_dims=32,
        fc_dims=32,
        compute_dims=16,
        res_out_dims=16,
        res_blocks=2,
        pad=2,
        upsample_factors=(4, 8, 8),  # product == hop_length 256
        seq_len=1024,
        n_steps=12,
        batch_size=4,
        lr=5e-3,
        tb_log_interval=1,
        print_interval=100,
        ckpt_save_step_interval=12,
    )
    t = WaveRNNTrainer(**params)
    final = t.run()
    assert np.isfinite(final)

    import json

    losses = [
        json.loads(l)["value"] for l in open(t.logger.jsonl_path)
    ]
    assert losses[-1] < losses[0]  # NLL decreases

    import glob, os

    assert glob.glob(
        os.path.join(t.path_manager.checkpoints_path, "wavernn_*.ckpt")
    )


def test_sample_batch_aligns_waveform_with_trimmed_mel(tmp_path):
    """With trim_margin_silence, the cached item.mel comes from the
    TRIMMED waveform; _sample_batch must apply the same trim slice to
    the reloaded audio or every (mel window, waveform segment) pair is
    offset by the leading silence."""
    import glob
    import os

    from msa_tts_tpu.ops.audio import load_wav, save_wav
    from msa_tts_tpu.trainers.wavernn_train import WaveRNNTrainer

    root = str(tmp_path / "c")
    make_synthetic_corpus(
        root, n_speakers=1, utterances_per_speaker=3, seed=0,
        min_dur=0.4, max_dur=0.5,
    )
    for p in glob.glob(os.path.join(root, "**", "*.wav"), recursive=True):
        w = load_wav(p)
        save_wav(
            p,
            np.concatenate(
                [np.zeros(8000, np.float32), w, np.zeros(4000, np.float32)]
            ),
            22050,
        )
    params = synthetic_params(root, n_speakers=1, batch_size=2)
    params["dataset_train"]["trim_margin_silence"] = True
    params.update(
        method="wavernn", experiment_name="voc-trim",
        use_tensorboard=False, voc_mode="MOL", rnn_dims=16, fc_dims=16,
        compute_dims=8, res_out_dims=8, res_blocks=1, pad=2,
        upsample_factors=(4, 8, 8), seq_len=1024, n_steps=1,
        batch_size=2, lr=5e-3, tb_log_interval=100, print_interval=100,
        ckpt_save_step_interval=1000,
    )
    t = WaveRNNTrainer(**params)
    assert all(
        it.trim is not None and it.trim[0] > 0 for it in t.dataset.items
    ), "injected leading silence should produce a non-trivial trim"
    rng = np.random.default_rng(0)
    t._sample_batch(rng, 2)
    hop = t.cfg.hop_length
    checked = 0
    for it in t.dataset.items:
        wav = t._wav_cache.get(it.item_id)
        if wav is None:
            continue
        s, e = it.trim
        # cached waveform is exactly the trimmed region the mel saw
        assert len(wav) == e - s
        # and the mel frame count tracks it (framing of the padded trim)
        assert abs(it.mel.shape[1] - len(wav) // hop) <= 2
        checked += 1
    assert checked > 0
