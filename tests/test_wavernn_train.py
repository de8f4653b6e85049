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
