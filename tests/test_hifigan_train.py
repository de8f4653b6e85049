"""HiFi-GAN adversarial trainer smoke test (tiny dims)."""

import pytest

import numpy as np

from msa_tts_tpu.dataloaders.synthetic import (
    make_synthetic_corpus,
    synthetic_params,
)


@pytest.mark.slow
def test_hifigan_trainer_runs(tmp_path):
    from msa_tts_tpu.trainers.hifigan_train import HiFiGANTrainer

    root = str(tmp_path / "c")
    make_synthetic_corpus(
        root, n_speakers=1, utterances_per_speaker=3, seed=0,
        min_dur=0.4, max_dur=0.6,
    )
    params = synthetic_params(root, n_speakers=1, batch_size=2)
    params["dataset_train"]["speakers_list"] = ["spk00"]
    params.update(
        method="hifigan",
        experiment_name="voc",
        use_tensorboard=False,
        audio_processor="ap2",
        audio_params={
            "n_fft": 1024, "hop_size": 256, "win_size": 1024,
            "n_mels": 80, "sample_rate": 22050, "fmin": 0.0,
            "fmax": 8000.0, "center": False,
        },
        hifigan={
            "resblock": "2",
            "upsample_rates": [8, 8, 4],
            "upsample_kernel_sizes": [16, 16, 8],
            "upsample_initial_channel": 32,
            "resblock_kernel_sizes": [3],
            "resblock_dilation_sizes": [[1, 3]],
        },
        segment_size=2048,
        n_steps=3,
        batch_size=2,
        lr=2e-4,
        tb_log_interval=1,
        print_interval=100,
        ckpt_save_step_interval=3,
    )
    t = HiFiGANTrainer(**params)
    final = t.run()
    assert all(np.isfinite(v) for v in final.values())
    assert final["loss_mel"] > 0

    import glob, os

    assert glob.glob(
        os.path.join(t.path_manager.checkpoints_path, "hifigan_*.ckpt")
    )
