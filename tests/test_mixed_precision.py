"""Mixed-precision (bf16 compute / fp32 master) trainer test."""

import json

import jax
import numpy as np
import pytest

from msa_tts_tpu.dataloaders.synthetic import (
    make_synthetic_corpus,
    synthetic_params,
)
from msa_tts_tpu.trainers.baseline import JointTrainer


def test_bf16_compute_trains(tmp_path):
    root = str(tmp_path / "corpus")
    make_synthetic_corpus(
        root, n_speakers=2, utterances_per_speaker=4, seed=0,
        min_dur=0.25, max_dur=0.35,
    )
    params = synthetic_params(
        root, n_speakers=2, batch_size=3, n_epochs=2,
        model_overrides={"max_decoder_steps": 15},
    )
    params.update(
        use_tensorboard=False,
        tb_log_interval=1,
        plot_examples=False,
        compute_dtype="bfloat16",
    )
    trainer = JointTrainer(**params)
    trainer.run()

    # master params stayed fp32
    leaves = jax.tree_util.tree_leaves(trainer.train_state.params)
    assert all(l.dtype == np.float32 for l in leaves)
    ms_leaves = jax.tree_util.tree_leaves(trainer.train_state.model_state)
    assert all(l.dtype == np.float32 for l in ms_leaves)

    losses = [
        json.loads(l)["value"]
        for l in open(trainer.logger.jsonl_path)
        if '"train/loss"' in l
    ]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
