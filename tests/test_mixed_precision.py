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


@pytest.mark.slow
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


def test_bf16_loss_targets_stay_fp32(tmp_path):
    """Under compute_dtype=bfloat16 the loss must be computed against
    the ORIGINAL fp32 ground-truth mels: quantizing the batch's targets
    through bf16 (8-bit mantissa) before they are subsequently upcast
    for the fp32 loss biases gradients and makes eval losses
    incomparable to fp32 runs."""
    import jax.numpy as jnp

    from msa_tts_tpu.trainers import base as tb

    root = str(tmp_path / "corpus")
    make_synthetic_corpus(
        root, n_speakers=1, utterances_per_speaker=3, seed=0,
        min_dur=0.25, max_dur=0.3,
    )
    params = synthetic_params(
        root, n_speakers=1, batch_size=2, n_epochs=1,
        model_overrides={"max_decoder_steps": 15},
    )
    params.update(
        use_tensorboard=False, plot_examples=False,
        compute_dtype="bfloat16",
    )
    trainer = JointTrainer(**params)
    batch = next(iter(trainer.dataloader_train))
    inputs = trainer._unpack_batch(batch)

    seen = {}
    orig_loss = tb.tacotron2_loss

    def spy(outs, targets, lengths, **kw):
        seen["target_mels"] = targets[0]
        return orig_loss(outs, targets, lengths, **kw)

    tb.tacotron2_loss = spy
    try:
        trainer._loss_for_batch(
            trainer.train_state.params,
            trainer.train_state.model_state,
            inputs, jax.random.PRNGKey(0), train=True,
        )
    finally:
        tb.tacotron2_loss = orig_loss

    tgt = seen["target_mels"]
    assert tgt.dtype == jnp.float32
    want = np.asarray(inputs["melspecs"], np.float32)
    quantized = want.astype(jnp.bfloat16).astype(np.float32)
    assert not np.allclose(want, quantized)  # quantization is detectable
    np.testing.assert_array_equal(np.asarray(tgt), want)
