"""End-to-end smoke test: joint training on a synthetic corpus must run,
log, checkpoint, and decrease the loss."""

import glob
import json
import os

import numpy as np
import pytest

from msa_tts_tpu.dataloaders.synthetic import (
    make_synthetic_corpus,
    synthetic_params,
)
from msa_tts_tpu.trainers.baseline import JointTrainer


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("corpus"))
    make_synthetic_corpus(
        root, n_speakers=2, utterances_per_speaker=5, seed=0,
        min_dur=0.3, max_dur=0.5,
    )
    params = synthetic_params(
        root,
        n_speakers=2,
        batch_size=3,
        n_epochs=2,
        do_metatest=True,
        model_overrides={"max_decoder_steps": 20},
    )
    params["use_tensorboard"] = False
    params["tb_log_interval"] = 1
    params["plot_examples"] = True
    trainer = JointTrainer(**params)
    trainer.run()
    return trainer, params


def test_training_runs_and_logs(trained):
    trainer, params = trained
    assert trainer.step_global > 0
    jsonl = trainer.logger.jsonl_path
    lines = [json.loads(l) for l in open(jsonl)]
    tags = {l["tag"] for l in lines}
    assert "train/loss" in tags
    assert "test/loss" in tags
    # meta-test logged per held-out speaker
    assert any(t.startswith("test/loss_spk") for t in tags)


def test_loss_decreases(trained):
    trainer, _ = trained
    lines = [
        json.loads(l)
        for l in open(trainer.logger.jsonl_path)
        if '"train/loss"' in l
    ]
    losses = [l["value"] for l in sorted(lines, key=lambda x: x["step"])]
    assert len(losses) >= 2
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_checkpoints_written(trained):
    trainer, _ = trained
    ckpts = glob.glob(
        os.path.join(trainer.path_manager.checkpoints_path, "*.ckpt")
    )
    names = {os.path.basename(c) for c in ckpts}
    assert "checkpoint_best.ckpt" in names
    assert len(names) >= 2  # best + periodic


def test_checkpoint_restores(trained):
    trainer, params = trained
    import jax

    ckpt = os.path.join(
        trainer.path_manager.checkpoints_path, "checkpoint_best.ckpt"
    )
    step_before = trainer.step_global
    params_before = jax.tree_util.tree_leaves(trainer.train_state.params)[0]
    trainer.restore(ckpt)
    # restored step differs from where training left off (best ≠ last)
    assert trainer.train_state.step <= step_before
    leaf = jax.tree_util.tree_leaves(trainer.train_state.params)[0]
    assert leaf.shape == params_before.shape


def test_example_plots_written(trained):
    trainer, _ = trained
    pngs = glob.glob(
        os.path.join(trainer.path_manager.examples_path, "*.png")
    )
    assert pngs


def test_params_snapshot_written(trained):
    trainer, _ = trained
    assert os.path.exists(
        os.path.join(trainer.path_manager.output_path, "params.yml")
    )
    assert os.path.exists(
        os.path.join(
            trainer.path_manager.output_path, "dataset_details.txt"
        )
    )


@pytest.mark.slow
def test_joint_resume_bit_identical(tmp_path):
    """Kill joint training entering epoch 3 of 4, resume, and require the
    final parameters to match an uninterrupted 4-epoch run exactly."""
    import jax

    root = str(tmp_path / "corpus")
    make_synthetic_corpus(
        root, n_speakers=2, utterances_per_speaker=4, seed=1,
        min_dur=0.25, max_dur=0.4,
    )

    def mkparams(out):
        params = synthetic_params(
            root, n_speakers=2, batch_size=2, n_epochs=4,
            do_metatest=False,
            model_overrides={"max_decoder_steps": 10},
        )
        params.update(
            use_tensorboard=False, tb_log_interval=100,
            plot_examples=False, output_path=str(tmp_path / out),
            ckpt_save_epoch_interval=1,
        )
        return params

    t_full = JointTrainer(**mkparams("full"))
    t_full.run()

    class Preempted(JointTrainer):
        def _train(self, epoch, rng):
            if epoch == 3:
                raise RuntimeError("simulated preemption")
            return super()._train(epoch, rng)

    p_int = mkparams("resumed")
    with pytest.raises(RuntimeError, match="preemption"):
        Preempted(**p_int).run()
    t_res = JointTrainer(**dict(p_int, resume=True))
    t_res.run()

    for a, b in zip(
        jax.tree_util.tree_leaves(t_full.train_state.params),
        jax.tree_util.tree_leaves(t_res.train_state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert t_res.step_global == t_full.step_global
    assert t_res.best_test_loss == pytest.approx(
        t_full.best_test_loss, rel=0, abs=0
    )


def test_finetune_native_checkpoint_restores_model_state(tmp_path):
    """finetune from a native (.ckpt) checkpoint must restore the
    model_state (batch-norm running stats) alongside the params, like
    the .pt branch does — finetuning with trained params but init BN
    statistics degrades every train=False consumer."""
    import jax
    import jax.numpy as jnp

    from msa_tts_tpu.utils.checkpoint import save_checkpoint

    root = str(tmp_path / "corpus")
    make_synthetic_corpus(
        root, n_speakers=1, utterances_per_speaker=3, seed=0,
        min_dur=0.25, max_dur=0.3,
    )
    params = synthetic_params(
        root, n_speakers=1, batch_size=2, n_epochs=1,
        model_overrides={"max_decoder_steps": 12},
    )
    params.update(use_tensorboard=False, plot_examples=False)
    t_a = JointTrainer(**dict(params, experiment_name="src"))

    # stamp a distinctive value into every float model-state leaf
    marked_ms = jax.tree_util.tree_map(
        lambda x: jnp.full_like(x, 0.123) if x.dtype == jnp.float32 else x,
        t_a.train_state.model_state,
    )
    t_a.train_state = t_a.train_state._replace(model_state=marked_ms)
    ckpt = str(tmp_path / "src.ckpt")
    save_checkpoint(ckpt, t_a._ckpt_payload())

    t_b = JointTrainer(**dict(
        params, experiment_name="dst",
        finetune=True, finetune_checkpoint_path=ckpt,
    ))
    for a, b in zip(
        jax.tree_util.tree_leaves(marked_ms),
        jax.tree_util.tree_leaves(t_b.train_state.model_state),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree_util.tree_leaves(t_a.train_state.params),
        jax.tree_util.tree_leaves(t_b.train_state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
