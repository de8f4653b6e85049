"""Continual-learning trainer tests on the synthetic corpus."""

import glob
import os
import pickle

import numpy as np
import pytest

from msa_tts_tpu.dataloaders.synthetic import (
    make_synthetic_corpus,
    synthetic_params,
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cl_corpus"))
    make_synthetic_corpus(
        root, n_speakers=3, utterances_per_speaker=5, seed=0,
        min_dur=0.25, max_dur=0.4,
    )
    return root


def _cl_params(root, method, **over):
    params = synthetic_params(
        root, n_speakers=3, batch_size=2,
        model_overrides={"max_decoder_steps": 15},
    )
    params.update(
        method=method,
        experiment_name=method,
        use_tensorboard=False,
        tb_log_interval=1,
        plot_examples=False,
        speaker_seed=11,
        num_initial_speakers=0,
        n_max_epochs=1,
        test_interval=1,
        early_stopping=False,
        early_stopping_steps=2,
        buffer_sample_size=2,
        buffer_batch_size=2,
        buffer_shuffle=True,
        ewc_importance=1000.0,
    )
    params.update(over)
    return params


def _check_stream_outputs(trainer, n_speakers=3):
    # per-task best checkpoints
    ckpts = glob.glob(
        os.path.join(trainer.path_manager.checkpoints_path, "best_*.ckpt")
    )
    assert len(ckpts) == n_speakers
    # backward-transfer matrix
    pkl = os.path.join(trainer.path_manager.examples_path, "cumutest.pkl")
    with open(pkl, "rb") as f:
        cumu = pickle.load(f)
    assert len(cumu) == n_speakers
    # the final entry evaluates every seen speaker
    last = cumu[max(cumu.keys())]
    assert len(last["losses"]) == n_speakers
    assert all(np.isfinite(v) for v in last["losses"].values())
    return cumu


@pytest.mark.slow
def test_er_trainer(corpus):
    from msa_tts_tpu.trainers.continual_er import ExperienceReplayTrainer

    t = ExperienceReplayTrainer(**_cl_params(corpus, "continual_er"))
    t.run()
    _check_stream_outputs(t)
    # buffer grew by buffer_sample_size per task
    assert len(t.buffer) == 3 * 2


@pytest.mark.slow
def test_erkd_trainer(corpus):
    from msa_tts_tpu.trainers.continual_erkd import (
        ExperienceReplayKnowledgeDistillTrainer,
    )

    t = ExperienceReplayKnowledgeDistillTrainer(
        **_cl_params(corpus, "continual_erkd")
    )
    t.run()
    _check_stream_outputs(t)
    # buffer items carry model-predicted (soft) targets
    assert all(it.soft_mel is not None for it in t.buffer)
    it = t.buffer[0]
    assert it.soft_mel.shape == it.mel.shape
    assert not np.allclose(it.soft_mel, it.mel)


@pytest.mark.slow
def test_er_reg_trainer_weightdecay(corpus):
    from msa_tts_tpu.trainers.continual_er_reg import (
        ExperienceReplayRegTrainer,
    )

    t = ExperienceReplayRegTrainer(
        **_cl_params(
            corpus,
            "continual_er_reg",
            regularizaton_method="adaptive_weightdecay",  # sic key accepted
            weightdecay_value=1e-4,
        )
    )
    t.run()
    _check_stream_outputs(t)
    assert t._spk_similarity != 1.0  # similarity actually computed


@pytest.mark.slow
def test_er_reg_buffer_replicate(corpus):
    from msa_tts_tpu.trainers.continual_er_reg import (
        ExperienceReplayRegTrainer,
    )

    t = ExperienceReplayRegTrainer(
        **_cl_params(
            corpus,
            "continual_er_reg2",
            regularization_method="buffer_replicate",
            buffer_replicate_factor=2,
        )
    )
    t.run()
    # each task adds buffer_sample_size × factor items
    assert len(t.buffer) == 3 * 2 * 2


@pytest.mark.slow
def test_ewc_trainer(corpus):
    from msa_tts_tpu.trainers.continual_ewc import EWCTrainer

    t = EWCTrainer(**_cl_params(corpus, "continual_ewc"))
    t.run()
    _check_stream_outputs(t)
    # Fisher was computed after task 0
    assert t._ewc is not None
    fisher, means = t._ewc
    import jax

    leaves = jax.tree_util.tree_leaves(fisher)
    assert any(float(np.abs(np.asarray(l)).sum()) > 0 for l in leaves)


@pytest.mark.slow
def test_cumulative_trainer(corpus):
    from msa_tts_tpu.trainers.cumulative import CumulativeTrainer

    t = CumulativeTrainer(**_cl_params(corpus, "cumulative"))
    t.run()
    cumu = _check_stream_outputs(t)


def test_similarity_math():
    from msa_tts_tpu.trainers.continual_er_reg import (
        get_similarity,
        get_spk_similarity,
    )

    v = np.array([1.0, 0.0])
    assert get_similarity(v, [np.array([1.0, 0.0])], "cosine") == 1.0
    assert get_similarity(v, [np.array([0.0, 1.0])], "cosine") == 0.0
    emb = {
        "a": np.array([1.0, 0.0]),
        "b": np.array([0.0, 1.0]),
        "c": np.array([1.0, 1.0]),
    }
    sim = get_spk_similarity(emb, ["a", "b"], "c")
    assert sim == pytest.approx(1.0, rel=1e-6)  # c ∥ mean(a, b)


@pytest.mark.slow
def test_er_with_initial_finetune(corpus):
    """num_initial_speakers > 0: pre-train on the first speakers, then
    stream over ALL speakers with offset task indices (reference
    continual_er.py:236-244 semantics)."""
    from msa_tts_tpu.trainers.continual_er import ExperienceReplayTrainer

    params = _cl_params(corpus, "continual_er")
    params["experiment_name"] = "er_init"
    params["num_initial_speakers"] = 1
    t = ExperienceReplayTrainer(**params)
    t.run()
    import glob
    import os

    names = {
        os.path.basename(c)
        for c in glob.glob(
            os.path.join(t.path_manager.checkpoints_path, "best_*.ckpt")
        )
    }
    # initial phase saves best_0_<spk>; stream saves best_1..best_3
    assert any(n.startswith("best_0_") for n in names)
    assert len(names) == 4  # 1 initial + 3 stream tasks
    # buffer seeded during the initial phase, grown by each stream task
    assert len(t.buffer) == 2 * 4


@pytest.mark.slow
def test_er_stream_resume_bit_identical(corpus, tmp_path):
    """Kill an ER stream entering task 2, resume, and require the same
    cumutest matrix and final parameters as an uninterrupted run."""
    from msa_tts_tpu.trainers.continual_er import ExperienceReplayTrainer

    def load_cumu(trainer):
        pkl = os.path.join(
            trainer.path_manager.examples_path, "cumutest.pkl"
        )
        with open(pkl, "rb") as f:
            return pickle.load(f)

    # --- uninterrupted reference run
    p_full = _cl_params(
        corpus, "continual_er", output_path=str(tmp_path / "full")
    )
    t_full = ExperienceReplayTrainer(**p_full)
    t_full.run()
    cumu_full = load_cumu(t_full)

    # --- run that dies entering task 2 (after task 1's boundary save)
    p_int = _cl_params(
        corpus, "continual_er", output_path=str(tmp_path / "resumed")
    )

    class Preempted(ExperienceReplayTrainer):
        def _task_train_items(self, speaker, spk_itr):
            if spk_itr == 2:
                raise RuntimeError("simulated preemption")
            return super()._task_train_items(speaker, spk_itr)

    with pytest.raises(RuntimeError, match="preemption"):
        Preempted(**p_int).run()

    # --- resume in a fresh process-equivalent (new trainer object)
    t_res = ExperienceReplayTrainer(**dict(p_int, resume=True))
    t_res.run()
    cumu_res = load_cumu(t_res)

    assert set(cumu_res.keys()) == set(cumu_full.keys())
    for k in cumu_full:
        assert cumu_res[k]["speaker"] == cumu_full[k]["speaker"]
        for spk, loss in cumu_full[k]["losses"].items():
            assert cumu_res[k]["losses"][spk] == pytest.approx(
                loss, rel=0, abs=0
            ), f"task {k} speaker {spk}"

    # final parameters bit-identical
    import jax

    leaves_full = jax.tree_util.tree_leaves(t_full.train_state.params)
    leaves_res = jax.tree_util.tree_leaves(t_res.train_state.params)
    for a, b in zip(leaves_full, leaves_res):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # buffer restored to the same contents (ids + growth after task 2)
    assert [it.item_id for it in t_res.buffer] == [
        it.item_id for it in t_full.buffer
    ]


@pytest.mark.slow
def test_resume_rejects_changed_speaker_order(corpus, tmp_path):
    from msa_tts_tpu.trainers.continual_er import ExperienceReplayTrainer

    p = _cl_params(
        corpus, "continual_er", output_path=str(tmp_path / "order")
    )
    t = ExperienceReplayTrainer(**p)
    t.run()
    # find a seed whose shuffle really differs from speaker_seed=11's
    import random

    base = list(p["dataset_train"]["speakers_list"])
    ref_order = list(base)
    random.Random(11).shuffle(ref_order)
    seed = next(
        s for s in range(100, 200)
        if (lambda o: (random.Random(s).shuffle(o), o)[1])(list(base))
        != ref_order
    )
    p2 = dict(p, resume=True, speaker_seed=seed)
    with pytest.raises(ValueError, match="speaker order"):
        ExperienceReplayTrainer(**p2).run()
