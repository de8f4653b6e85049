"""Meta-learning engine and trainer tests."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from msa_tts_tpu.meta.inner_loop import make_adapt_fn
from msa_tts_tpu.meta.maml import make_maml_step
from msa_tts_tpu.meta.reptile import make_reptile_step
from msa_tts_tpu.trainers.train_state import TrainState


# ---------------------------------------------------------------------------
# Engine-level tests on a tiny quadratic model (fast, exact math checks)
# ---------------------------------------------------------------------------

def quad_loss(params, model_state, batch, rng):
    """loss = 0.5‖w − target‖²; analytic everything."""
    del rng
    w = params["w"]
    return 0.5 * jnp.sum((w - batch["target"]) ** 2), model_state


def test_inner_loop_matches_analytic_sgd():
    lr = 0.1
    adapt = make_adapt_fn(quad_loss, optax.sgd(lr), n_steps=3, remat=False)
    w0 = jnp.asarray([1.0, -2.0])
    target = jnp.asarray([0.0, 0.0])
    adapted, _, losses = adapt(
        {"w": w0}, {}, {"target": target}, jax.random.PRNGKey(0)
    )
    # SGD on quadratic: w ← w(1-lr) each step
    expected = w0 * (1 - lr) ** 3
    np.testing.assert_allclose(np.asarray(adapted["w"]), expected, rtol=1e-6)
    assert losses.shape == (3,)
    assert losses[2] < losses[0]


def test_second_order_maml_gradient_exact():
    """For the quadratic, the MAML gradient has a closed form:
    d/dw0 [0.5‖w0(1-lr)^k − q‖²] = (1-lr)^k (w0(1-lr)^k − q)."""
    lr, k = 0.1, 2
    step = make_maml_step(
        quad_loss, optax.sgd(lr), optax.sgd(1.0), k,
        second_order=True, remat=False,
    )
    w0 = jnp.asarray([1.0, -2.0])
    support = {"target": jnp.zeros((1, 2))}
    query = {"target": jnp.asarray([[0.5, 0.5]])}
    state = TrainState(
        params={"w": w0}, model_state={},
        opt_state=optax.sgd(1.0).init({"w": w0}), step=0,
    )
    new_state, metrics = step(
        state, support, query, jax.random.PRNGKey(0)
    )
    c = (1 - lr) ** k
    expected_grad = c * (w0 * c - 0.5)
    got_grad = np.asarray(w0 - new_state.params["w"])  # lr_outer = 1
    np.testing.assert_allclose(got_grad, expected_grad, rtol=1e-5)


def test_fomaml_gradient_exact():
    """FOMAML gradient = query grad at adapted params (no (1-lr)^k
    factor)."""
    lr, k = 0.1, 2
    step = make_maml_step(
        quad_loss, optax.sgd(lr), optax.sgd(1.0), k,
        second_order=False, remat=False,
    )
    w0 = jnp.asarray([1.0, -2.0])
    support = {"target": jnp.zeros((1, 2))}
    query = {"target": jnp.asarray([[0.5, 0.5]])}
    state = TrainState(
        params={"w": w0}, model_state={},
        opt_state=optax.sgd(1.0).init({"w": w0}), step=0,
    )
    new_state, _ = step(state, support, query, jax.random.PRNGKey(0))
    c = (1 - lr) ** k
    expected_grad = w0 * c - 0.5
    got_grad = np.asarray(w0 - new_state.params["w"])
    np.testing.assert_allclose(got_grad, expected_grad, rtol=1e-5)


def test_maml_multi_task_mixing():
    """Uniform grad mixing over tasks == grad of mean query loss."""
    lr, k = 0.05, 1
    step = make_maml_step(
        quad_loss, optax.sgd(lr), optax.sgd(1.0), k,
        second_order=True, remat=False,
    )
    w0 = jnp.asarray([2.0])
    support = {"target": jnp.asarray([[0.0], [1.0], [4.0]])}  # 3 tasks
    query = {"target": jnp.asarray([[0.0], [1.0], [4.0]])}
    state = TrainState(
        params={"w": w0}, model_state={},
        opt_state=optax.sgd(1.0).init({"w": w0}), step=0,
    )
    new_state, metrics = step(state, support, query, jax.random.PRNGKey(0))
    assert metrics.task_losses.shape == (3,)
    c = 1 - lr
    grads = [
        c * ((w0[0] - t) * c + t - t) for t in (0.0, 1.0, 4.0)
    ]  # per task: w_T = t + (w0-t)c ; grad = c(w_T - t)
    expected = float(np.mean(grads))
    got = float(w0[0] - new_state.params["w"][0])
    assert got == pytest.approx(expected, rel=1e-5)


def test_reptile_sequential_semantics():
    """Sequential Reptile: each task starts from the previous task's
    updated params (reference per-speaker outer step)."""
    lr_in, lr_out, k = 0.5, 1.0, 1
    step = make_reptile_step(
        quad_loss, optax.sgd(lr_in), optax.sgd(lr_out), k,
        mode="sequential",
    )
    w0 = jnp.asarray([4.0])
    support = {"target": jnp.asarray([[0.0], [2.0]])}
    query = {"target": jnp.asarray([[0.0], [2.0]])}
    state = TrainState(
        params={"w": w0}, model_state={},
        opt_state=optax.sgd(lr_out).init({"w": w0}), step=0,
    )
    new_state, metrics = step(state, support, query, jax.random.PRNGKey(0))
    # task 1: w_T = 4 - 0.5·4 = 2 → direction 2 → w = 4 − 2 = 2
    # task 2 (from w=2): w_T = 2 − 0.5·0 = 2 → direction 0 → w stays 2
    assert float(new_state.params["w"][0]) == pytest.approx(2.0, rel=1e-6)


def test_reptile_batched_semantics():
    lr_in, lr_out, k = 0.5, 1.0, 1
    step = make_reptile_step(
        quad_loss, optax.sgd(lr_in), optax.sgd(lr_out), k, mode="batched"
    )
    w0 = jnp.asarray([4.0])
    support = {"target": jnp.asarray([[0.0], [2.0]])}
    query = {"target": jnp.asarray([[0.0], [2.0]])}
    state = TrainState(
        params={"w": w0}, model_state={},
        opt_state=optax.sgd(lr_out).init({"w": w0}), step=0,
    )
    new_state, _ = step(state, support, query, jax.random.PRNGKey(0))
    # directions: task1: 4−2 = 2 ; task2: 4−3 = 1 → mean 1.5 → w = 2.5
    assert float(new_state.params["w"][0]) == pytest.approx(2.5, rel=1e-6)


# ---------------------------------------------------------------------------
# Full-model meta-trainer smoke tests on the synthetic corpus
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from msa_tts_tpu.dataloaders.synthetic import make_synthetic_corpus

    root = str(tmp_path_factory.mktemp("meta_corpus"))
    make_synthetic_corpus(
        root, n_speakers=3, utterances_per_speaker=5, seed=0,
        min_dur=0.25, max_dur=0.4,
    )
    return root


def _meta_params(root, **over):
    from msa_tts_tpu.dataloaders.synthetic import synthetic_params

    params = synthetic_params(
        root, n_speakers=3, batch_size=2, n_epochs=1,
        model_overrides={"max_decoder_steps": 20},
    )
    params["use_tensorboard"] = False
    params["tb_log_interval"] = 1
    params["plot_examples"] = False
    params["n_inner_train"] = 2
    params["n_inner_test"] = 2
    params["meta_batch_size"] = 2
    params.update(over)
    return params


def _losses(trainer, tag="train/loss"):
    lines = [
        json.loads(l)
        for l in open(trainer.logger.jsonl_path)
        if f'"{tag}"' in l
    ]
    return [l["value"] for l in sorted(lines, key=lambda x: x["step"])]


@pytest.mark.slow
def test_maml_trainer_runs(corpus):
    from msa_tts_tpu.trainers.maml import MAML

    params = _meta_params(corpus, method="maml", track_higher_grads=True)
    trainer = MAML(**params)
    trainer.run()
    losses = _losses(trainer)
    assert losses and np.isfinite(losses).all()


@pytest.mark.slow
def test_fomaml_trainer_runs(corpus):
    from msa_tts_tpu.trainers.maml import MAML

    params = _meta_params(
        corpus, method="fomaml", track_higher_grads=False,
        experiment_name="fo",
    )
    trainer = MAML(**params)
    trainer.run()
    losses = _losses(trainer)
    assert losses and np.isfinite(losses).all()


@pytest.mark.slow
def test_reptile_trainer_runs(corpus):
    from msa_tts_tpu.trainers.reptile import Reptile

    params = _meta_params(
        corpus, method="reptile", experiment_name="rep"
    )
    trainer = Reptile(**params)
    trainer.run()
    losses = _losses(trainer)
    assert losses and np.isfinite(losses).all()


@pytest.mark.slow
def test_maml_resume_bit_identical(tmp_path):
    """MAML epoch-level preemption resume reproduces the uninterrupted
    run's final parameters exactly."""
    import jax
    import numpy as np
    from msa_tts_tpu.dataloaders.synthetic import (
        make_synthetic_corpus,
        synthetic_params,
    )
    from msa_tts_tpu.trainers.maml import MAML

    root = str(tmp_path / "corpus")
    make_synthetic_corpus(
        root, n_speakers=3, utterances_per_speaker=3, seed=2,
        min_dur=0.25, max_dur=0.4,
    )

    def mkparams(out):
        params = synthetic_params(
            root, n_speakers=3, batch_size=2,
            model_overrides={"max_decoder_steps": 10},
        )
        params.update(
            method="maml", experiment_name="maml_resume",
            n_epochs=4, n_shots_train=2, n_shots_test=2,
            meta_batch_size=3, n_inner_train=1, n_inner_test=1,
            track_higher_grads=False, maml_remat=False,
            use_tensorboard=False, tb_log_interval=100,
            plot_examples=False, metatest_epoch_interval=100,
            ckpt_save_epoch_interval=1,
            output_path=str(tmp_path / out),
        )
        return params

    t_full = MAML(**mkparams("full"))
    t_full.run()

    class Preempted(MAML):
        def _metatrain(self, epoch, rng):
            if epoch == 3:
                raise RuntimeError("simulated preemption")
            return super()._metatrain(epoch, rng)

    p_int = mkparams("resumed")
    with pytest.raises(RuntimeError, match="preemption"):
        Preempted(**p_int).run()
    t_res = MAML(**dict(p_int, resume=True))
    t_res.run()

    for a, b in zip(
        jax.tree_util.tree_leaves(t_full.train_state.params),
        jax.tree_util.tree_leaves(t_res.train_state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert t_res.step_global == t_full.step_global


@pytest.mark.slow
def test_maml_step_advances_batchnorm_state(tmp_path):
    """The outer step must carry (task-averaged) batch-norm running
    stats — a meta-trained checkpoint consumed with train=False
    (serving) would otherwise normalize with init statistics."""
    import jax
    from msa_tts_tpu.dataloaders.synthetic import (
        make_synthetic_corpus,
        synthetic_params,
    )
    from msa_tts_tpu.trainers.maml import MAML

    root = str(tmp_path / "corpus")
    make_synthetic_corpus(
        root, n_speakers=2, utterances_per_speaker=3, seed=9,
        min_dur=0.25, max_dur=0.35,
    )
    params = synthetic_params(
        root, n_speakers=2, batch_size=2,
        model_overrides={"max_decoder_steps": 8},
    )
    params.update(
        method="maml", experiment_name="bnstate", n_epochs=1,
        meta_batch_size=2, n_inner_train=1, track_higher_grads=False,
        maml_remat=False, use_tensorboard=False, plot_examples=False,
        metatest_epoch_interval=100,
        output_path=str(tmp_path / "out"),
    )
    t = MAML(**params)
    init_state = jax.device_get(t.train_state.model_state)
    t.run()
    final_state = jax.device_get(t.train_state.model_state)
    changed = any(
        not np.array_equal(a, b)
        for a, b in zip(
            jax.tree_util.tree_leaves(init_state),
            jax.tree_util.tree_leaves(final_state),
        )
    )
    assert changed, "model_state (BN running stats) did not advance"
