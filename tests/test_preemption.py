"""Failure detection (SURVEY §5 — absent in the reference): the
preemption guard, the stall watchdog, and graceful-preemption → resume
integration in the trainers."""

import os
import signal
import time

import numpy as np
import pytest

from msa_tts_tpu.dataloaders.synthetic import (
    make_synthetic_corpus,
    synthetic_params,
)
from msa_tts_tpu.utils.preemption import PreemptionGuard, StallWatchdog


@pytest.fixture(autouse=True)
def _clear_shared_guard():
    """SIGTERMs sent by these tests chain into the process-wide shared
    guard (that's the production behavior); clear it afterwards so no
    later test sees a stale preemption notice."""
    yield
    if PreemptionGuard._shared is not None:
        PreemptionGuard._shared.clear()


# --------------------------------------------------------------- guard
def test_guard_signal_sets_flag():
    g = PreemptionGuard().install()
    try:
        assert g.installed
        assert not g.should_stop
        os.kill(os.getpid(), signal.SIGTERM)
        assert g.should_stop
        g.clear()
        assert not g.should_stop
    finally:
        g.uninstall()


def test_guard_chains_previous_handler():
    hits = []
    prev = signal.signal(signal.SIGTERM, lambda s, f: hits.append(s))
    g = PreemptionGuard().install()
    try:
        os.kill(os.getpid(), signal.SIGTERM)
        assert g.should_stop
        assert hits == [signal.SIGTERM]
    finally:
        g.uninstall()
        signal.signal(signal.SIGTERM, prev)


def test_guard_programmatic_stop():
    g = PreemptionGuard()  # not installed: still usable cooperatively
    assert not g.should_stop
    g.request_stop()
    assert g.should_stop
    g.clear()
    assert not g.should_stop


def test_shared_guard_is_singleton():
    a = PreemptionGuard.shared()
    b = PreemptionGuard.shared()
    assert a is b
    a.clear()


# ------------------------------------------------------------ watchdog
def test_watchdog_fires_dumps_and_rearms(tmp_path):
    dump = str(tmp_path / "stall_dump.txt")
    with StallWatchdog(0.2, dump_path=dump, poll_s=0.05) as wd:
        deadline = time.monotonic() + 5.0
        while wd.n_stalls < 1 and time.monotonic() < deadline:
            time.sleep(0.05)
        assert wd.stalled
        assert wd.n_stalls == 1
        content = open(dump).read()
        assert "no step progress" in content
        assert "Thread" in content or "File" in content  # stack dump

        # progress re-arms it; a second stall is a second report
        wd.beat()
        deadline = time.monotonic() + 5.0
        while wd.n_stalls < 2 and time.monotonic() < deadline:
            time.sleep(0.05)
        assert wd.n_stalls == 2


def test_watchdog_quiet_while_beating():
    with StallWatchdog(0.5, poll_s=0.05) as wd:
        for _ in range(12):
            time.sleep(0.05)
            wd.beat()
        assert not wd.stalled
        assert wd.n_stalls == 0


def test_watchdog_callback():
    fired = []
    with StallWatchdog(0.1, callback=lambda: fired.append(1),
                       poll_s=0.03) as wd:
        deadline = time.monotonic() + 5.0
        while not fired and time.monotonic() < deadline:
            time.sleep(0.03)
    assert fired


# ------------------------------------------- trainer integration: joint
@pytest.mark.slow
def test_joint_sigterm_preempt_then_resume_bit_identical(tmp_path):
    """A preemption notice during epoch 2's test phase stops the run
    after that (complete) epoch with state saved; a ``resume: true``
    rerun finishes with parameters identical to an uninterrupted run."""
    import jax
    from msa_tts_tpu.trainers.baseline import JointTrainer

    root = str(tmp_path / "corpus")
    make_synthetic_corpus(
        root, n_speakers=2, utterances_per_speaker=4, seed=3,
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
            # save only every 3rd epoch so the preemption save-path
            # (epoch 2 is NOT on the interval) is exercised
            ckpt_save_epoch_interval=3,
        )
        return params

    t_full = JointTrainer(**mkparams("full"))
    t_full.run()

    class SigtermDuringTest(JointTrainer):
        def _test(self, epoch, rng):
            super()._test(epoch, rng)
            if epoch == 2:
                os.kill(os.getpid(), signal.SIGTERM)

    guard = PreemptionGuard.shared()
    guard.clear()
    p_int = mkparams("resumed")
    try:
        t_int = SigtermDuringTest(**p_int)
        t_int.run()
        assert guard.should_stop  # the notice was observed
        assert t_int.step_global < t_full.step_global  # stopped early
    finally:
        guard.clear()

    t_res = JointTrainer(**dict(p_int, resume=True))
    t_res.run()

    assert t_res.step_global == t_full.step_global
    for a, b in zip(
        jax.tree_util.tree_leaves(t_full.train_state.params),
        jax.tree_util.tree_leaves(t_res.train_state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# -------------------------------------- trainer integration: continual
@pytest.mark.slow
def test_continual_midtask_preempt_then_resume_bit_identical(tmp_path):
    """Preemption arriving MID-task abandons the partial task; resume
    restarts that task and the finished stream matches an uninterrupted
    one exactly (params and cumutest matrix)."""
    import jax
    from msa_tts_tpu.trainers.continual_er import ExperienceReplayTrainer

    root = str(tmp_path / "corpus")
    make_synthetic_corpus(
        root, n_speakers=3, utterances_per_speaker=4, seed=5,
        min_dur=0.25, max_dur=0.4,
    )

    def mkparams(out):
        params = synthetic_params(
            root, n_speakers=3, batch_size=2,
            model_overrides={"max_decoder_steps": 10},
        )
        params.update(
            method="continual_er", experiment_name="er",
            use_tensorboard=False, tb_log_interval=100,
            plot_examples=False, speaker_seed=11,
            num_initial_speakers=0, n_max_epochs=1, test_interval=1,
            early_stopping=False, buffer_sample_size=2,
            buffer_batch_size=2, buffer_shuffle=True,
            output_path=str(tmp_path / out),
        )
        return params

    t_full = ExperienceReplayTrainer(**mkparams("full"))
    t_full.run()

    class SigtermMidTask(ExperienceReplayTrainer):
        _steps = 0

        def _task_step(self, state, inputs, rng):
            # deliver the notice in the middle of the 2nd task's epoch
            SigtermMidTask._steps += 1
            if self.speakers_so_far and len(self.speakers_so_far) == 2 \
                    and SigtermMidTask._steps % 2 == 0:
                os.kill(os.getpid(), signal.SIGTERM)
            return super()._task_step(state, inputs, rng)

    guard = PreemptionGuard.shared()
    guard.clear()
    p_int = mkparams("resumed")
    try:
        t_int = SigtermMidTask(**p_int)
        t_int.run()
        assert guard.should_stop
        # only task 0 completed: one stream-state save, one best ckpt
        assert len(t_int.speakers_so_far) == 2  # task 1 started, not done
    finally:
        guard.clear()

    t_res = ExperienceReplayTrainer(**dict(p_int, resume=True))
    t_res.run()

    for a, b in zip(
        jax.tree_util.tree_leaves(t_full.train_state.params),
        jax.tree_util.tree_leaves(t_res.train_state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert t_res.step_global == t_full.step_global
    assert sorted(t_res.cumutest_dict.keys()) == sorted(
        t_full.cumutest_dict.keys()
    )
    last_f = t_full.cumutest_dict[max(t_full.cumutest_dict)]
    last_r = t_res.cumutest_dict[max(t_res.cumutest_dict)]
    for spk, v in last_f["losses"].items():
        assert last_r["losses"][spk] == pytest.approx(v, rel=0, abs=0)


def test_trainer_watchdog_smoke(tmp_path):
    """stall_timeout_s arms the watchdog during run(); a healthy run
    never trips it and tears it down cleanly."""
    from msa_tts_tpu.trainers.baseline import JointTrainer

    root = str(tmp_path / "corpus")
    make_synthetic_corpus(
        root, n_speakers=2, utterances_per_speaker=3, seed=7,
        min_dur=0.25, max_dur=0.35,
    )
    params = synthetic_params(
        root, n_speakers=2, batch_size=2, n_epochs=1,
        do_metatest=False, model_overrides={"max_decoder_steps": 8},
    )
    params.update(
        use_tensorboard=False, plot_examples=False,
        output_path=str(tmp_path / "out"),
        stall_timeout_s=600.0,
    )
    t = JointTrainer(**params)
    t.run()
    assert t._watchdog is None  # stopped at run() end
    assert not os.path.exists(
        os.path.join(t.path_manager.logs_path, "stall_dump.txt")
    )


def test_guard_second_signal_escalates():
    """Round-5 review: a SECOND SIGTERM after the cooperative stop flag
    is set must terminate the process (restore-and-redeliver), so a
    wedged trainer stays killable by graceful TERM.  Run in a
    subprocess — the escalation kills the process by design."""
    import subprocess
    import sys

    code = (
        "import os, signal\n"
        "from msa_tts_tpu.utils.preemption import PreemptionGuard\n"
        "g = PreemptionGuard().install()\n"
        "os.kill(os.getpid(), signal.SIGTERM)\n"
        "assert g.should_stop\n"
        "print('first survived', flush=True)\n"
        "os.kill(os.getpid(), signal.SIGTERM)\n"
        "print('UNREACHABLE', flush=True)\n"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    p = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=120, env=env,
    )
    assert "first survived" in p.stdout
    assert "UNREACHABLE" not in p.stdout
    assert p.returncode != 0          # killed by the re-delivered TERM
