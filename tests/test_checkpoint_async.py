"""AsyncCheckpointer unit tests: content fidelity, donation safety,
ordering, error propagation."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msa_tts_tpu.utils.checkpoint import (
    AsyncCheckpointer,
    load_checkpoint,
    restore_like,
    save_checkpoint,
    wait_all_checkpoints,
)


def test_async_matches_sync(tmp_path):
    payload = {
        "params": {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones(3)},
        "step": 7,
    }
    sync_path = str(tmp_path / "sync.ckpt")
    async_path = str(tmp_path / "async.ckpt")
    save_checkpoint(sync_path, payload)
    ck = AsyncCheckpointer()
    ck.save(async_path, payload)
    ck.wait()
    a, b = load_checkpoint(sync_path), load_checkpoint(async_path)
    assert a["step"] == b["step"] == 7
    np.testing.assert_array_equal(a["params"]["w"], b["params"]["w"])


def test_async_survives_donated_buffer(tmp_path):
    """The snapshot must happen at save() time: donating the array to a
    jit afterwards (which deletes it) must not corrupt the write."""
    x = jnp.arange(8.0)
    ck = AsyncCheckpointer()
    path = str(tmp_path / "don.ckpt")
    ck.save(path, {"x": x})
    f = jax.jit(lambda a: a * 2, donate_argnums=0)
    y = f(x)  # x's buffer is now deleted
    ck.wait()
    np.testing.assert_array_equal(
        load_checkpoint(path)["x"], np.arange(8.0)
    )
    np.testing.assert_array_equal(np.asarray(y), np.arange(8.0) * 2)


def test_fifo_ordering_last_write_wins(tmp_path):
    ck = AsyncCheckpointer()
    path = str(tmp_path / "seq.ckpt")
    for i in range(5):
        ck.save(path, {"i": jnp.asarray(i)})
    ck.wait()
    assert int(load_checkpoint(path)["i"]) == 4


def test_error_propagates(tmp_path):
    ck = AsyncCheckpointer()
    ck.save(str(tmp_path / "no_such_dir" / "x.ckpt"), {"a": jnp.ones(2)})
    with pytest.raises(OSError):
        ck.wait()
    # the checkpointer stays usable after an error
    ok = str(tmp_path / "ok.ckpt")
    ck.save(ok, {"a": jnp.ones(2)})
    ck.wait()
    assert os.path.exists(ok)


def test_wait_all(tmp_path):
    cks = [AsyncCheckpointer() for _ in range(3)]
    for i, ck in enumerate(cks):
        ck.save(str(tmp_path / f"c{i}.ckpt"), {"i": jnp.asarray(i)})
    wait_all_checkpoints()
    for i in range(3):
        assert int(load_checkpoint(str(tmp_path / f"c{i}.ckpt"))["i"]) == i


def test_restore_like_roundtrip_through_async(tmp_path):
    import optax

    params = {"w": jnp.ones((3, 2))}
    opt = optax.adam(1e-3)
    payload = {"params": params, "opt_state": opt.init(params)}
    ck = AsyncCheckpointer()
    path = str(tmp_path / "opt.ckpt")
    ck.save(path, payload)
    ck.wait()
    raw = load_checkpoint(path)
    restored = restore_like(payload["opt_state"], raw["opt_state"])
    assert type(restored) is type(payload["opt_state"])


def test_save_pickle_snapshots_at_enqueue(tmp_path):
    """The async pickle write must capture the payload at call time:
    mutations made while the worker is busy must NOT leak into the
    file (this is what makes mid-stream resume bit-identical)."""
    import pickle
    import time

    from msa_tts_tpu.utils.checkpoint import AsyncCheckpointer

    ck = AsyncCheckpointer()
    ck._q.put(lambda: time.sleep(0.4))  # keep the worker busy
    payload = {"speakers": ["a"], "n": 1}
    path = str(tmp_path / "state.pkl")
    ck.save_pickle(path, payload)
    payload["speakers"].append("b")     # mutate after enqueue
    payload["n"] = 2
    ck.wait()
    with open(path, "rb") as f:
        d = pickle.load(f)
    assert d["speakers"] == ["a"]
    assert d["n"] == 1


def test_finish_checkpoints_stops_worker_thread(tmp_path):
    """TrainerBase._finish_checkpoints must CLOSE the async checkpointer
    (thread exits), not just drain it — in-process sequential trainers
    (suites, sweeps) otherwise leak one live thread each — and a later
    save must transparently re-create one."""
    import threading

    from msa_tts_tpu.trainers.base import TrainerBase

    class T(TrainerBase):  # minimal host for the two methods under test
        def __init__(self):
            self.params = {}

    t = T.__new__(T)
    t.params = {}
    ck = AsyncCheckpointer()
    t._async_ckpt = ck
    ck.save(str(tmp_path / "a.ckpt"), {"x": np.zeros(3)})
    before = threading.active_count()
    t._finish_checkpoints()
    assert not ck._thread.is_alive()
    assert threading.active_count() < before or not ck._thread.is_alive()
    assert not hasattr(t, "_async_ckpt")
    assert (tmp_path / "a.ckpt").exists()
