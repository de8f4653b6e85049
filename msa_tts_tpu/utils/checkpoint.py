"""Checkpoint save/restore.

A strict improvement over the reference (which stores only
``model.state_dict()`` — msa_tts/baseline.py:131-134): checkpoints here
carry params, mutable model state (batch-norm statistics), optimizer
state, and the global step, so training resumes exactly.  Format is
msgpack via ``flax.serialization`` (single file, no framework lock-in);
reference ``.pt`` checkpoints are importable through
``utils.torch_import`` for migration.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
from flax import serialization


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def serialize_payload(payload: dict[str, Any]) -> bytes:
    """Pytree → msgpack bytes. ``to_state_dict`` flattens NamedTuples /
    optax states into plain dicts; ``restore_like`` reverses this."""
    payload = serialization.to_state_dict(payload)
    return serialization.msgpack_serialize(_to_numpy_tree(payload))


def deserialize_payload(data: bytes) -> dict[str, Any]:
    return serialization.msgpack_restore(data)


def save_checkpoint(path: str, payload: dict[str, Any]) -> None:
    data = serialize_payload(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


import weakref

_LIVE_CHECKPOINTERS: "weakref.WeakSet" = weakref.WeakSet()


def wait_all_checkpoints() -> None:
    """Drain every live AsyncCheckpointer — call before reading files
    that a (possibly other) trainer may still be writing in-process."""
    for c in list(_LIVE_CHECKPOINTERS):
        c.wait()


class AsyncCheckpointer:
    """Background checkpoint writer: the train loop pays only the
    device→host snapshot (mandatory — train steps donate their input
    buffers, so arrays must be materialized before the next step), while
    msgpack serialization and disk IO run on a worker thread.

    Writes are FIFO-ordered on a single worker, so a checkpoint enqueued
    before its resume sidecar is guaranteed to be on disk first — the
    ordering the auto-resume protocol relies on.  Worker errors are
    re-raised on the next ``save``/``wait``.
    """

    def __init__(self):
        import queue
        import threading

        self._q: "queue.Queue" = queue.Queue()
        self._error: BaseException | None = None
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        _LIVE_CHECKPOINTERS.add(self)

    def _loop(self):
        while True:
            fn = self._q.get()
            if fn is None:
                self._q.task_done()
                return
            try:
                fn()
            except BaseException as e:  # surfaced on next save/wait
                self._error = e
            finally:
                self._q.task_done()

    def _check(self):
        if self._error is not None:
            err, self._error = self._error, None
            raise err

    def save(self, path: str, payload: dict[str, Any]) -> None:
        """Snapshot ``payload`` to host now; serialize + write later."""
        self._check()
        host = jax.device_get(serialization.to_state_dict(payload))

        def write():
            data = serialization.msgpack_serialize(_to_numpy_tree(host))
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(data)
            os.replace(tmp, path)

        self._q.put(write)

    def save_pickle(self, path: str, obj: Any, *,
                    ckpt_payload: dict | None = None,
                    ckpt_key: str = "ckpt") -> None:
        """Enqueue a pickle write.  With ``ckpt_payload``, the pytree is
        snapshotted to host NOW and msgpack-serialized on the worker,
        landing as ``obj[ckpt_key] = bytes`` — one atomic file carrying
        both a checkpoint and its metadata.

        ``obj`` is deep-copied at enqueue time: the caller may keep
        mutating its containers (speaker lists, rng state, ...) while
        the worker serializes, and the file must reflect the state at
        the call, not at the write."""
        import copy
        import pickle

        self._check()
        obj = copy.deepcopy(obj)
        host = (
            jax.device_get(serialization.to_state_dict(ckpt_payload))
            if ckpt_payload is not None else None
        )

        def write():
            out = obj
            if host is not None:
                out = dict(obj)
                out[ckpt_key] = serialization.msgpack_serialize(
                    _to_numpy_tree(host)
                )
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                pickle.dump(out, f)
            os.replace(tmp, path)

        self._q.put(write)

    def wait(self) -> None:
        """Block until every pending write has landed; re-raise errors."""
        self._q.join()
        self._check()

    def close(self) -> None:
        self.wait()
        self._q.put(None)
        self._thread.join()


def load_checkpoint(path: str) -> dict[str, Any]:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def restore_like(template, restored):
    """Restore ``restored`` (msgpack dict tree) into the structure of
    ``template`` (preserving tuples/NamedTuples such as optax states)."""
    return serialization.from_state_dict(template, restored)


def load_partial_params(params, ckpt_params, *, verbose: bool = True):
    """Parameter-by-parameter load with silent skip on mismatch — the
    reference's finetuning behavior (msa_tts/baseline.py:150-158)."""
    flat_new, treedef = jax.tree_util.tree_flatten_with_path(params)
    flat_ckpt = dict(jax.tree_util.tree_flatten_with_path(ckpt_params)[0])
    out = []
    for path, value in flat_new:
        if path in flat_ckpt and flat_ckpt[path].shape == value.shape:
            out.append(flat_ckpt[path])
        else:
            if verbose:
                name = jax.tree_util.keystr(path)
                print(f"Could not load weights for {name}")
            out.append(value)
    return jax.tree_util.tree_unflatten(treedef, out)
