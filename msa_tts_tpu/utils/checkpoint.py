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


def save_checkpoint(path: str, payload: dict[str, Any]) -> None:
    # to_state_dict flattens NamedTuples/optax states into plain dicts so
    # msgpack can serialize them; restore_like reverses this.
    payload = serialization.to_state_dict(payload)
    data = serialization.msgpack_serialize(_to_numpy_tree(payload))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


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
