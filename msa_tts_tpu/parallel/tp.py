"""Tensor parallelism: Megatron-style 1-D sharded parameters via GSPMD.

The reference has no model parallelism of any kind (SURVEY.md §2.8);
this is the TPU-native capability that covers models too large — or
latency targets too tight — for pure replication.  The design is the
scaling-book recipe, not hand-written collectives: every parameter
leaf gets a :class:`NamedSharding` that splits its largest
``tp``-divisible axis across the mesh's ``tp`` axis (LSTM gate blocks
``(4H, in)``, projection matrices ``(out, in)``, conv channel axes),
small leaves stay replicated, and the train/infer step functions are
the UNCHANGED jitted programs — GSPMD partitions the matmuls and
inserts the all_gather/reduce_scatter collectives along ``tp``.

Composes with data parallelism: a ``(dp, task, tp)`` mesh shards the
batch over ``dp``·``task`` (sharding.py specs are tp-oblivious — an
axis a spec doesn't name is replicated over) and the weights over
``tp``; gradient psums over dp and weight gathers over tp are emitted
together by the partitioner.  ``parallel: {dp: N, tp: M}`` in any
trainer config activates it (trainers/base.py).

Numerics: partitioning only changes reduction order (same contract as
the dp sharding tests); equivalence vs single-device is asserted in
tests/test_parallel.py.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def tp_leaf_spec(shape: tuple, tp: int, min_dim: int = 128) -> P:
    """PartitionSpec for one parameter leaf: shard the largest axis
    that divides ``tp`` and is at least ``min_dim`` (so tiny biases
    and norm scales stay replicated instead of fragmenting into
    sub-lane shards); prefer the earliest such axis among equals —
    for ``(4H, in)`` LSTM kernels and ``(out, in)`` projections that
    is the output/gate axis, the Megatron column-parallel choice."""
    best = None
    for ax, d in enumerate(shape):
        if d % tp == 0 and d >= min_dim:
            if best is None or d > shape[best]:
                best = ax
    if best is None:
        return P()
    spec = [None] * len(shape)
    spec[best] = "tp"
    return P(*spec)


def tp_shardings(tree, mesh: Mesh, min_dim: int = 128):
    """A pytree of NamedShardings matching ``tree`` (params, optimizer
    moments, model state — anything whose leaves mirror param shapes).

    A mesh without a ``tp`` axis (or with tp=1) degrades to fully
    replicated specs instead of raising, so callers can apply the tp
    layout unconditionally."""
    tp = mesh.shape.get("tp", 1)
    if tp == 1:
        repl = NamedSharding(mesh, P())
        return jax.tree_util.tree_map(lambda _: repl, tree)

    def one(x):
        shape = getattr(x, "shape", ())
        return NamedSharding(mesh, tp_leaf_spec(tuple(shape), tp, min_dim))

    return jax.tree_util.tree_map(one, tree)


def shard_tree_tp(tree, mesh: Mesh, min_dim: int = 128):
    """Device-put ``tree`` with the tensor-parallel layout."""
    sh = tp_shardings(tree, mesh, min_dim)
    return jax.tree_util.tree_map(jax.device_put, tree, sh)
