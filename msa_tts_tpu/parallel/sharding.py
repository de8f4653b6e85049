"""Sharding specs and pjit-wrapped train steps.

Layout policy (small acoustic model, large batch/task dims — the
bandwidth-optimal choice per the scaling-book recipe):

  * parameters & optimizer state: replicated (their flops/byte ratio is
    dominated by the recurrent scans; ~30M params fit every chip);
  * joint training batch: sharded over ``dp`` on the batch axis;
  * meta-training episodes: task axis over ``task``, shot axis over
    ``dp`` — a 2-D sharding of the (K, S, ...) stacked episode, so one
    meta-batch uses the whole mesh;
  * gradient/metric reductions: emitted by GSPMD as ``psum`` over the
    relevant axes automatically.
"""

from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over dp·task (all devices)."""
    return NamedSharding(mesh, P(("dp", "task")))


def task_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard (K, S, ...) stacked episodes 1-D, task axis over ALL
    devices — the layout for plain jitted (GSPMD-propagated) steps.

    A true 2-D (task over ``task``, shots over ``dp``) layout through
    GSPMD trips a check-failure in XLA's convolution SPMD partitioner
    (convolution_handler) whenever a device holds more than one task and
    the shot axis is sharded; use
    ``parallel.shard_meta.make_sharded_maml_step`` +
    ``shard_task_batch_2d`` for that layout — its shard_map body never
    exposes the convs to the partitioner."""
    return NamedSharding(mesh, P(("task", "dp")))


def _tree_of(sharding, tree):
    return jax.tree_util.tree_map(lambda _: sharding, tree)


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Device-put a host batch dict with the joint-training layout."""
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def shard_task_batch(batch: dict, mesh: Mesh) -> dict:
    sh = task_batch_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def jit_with_mesh(step_fn: Callable, donate_state: bool = True) -> Callable:
    """jit relying on input placement for sharding propagation: callers
    ``device_put`` states/batches with the helpers above and GSPMD
    propagates the layout through the program."""
    return jax.jit(
        step_fn, donate_argnums=(0,) if donate_state else ()
    )


def replicate_state(state, mesh: Mesh):
    repl = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, repl), state
    )


class DpShard:
    """Data-parallel sharding kit for the vocoder trainers: one ``dp``
    mesh axis, replicated params/optimizer state, batch sharded on its
    leading axis (GSPMD inserts the gradient psum).  Built from the
    same ``parallel: {dp: N}`` config block the acoustic trainers use;
    ``DpShard.from_params`` returns None when no block is present."""

    def __init__(self, mesh: Mesh):
        self.mesh = mesh
        self.batch_sh = batch_sharding(mesh)
        self.repl = replicated(mesh)

    @classmethod
    def from_params(cls, params: dict):
        pcfg = params.get("parallel")
        if not pcfg:
            return None
        if int(pcfg.get("tp", 1)) > 1:
            # mirror TrainerBase._setup_parallel's combination checks:
            # silently building a dp-only mesh when the user asked for
            # tensor parallelism would drop the request without error
            raise NotImplementedError(
                "parallel: {tp: N} is not supported for the vocoder "
                "trainers (DpShard is dp/task only) — tensor "
                "parallelism is an acoustic-trainer/serving feature"
            )
        from .mesh import make_mesh

        mesh = make_mesh(dp=pcfg.get("dp"), task=int(pcfg.get("task", 1)))
        dp, task = mesh.devices.shape
        print(f"[parallel] SPMD mesh dp={dp} task={task} "
              f"({mesh.size} devices)")
        return cls(mesh)

    def replicate(self, tree):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, self.repl), tree
        )

    def put_batch(self, *arrays):
        """Shard arrays on their leading axis (replicate any whose batch
        does not divide the mesh — correct, just not parallel)."""
        out = []
        for a in arrays:
            sh = (
                self.batch_sh
                if a.shape[0] % self.mesh.size == 0 else self.repl
            )
            out.append(jax.device_put(a, sh))
        return tuple(out) if len(out) > 1 else out[0]
