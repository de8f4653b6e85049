"""2-D (task × dp) sharded meta-training via ``jax.shard_map``.

Motivation: episodes are stacked ``(K tasks, S shots, ...)``; the
bandwidth-optimal layout shards tasks over the ``task`` mesh axis and
shots over ``dp`` so one meta-batch uses the whole mesh.  Expressing
that layout through GSPMD alone (``device_put`` + sharding propagation)
trips a check-failure in XLA's convolution SPMD partitioner whenever a
device holds >1 task AND the shot axis is sharded (vmap merges the two
sharded batch axes into the conv batch dim; the partitioner cannot
re-split the merged 2-D sharding — verified on jax 0.9.0 CPU, see
tests/test_parallel.py::test_2d_gspmd_crash_documented).

The fix is structural, not a workaround: ``shard_map`` the whole meta
step.  Inside the mapped function everything is device-local (the SPMD
partitioner never sees the convs) and the three reductions the math
needs are explicit ICI collectives:

  * inner-loop gradients:    pmean over ``dp``  (each task's shots are
    split across dp, every dp-shard must compute identical adapted
    params — see meta/inner_loop.py ``grad_pmean_axis``);
  * per-task query losses:   pmean over ``dp``;
  * outer gradients:         pmean over ``("task", "dp")``.

Differentiating *through* the inner pmean gives exact second-order MAML
gradients: collectives are linear, and their transposes are collectives
on the same axis, so grad-of-pmean stays on ICI.

Reference semantics being parallelised: msa_tts/maml.py:33-105 (the
reference loops speakers sequentially on one GPU; this module is the
SURVEY §2.8 new-capability axis, no reference counterpart).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..meta.inner_loop import make_adapt_fn
from ..meta.maml import MetaMetrics
from ..optim import TrainState, clip_by_global_norm


def episode_sharding_2d(mesh: Mesh) -> NamedSharding:
    """(K, S, ...) stacked episodes: tasks over ``task``, shots over
    ``dp``.  Only valid for data consumed by the shard_map steps built
    here — plain jitted steps must keep the 1-D layout
    (sharding.task_batch_sharding) to avoid the XLA conv-partitioner
    check-failure documented above."""
    return NamedSharding(mesh, P("task", "dp"))


def shard_task_batch_2d(batch: dict, mesh: Mesh) -> dict:
    sh = episode_sharding_2d(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def _merge_task_states_sharded(ms_stack, like):
    """Sharded counterpart of ``meta.maml.merge_task_states``: float
    leaves (batch-norm running statistics) average over the local task
    axis then pmean over the whole mesh (each dp shard adapted on its
    own shot shard, each task row on its own tasks), so the carried
    state is identical on every device; non-float leaves take the local
    first task.  Without this the sharded steps would discard every
    task's post-adapt state and BN stats would stay frozen at init —
    the exact bug commit-fixed in the unsharded steps."""
    return jax.tree_util.tree_map(
        lambda s, r: jax.lax.pmean(
            jnp.mean(s, axis=0), ("task", "dp")
        ).astype(r.dtype)
        if jnp.issubdtype(s.dtype, jnp.floating) else s[0],
        ms_stack, like,
    )


def make_sharded_maml_step(
    loss_fn: Callable,
    inner_tx: optax.GradientTransformation,
    outer_tx: optax.GradientTransformation,
    n_inner: int,
    mesh: Mesh,
    *,
    second_order: bool = True,
    clip_thresh: float | None = None,
    remat: bool = True,
):
    """Build the 2-D sharded ``maml_step(train_state, support, query,
    rng)``.

    Same contract and math as ``meta.maml.make_maml_step`` (bit-equal up
    to float reduction order): ``support``/``query`` are task-stacked
    dicts with leading axes ``(K, S)``, placed with
    ``shard_task_batch_2d``; the train state is replicated.  ``K`` must
    be divisible by the mesh ``task`` extent and ``S`` by ``dp``.
    """
    adapt = make_adapt_fn(
        loss_fn, inner_tx, n_inner, remat=remat, grad_pmean_axis="dp"
    )

    def task_query_loss(params, model_state, support_i, query_i, rng_i):
        k_adapt, k_query = jax.random.split(rng_i)
        adapted, ms, inner_losses = adapt(
            params, model_state, support_i, k_adapt
        )
        qloss, ms_q = loss_fn(adapted, ms, query_i, k_query)
        # local qloss is the mean over this device's shot shard; pmean
        # over dp completes the per-task mean.  The post-query model
        # state rides along (stop-gradient) so the outer step carries BN
        # running stats exactly like the unsharded step (which merges
        # ms_q, the state after the query forward — meta/maml.py).
        return jax.lax.pmean(qloss, "dp"), (
            inner_losses, jax.lax.stop_gradient(ms_q)
        )

    def task_grad_fo(params, model_state, support_i, query_i, rng_i):
        k_adapt, k_query = jax.random.split(rng_i)
        adapted, ms, inner_losses = adapt(
            params, model_state, support_i, k_adapt
        )
        adapted = jax.lax.stop_gradient(adapted)

        def q(p):
            return loss_fn(p, ms, query_i, k_query)

        (qloss, ms_q), g = jax.value_and_grad(q, has_aux=True)(adapted)
        g = jax.lax.pmean(g, "dp")
        qloss = jax.lax.pmean(qloss, "dp")
        return g, qloss, inner_losses, ms_q

    def local_step(state: TrainState, support: dict, query: dict, rng):
        # Local block: (K_loc, S_loc, ...).  Same per-task rng derivation
        # as the unsharded step, indexed by *global* task id so numerics
        # match the single-device program.
        K_loc = jax.tree_util.tree_leaves(support)[0].shape[0]
        t_idx = jax.lax.axis_index("task")
        keys_all = jax.random.split(rng, K_loc * mesh.shape["task"])
        keys = jax.lax.dynamic_slice_in_dim(
            keys_all, t_idx * K_loc, K_loc
        )

        if second_order:

            def outer_loss(p):
                qlosses, (inner, ms_stack) = jax.vmap(
                    task_query_loss, in_axes=(None, None, 0, 0, 0)
                )(p, state.model_state, support, query, keys)
                # mean over local tasks then over the task axis; the dp
                # axis already pmean'ed inside task_query_loss, but its
                # *gradient* contributions are per-shot shards, so the
                # outer pmean must span both axes.
                return jax.lax.pmean(jnp.mean(qlosses), ("task", "dp")), (
                    qlosses, inner, ms_stack
                )

            (loss, (qlosses, inner, ms_stack)), grads = jax.value_and_grad(
                outer_loss, has_aux=True
            )(state.params)
            # value_and_grad under shard_map yields each device's LOCAL
            # contribution, unscaled: the transpose of lax.pmean is a
            # pmean of the cotangent, so the 1/(task·dp) weighting of the
            # outer mean is NOT applied per-device (verified empirically:
            # psum here is exactly n_devices × the single-device grad at
            # every mesh shape).  pmean over both axes restores the true
            # gradient of the global mean query loss.
            grads = jax.lax.pmean(grads, ("task", "dp"))
        else:
            task_grads, qlosses, inner, ms_stack = jax.vmap(
                task_grad_fo, in_axes=(None, None, 0, 0, 0)
            )(state.params, state.model_state, support, query, keys)
            grads = jax.tree_util.tree_map(
                lambda g: jax.lax.pmean(jnp.mean(g, axis=0), "task"),
                task_grads,
            )
            loss = jax.lax.pmean(jnp.mean(qlosses), "task")

        if clip_thresh is not None:
            grads, grad_norm = clip_by_global_norm(grads, clip_thresh)
        else:
            from ..meta.grad_utils import global_norm

            grad_norm = global_norm(grads)

        updates, new_opt_state = outer_tx.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params,
            model_state=_merge_task_states_sharded(
                ms_stack, state.model_state
            ),
            opt_state=new_opt_state,
            step=state.step + 1,
        )
        return new_state, MetaMetrics(loss, qlosses, inner, grad_norm)

    ep = P("task", "dp")
    mapped = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), ep, ep, P()),
        # qlosses/inner vary along task only (dp shards are identical
        # after the pmeans); state/loss/grad_norm are fully replicated.
        out_specs=(P(), MetaMetrics(P(), P("task"), P("task"), P())),
        check_vma=False,
    )

    def maml_step(state, support, query, rng):
        return mapped(state, support, query, rng)

    return maml_step


def make_sharded_reptile_step(
    loss_fn: Callable,
    inner_tx: optax.GradientTransformation,
    outer_tx: optax.GradientTransformation,
    n_inner: int,
    mesh: Mesh,
    *,
    clip_thresh: float | None = None,
    remat: bool = False,
):
    """2-D (task × dp) sharded *batched-mode* Reptile step via shard_map
    — same contract as ``meta.reptile.make_reptile_step(mode="batched")``
    with episodes placed by ``shard_task_batch_2d``.

    Sequential-mode Reptile (the reference-order variant,
    msa_tts/reptile.py:73-77) applies the outer update between tasks and
    is inherently serial in the task axis; only its shot axis can shard.
    The batched variant is the one that scales across the mesh.

    All-first-order math: inner grads pmean over ``dp`` (identical
    adapted params on every dp shard), per-task query loss pmean over
    ``dp``, directions mean over local tasks then pmean over ``task``.
    """
    from ..meta.reptile import ReptileMetrics

    adapt = make_adapt_fn(
        loss_fn, inner_tx, n_inner, remat=remat, grad_pmean_axis="dp"
    )

    def task_direction(params, model_state, support_i, query_i, rng_i):
        k_adapt, k_query = jax.random.split(rng_i)
        adapted, ms, inner_losses = adapt(
            params, model_state, support_i, k_adapt
        )
        adapted = jax.lax.stop_gradient(adapted)
        qloss, ms_q = loss_fn(adapted, ms, query_i, k_query)
        direction = jax.tree_util.tree_map(
            lambda p0, pT: p0 - pT, params, adapted
        )
        return direction, jax.lax.pmean(qloss, "dp"), inner_losses, ms_q

    def local_step(state: TrainState, support, query, rng):
        K_loc = jax.tree_util.tree_leaves(support)[0].shape[0]
        t_idx = jax.lax.axis_index("task")
        keys_all = jax.random.split(rng, K_loc * mesh.shape["task"])
        keys = jax.lax.dynamic_slice_in_dim(
            keys_all, t_idx * K_loc, K_loc
        )

        directions, qlosses, inner, ms_stack = jax.vmap(
            task_direction, in_axes=(None, None, 0, 0, 0)
        )(state.params, state.model_state, support, query, keys)
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.pmean(jnp.mean(g, axis=0), "task"),
            directions,
        )
        loss = jax.lax.pmean(jnp.mean(qlosses), "task")

        if clip_thresh is not None:
            grads, grad_norm = clip_by_global_norm(grads, clip_thresh)
        else:
            from ..meta.grad_utils import global_norm

            grad_norm = global_norm(grads)
        updates, new_opt_state = outer_tx.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        new_state = state._replace(
            params=new_params,
            model_state=_merge_task_states_sharded(
                ms_stack, state.model_state
            ),
            opt_state=new_opt_state,
            step=state.step + 1,
        )
        return new_state, ReptileMetrics(loss, qlosses, inner, grad_norm)

    ep = P("task", "dp")
    mapped = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), ep, ep, P()),
        out_specs=(P(), ReptileMetrics(P(), P("task"), P("task"), P())),
        check_vma=False,
    )

    def reptile_step(state, support, query, rng):
        return mapped(state, support, query, rng)

    return reptile_step
