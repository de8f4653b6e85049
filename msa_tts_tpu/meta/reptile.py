"""Reptile first-order meta-learning.

Reference semantics (msa_tts/reptile.py:33-101): per speaker, k inner
steps from a snapshot θ₀, outer "gradient" = −(θ_T − θ₀), applied by the
outer optimizer *per speaker* (sequentially within the meta-batch) —
not per meta-batch.

Two compiled modes:
  * ``sequential`` (default, reference-exact): one ``lax.scan`` over the
    task axis; each task adapts from the *current* params and the outer
    update lands before the next task — identical update order to the
    reference, but as a single XLA program.
  * ``batched`` (Reptile-paper batched variant): all tasks adapt from
    the same θ₀ under ``vmap`` (parallel across chips when the task axis
    is sharded), directions averaged, one outer step.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..optim import TrainState, clip_by_global_norm
from .inner_loop import make_adapt_fn
from .maml import merge_task_states


class ReptileMetrics(NamedTuple):
    loss: jax.Array          # mean query loss
    task_losses: jax.Array   # (K,)
    inner_losses: jax.Array  # (K, n_inner)
    grad_norm: jax.Array     # mean outer-step grad norm over the batch


def make_reptile_step(
    loss_fn: Callable,
    inner_tx: optax.GradientTransformation,
    outer_tx: optax.GradientTransformation,
    n_inner: int,
    *,
    mode: str = "sequential",
    clip_thresh: float | None = None,
    remat: bool = False,
):
    adapt = make_adapt_fn(loss_fn, inner_tx, n_inner, remat=remat)

    def task_direction(params, model_state, support_i, query_i, rng_i):
        k_adapt, k_query = jax.random.split(rng_i)
        adapted, ms, inner_losses = adapt(
            params, model_state, support_i, k_adapt
        )
        adapted = jax.lax.stop_gradient(adapted)
        qloss, ms_q = loss_fn(adapted, ms, query_i, k_query)
        # outer grad = −(θ_T − θ₀) = θ₀ − θ_T  (reptile.py:73-77)
        direction = jax.tree_util.tree_map(
            lambda p0, pT: p0 - pT, params, adapted
        )
        return direction, qloss, inner_losses, ms_q

    def _apply(grads, state: TrainState):
        if clip_thresh is not None:
            grads, grad_norm = clip_by_global_norm(grads, clip_thresh)
        else:
            from .grad_utils import global_norm

            grad_norm = global_norm(grads)
        updates, new_opt_state = outer_tx.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        return (
            state._replace(
                params=new_params,
                opt_state=new_opt_state,
                step=state.step + 1,
            ),
            grad_norm,
        )

    def reptile_step_sequential(state: TrainState, support, query, rng):
        K = jax.tree_util.tree_leaves(support)[0].shape[0]
        keys = jax.random.split(rng, K)

        def per_task(carry, task):
            st = carry
            sup, qry, key = task
            direction, qloss, inner, ms_q = task_direction(
                st.params, st.model_state, sup, qry, key
            )
            st, grad_norm = _apply(direction, st)
            # carry the post-task model state (BN running stats) into
            # the next task, as a stateful sequential run would
            st = st._replace(model_state=ms_q)
            return st, (qloss, inner, grad_norm)

        state, (qlosses, inner, grad_norms) = jax.lax.scan(
            per_task, state, (support, query, keys)
        )
        return state, ReptileMetrics(
            jnp.mean(qlosses), qlosses, inner, jnp.mean(grad_norms)
        )

    def reptile_step_batched(state: TrainState, support, query, rng):
        K = jax.tree_util.tree_leaves(support)[0].shape[0]
        keys = jax.random.split(rng, K)
        directions, qlosses, inner, ms_stack = jax.vmap(
            task_direction, in_axes=(None, None, 0, 0, 0)
        )(state.params, state.model_state, support, query, keys)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.mean(g, axis=0), directions
        )
        new_model_state = merge_task_states(ms_stack, state.model_state)
        state, grad_norm = _apply(grads, state)
        state = state._replace(model_state=new_model_state)
        return state, ReptileMetrics(
            jnp.mean(qlosses), qlosses, inner, grad_norm
        )

    if mode == "sequential":
        return reptile_step_sequential
    if mode == "batched":
        return reptile_step_batched
    raise ValueError(f"unknown reptile mode: {mode}")
