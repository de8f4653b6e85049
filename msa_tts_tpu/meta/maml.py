"""MAML / FOMAML outer step, vmapped over the task (speaker) axis.

Reference semantics (msa_tts/maml.py:33-105): per speaker, k inner steps
on the support set, query-set loss, task gradients w.r.t. the initial
(2nd-order, ``track_higher_grads=True``) or final (FOMAML) inner params,
uniform-weight gradient mixing, one outer optimizer step per meta-batch.

TPU redesign: the reference loops speakers sequentially on one device;
here every task's inner loop runs under ``jax.vmap`` in a single XLA
program (and the task axis shards across the ICI mesh — see
parallel/).  Uniform mixing is expressed as the gradient of the mean
query loss, which is identical math with one backward pass.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..optim import TrainState, clip_by_global_norm
from .inner_loop import make_adapt_fn


class MetaMetrics(NamedTuple):
    loss: jax.Array          # mean query loss
    task_losses: jax.Array   # (K,) per-task query losses
    inner_losses: jax.Array  # (K, n_inner) inner-loop losses
    grad_norm: jax.Array


def merge_task_states(stacked, like):
    """Per-task post-step model states (leading K axis) → one carried
    state: float leaves (batch-norm running statistics) average across
    tasks, everything else takes task 0.  Without this the outer loop
    would discard every task's state and BN running stats would stay
    frozen at init for the whole meta-training run — train-mode math is
    unaffected (batch statistics), but any ``train=False`` consumer of
    the checkpoint (serving) would normalize with init stats."""
    return jax.tree_util.tree_map(
        lambda s, r: jnp.mean(s, axis=0).astype(r.dtype)
        if jnp.issubdtype(s.dtype, jnp.floating) else s[0],
        stacked, like,
    )


def make_maml_step(
    loss_fn: Callable,
    inner_tx: optax.GradientTransformation,
    outer_tx: optax.GradientTransformation,
    n_inner: int,
    *,
    second_order: bool = True,
    clip_thresh: float | None = None,
    remat: bool = True,
):
    """Build the jittable ``maml_step(train_state, support, query, rng)``.

    ``support``/``query`` are task-stacked batch dicts (leading axis K).
    ``loss_fn(params, model_state, batch, rng) -> (loss, new_model_state)``.
    """
    adapt = make_adapt_fn(loss_fn, inner_tx, n_inner, remat=remat)

    def task_query_loss(params, model_state, support_i, query_i, rng_i):
        k_adapt, k_query = jax.random.split(rng_i)
        adapted, ms, inner_losses = adapt(
            params, model_state, support_i, k_adapt
        )
        qloss, ms_q = loss_fn(adapted, ms, query_i, k_query)
        return qloss, (inner_losses, ms_q)

    def task_grad_fo(params, model_state, support_i, query_i, rng_i):
        """First-order task gradient: w.r.t. the *adapted* params
        (reference's ``fmodel.parameters(time=-1)``), applied at θ₀."""
        k_adapt, k_query = jax.random.split(rng_i)
        adapted, ms, inner_losses = adapt(
            params, model_state, support_i, k_adapt
        )
        adapted = jax.lax.stop_gradient(adapted)

        def q(p):
            return loss_fn(p, ms, query_i, k_query)

        (qloss, ms_q), g = jax.value_and_grad(q, has_aux=True)(adapted)
        return g, qloss, inner_losses, ms_q

    def maml_step(state: TrainState, support: dict, query: dict, rng):
        K = jax.tree_util.tree_leaves(support)[0].shape[0]
        keys = jax.random.split(rng, K)

        if second_order:

            def outer_loss(p):
                qlosses, (inner, ms_stack) = jax.vmap(
                    task_query_loss, in_axes=(None, None, 0, 0, 0)
                )(p, state.model_state, support, query, keys)
                return jnp.mean(qlosses), (qlosses, inner, ms_stack)

            (loss, (qlosses, inner, ms_stack)), grads = jax.value_and_grad(
                outer_loss, has_aux=True
            )(state.params)
        else:
            task_grads, qlosses, inner, ms_stack = jax.vmap(
                task_grad_fo, in_axes=(None, None, 0, 0, 0)
            )(state.params, state.model_state, support, query, keys)
            grads = jax.tree_util.tree_map(
                lambda g: jnp.mean(g, axis=0), task_grads
            )
            loss = jnp.mean(qlosses)
        new_model_state = merge_task_states(
            jax.lax.stop_gradient(ms_stack), state.model_state
        )

        if clip_thresh is not None:
            grads, grad_norm = clip_by_global_norm(grads, clip_thresh)
        else:
            from .grad_utils import global_norm

            grad_norm = global_norm(grads)

        updates, new_opt_state = outer_tx.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params,
            model_state=new_model_state,
            opt_state=new_opt_state,
            step=state.step + 1,
        )
        return new_state, MetaMetrics(loss, qlosses, inner, grad_norm)

    return maml_step


def make_metatest_fn(
    loss_fn: Callable,
    inner_tx: optax.GradientTransformation,
    n_inner: int,
    *,
    remat: bool = True,
):
    """Build ``metatest(params, model_state, support, query, rng)``:
    k-step adaptation then query-loss evaluation (no outer update) —
    the reference's meta-test protocol (msa_tts/baseline.py:299-335,
    maml.py:115-152).  Returns ``(query_loss, adapted_params,
    adapted_model_state, inner_losses)`` for a single task; vmap it for
    task batches."""
    adapt = make_adapt_fn(loss_fn, inner_tx, n_inner, remat=remat)

    def metatest(params, model_state, support_i, query_i, rng_i):
        k_adapt, k_query = jax.random.split(rng_i)
        adapted, ms, inner_losses = adapt(
            params, model_state, support_i, k_adapt
        )
        qloss, _ = loss_fn(adapted, ms, query_i, k_query)
        return qloss, adapted, ms, inner_losses

    return metatest
